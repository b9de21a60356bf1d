"""Schema-drift smoke: every table must load and expose the expected dtypes.

The driver regenerates /root/testdata between rounds and has changed the
physical encoding of columns before (events.ts went TIMESTAMP(NANOS) →
TIMESTAMP(MICROS) in round 4, silently breaking 18 queries). This test
pins the LOGICAL schema each query relies on, so a drift in the generated
data fails the first pytest run instead of the driver's correctness gate.
"""

from __future__ import annotations

import pytest

from etl4s_spark.sources.tables import TABLES, load_table

# Logical dtype contract per table: what the query layer may assume after
# load_table(), independent of the parquet physical encoding.
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    # ts MUST come out as session-local TIMESTAMP (not NTZ, not bigint):
    # windows/as-of joins/streaming replays all build on it.
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
}


@pytest.mark.parametrize("name", TABLES)
def test_table_loads_with_expected_dtypes(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    dtypes = dict(df.dtypes)
    expected = EXPECTED[name]
    missing = [c for c in expected if c not in dtypes]
    assert not missing, f"{name}: missing columns {missing}; have {sorted(dtypes)}"
    wrong = {
        c: (dtypes[c], want) for c, want in expected.items() if dtypes[c] != want
    }
    assert not wrong, f"{name}: dtype drift (actual, expected): {wrong}"
    # the load plan must actually run — a lazy schema check alone would not
    # catch value-level read errors (e.g. rejected physical types)
    assert df.limit(1).count() >= 0
