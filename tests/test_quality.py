"""Quality-module semantics: the expectations suite must actually CATCH
planted violations (a suite that always reports zero is worthless), and
the statistical audits must hold their integer-exactness contracts."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def test_expectations_catch_planted_violations(spark, tmp_path):
    from etl4s_spark.queries import QUERIES, load_all

    load_all()
    d = str(tmp_path / "sf")
    orders = spark.createDataFrame(
        [
            # duplicate orderkey (1 extra row) + orphan custkey 99 + null
            # price + bad status 'X'
            (1, 10, "F", 100.0, datetime.datetime(2024, 1, 1), "1-URGENT"),
            (1, 10, "F", 100.0, datetime.datetime(2024, 1, 1), "1-URGENT"),
            (2, 99, "X", None, datetime.datetime(2024, 1, 2), "2-HIGH"),
            (3, 11, "O", 50.0, datetime.datetime(2024, 1, 3), "3-MEDIUM"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    customer = spark.createDataFrame(
        [(10, "a"), (11, "b")], "c_custkey long, c_name string"
    )
    # order 3 has 8 line items -> cardinality violation; qty 99 -> range
    li_rows = [(1, 1, 1, 1, 5.0), (2, 2, 2, 1, 99.0)] + [
        (3, i, i, i, 1.0) for i in range(1, 9)
    ]
    lineitem = spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long,"
        " l_quantity double",
    )
    orders.write.parquet(d + "/orders.parquet")
    customer.write.parquet(d + "/customer.parquet")
    lineitem.write.parquet(d + "/lineitem.parquet")

    out = {r.rule: r.violations for r in QUERIES["q_audit_expectations"](spark, d).collect()}
    assert out == {
        "orders_pk_unique": 1,
        "orders_custkey_refint": 1,
        "lineitem_qty_in_range": 1,
        "orders_totalprice_not_null": 1,
        "orders_status_in_set": 1,
        "lineitem_lines_per_order_1_to_7": 1,
    }


def test_benford_shares_and_expectation_are_integer_exact(spark, sf_dir):
    from etl4s_spark.queries import QUERIES, load_all

    load_all()
    rows = QUERIES["q_audit_benford"](spark, sf_dir).collect()
    digits = [r.digit for r in rows]
    assert digits == sorted(digits) and set(digits) <= set(range(1, 10))
    total = sum(r.n for r in rows)
    for r in rows:
        # share is exact integer division of exact counts
        assert r.share_e6 == (r.n * 1000000) // total
        assert r.abs_dev_e6 == abs(r.share_e6 - r.benford_e6)
    # Benford reference shares sum to ~1 (within truncation of 9 terms)
    assert abs(sum(r.benford_e6 for r in rows) - 1_000_000) < 10


def test_pagerank_mass_and_hub_ordering(spark, sf_dir):
    """Rank mass stays within the damping bounds (every rank >= 0.15 in
    micro-units) and the top-ranked node has degree >= the median top-20
    degree — hubs rise."""
    from etl4s_spark.queries import QUERIES, load_all

    load_all()
    rows = QUERIES["q_graph_pagerank"](spark, sf_dir).collect()
    assert rows, "pagerank returned nothing"
    assert all(r.rank_e6 >= 150000 for r in rows)
    assert rows == sorted(rows, key=lambda r: (-r.rank_e6, r.id))
    degs = sorted(r.degree for r in rows)
    assert rows[0].degree >= degs[len(degs) // 2]
