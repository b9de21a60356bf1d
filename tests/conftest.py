from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from etl4s_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def compare_to_oracle(sdf, con, sql: str) -> None:
    """Assert Spark result == DuckDB result under the driver's comparison
    rules (columns sorted by name, order-insensitive rows)."""
    from tools.verify_local import normalize

    scols = sorted(sdf.columns)
    srows = [tuple(r[c] for c in scols) for r in sdf.collect()]
    rel = con.execute(sql)
    dcols_raw = [d[0] for d in rel.description]
    order = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
    dcols = [dcols_raw[i] for i in order]
    drows = [tuple(r[i] for i in order) for r in rel.fetchall()]
    assert scols == dcols, f"columns: spark={scols} duck={dcols}"
    assert len(srows) == len(drows), f"rowcount: spark={len(srows)} duck={len(drows)}"
    ns, nd = normalize(srows), normalize(drows)
    assert ns == nd, f"values differ; first diffs: {[(a, b) for a, b in zip(ns, nd) if a != b][:3]}"
