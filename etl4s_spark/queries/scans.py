"""Scan queries (SURVEY.md §2.B Scans / sources / sinks).

The point at 100 TB: a parquet scan must read ONLY the columns and row
groups the query needs. Both queries here are verified in tests via
``explain`` to show ``ReadSchema`` pruned to the projection and
``PushedFilters`` containing the predicate (tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl4s_spark.queries import query
from etl4s_spark.sources.tables import load_table


@query(
    "q_scan_parquet",
    oracle="SELECT count(*) AS n_rows FROM lineitem",
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table row count — parquet metadata-only at best (Spark counts
    via scan with no columns: ReadSchema struct<>)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(F.count(F.lit(1)).alias("n_rows"))


@query(
    "q_scan_projection_pushdown",
    oracle="""
    SELECT l_orderkey, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
    ORDER BY l_orderkey, l_extendedprice
    """,
)
def q_scan_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-column projection + pushed predicate: ReadSchema must be exactly
    (l_orderkey, l_extendedprice, l_shipdate) and the shipdate filter must
    appear in PushedFilters — row-group statistics skip non-matching
    groups, which at 100 TB is the difference between scanning 100 TB and
    scanning the ~20% tail."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice")
        .orderBy("l_orderkey", "l_extendedprice")
    )
