"""Set-operation queries (SURVEY.md §2.B Set operations).

UNION ALL is plan concatenation (zero shuffle). UNION/INTERSECT/EXCEPT
distinct variants shuffle on the full row; *All variants preserve
multiplicity (Spark intersectAll/exceptAll ↔ SQL INTERSECT ALL /
EXCEPT ALL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl4s_spark.queries import query
from etl4s_spark.sources.tables import load_table


def _hi(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 350000)
        .select("o_custkey")
    )


def _recent(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )


_HI_SQL = "SELECT o_custkey FROM orders WHERE o_totalprice > 350000"
_RECENT_SQL = "SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'"


@query(
    "q_set_union",
    oracle=f"""
    SELECT o_custkey, count(*) AS n_all FROM (
      ({_HI_SQL}) UNION ALL ({_RECENT_SQL})
    ) GROUP BY o_custkey
    ORDER BY o_custkey
    """,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (multiplicity-preserving) + agg to make the duplicate
    counts observable; unionByName is position-independent."""
    u = _hi(spark, sf_dir).unionByName(_recent(spark, sf_dir))
    return u.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_all")).orderBy("o_custkey")


@query(
    "q_set_union_distinct",
    oracle=f"""
    SELECT o_custkey FROM (
      ({_HI_SQL}) UNION ({_RECENT_SQL})
    )
    ORDER BY o_custkey
    """,
)
def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _hi(spark, sf_dir).unionByName(_recent(spark, sf_dir)).distinct()
    return u.orderBy("o_custkey")


@query(
    "q_set_intersect",
    oracle=f"""
    SELECT o_custkey FROM (
      ({_HI_SQL}) INTERSECT ({_RECENT_SQL})
    )
    ORDER BY o_custkey
    """,
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hi(spark, sf_dir).intersect(_recent(spark, sf_dir)).orderBy("o_custkey")


@query(
    "q_set_intersect_all",
    oracle=f"""
    SELECT o_custkey FROM (
      ({_HI_SQL}) INTERSECT ALL ({_RECENT_SQL})
    )
    ORDER BY o_custkey
    """,
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: min-multiplicity semantics."""
    return _hi(spark, sf_dir).intersectAll(_recent(spark, sf_dir)).orderBy("o_custkey")


@query(
    "q_set_except",
    oracle=f"""
    SELECT o_custkey FROM (
      ({_HI_SQL}) EXCEPT ({_RECENT_SQL})
    )
    ORDER BY o_custkey
    """,
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hi(spark, sf_dir).subtract(_recent(spark, sf_dir)).orderBy("o_custkey")


@query(
    "q_set_except_all",
    oracle=f"""
    SELECT o_custkey FROM (
      ({_HI_SQL}) EXCEPT ALL ({_RECENT_SQL})
    )
    ORDER BY o_custkey
    """,
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: multiplicity-subtracting."""
    return _hi(spark, sf_dir).exceptAll(_recent(spark, sf_dir)).orderBy("o_custkey")
