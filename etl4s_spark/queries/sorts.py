"""Sort / limit queries (SURVEY.md §2.B Sorts / limits / top-k).

orderBy = range-partitioned exchange (sampled bounds) + per-partition
sort. orderBy+limit compiles to TakeOrderedAndProject: per-partition
top-N then a driver-side merge of N×partitions rows — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl4s_spark.queries import query
from etl4s_spark.sources.tables import load_table


@query(
    "q_sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice,
           nullif(o_orderpriority, '4-NOT SPECIFIED') AS priority_or_null
    FROM orders
    WHERE o_orderkey <= 3000
    ORDER BY o_orderstatus ASC,
             priority_or_null DESC NULLS LAST,
             o_totalprice DESC,
             o_orderkey ASC
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null ordering (desc_nulls_last)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        "o_totalprice",
        F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")).alias("priority_or_null"),
    ).orderBy(
        F.col("o_orderstatus").asc(),
        F.col("priority_or_null").desc_nulls_last(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    )


@query(
    "q_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy+limit → TakeOrderedAndProject (verified in test_plans):
    the 100 TB-safe top-N."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )
