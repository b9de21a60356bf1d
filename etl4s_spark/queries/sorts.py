"""Sort / limit queries (SURVEY.md §2.B Sorts / limits / top-k).

orderBy = range-partitioned exchange (sampled bounds) + per-partition
sort. orderBy+limit compiles to TakeOrderedAndProject: per-partition
top-N then a driver-side merge of N×partitions rows — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl4s_spark.operators.ranking import one_part
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


@query(
    "q_skyline_pareto",
    oracle="""
    WITH pts AS (
      SELECT p_partkey,
             CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
             CAST(p_size AS BIGINT)                     AS sz
      FROM part WHERE p_type LIKE 'PROMO%'
    )
    SELECT a.p_partkey,
           round(a.price_c / 100, 2) AS price,
           a.sz                      AS p_size
    FROM pts a
    WHERE NOT EXISTS (
      SELECT 1 FROM pts b
      WHERE b.price_c <= a.price_c AND b.sz >= a.sz
        AND (b.price_c < a.price_c OR b.sz > a.sz)
    )
    ORDER BY a.price_c, a.sz, a.p_partkey
    """,
)
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D SKYLINE (Pareto frontier: no other part is both cheaper and
    larger) — the multi-criteria shortlist query (Börzsönyi et al.,
    ICDE'01). The oracle runs the O(N²) NOT-EXISTS definition; the
    engine runs the scale formulation: (1) collapse to one row per
    price-cent keeping max size — a map-side-combined groupBy bounded
    by the price DOMAIN, exactly the counts-histogram argument — then
    (2) two RANGE windows over that collapsed frame mark a point
    dominated iff a strictly-cheaper price reached ≥ its size or an
    equal-or-cheaper price exceeded it, and (3) a broadcast semi-join
    back recovers every part sitting ON the frontier (co-located ties
    included). The fact table is scanned once and never globally
    sorted; only the domain-bounded histogram is."""
    from pyspark.sql.window import Window

    part = load_table(spark, sf_dir, "part").filter(F.col("p_type").like("PROMO%"))
    pts = part.select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_c"),
        F.col("p_size").cast("long").alias("sz"),
    )
    hist = pts.groupBy("price_c").agg(F.max("sz").alias("max_sz"))
    wlt = (
        Window.partitionBy(one_part("price_c"))
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    wle = (
        Window.partitionBy(one_part("price_c"))
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    sky = (
        hist.select(
            "price_c",
            "max_sz",
            F.max("max_sz").over(wlt).alias("m_lt"),
            F.max("max_sz").over(wle).alias("m_le"),
        )
        .filter(
            (F.col("m_lt").isNull() | (F.col("m_lt") < F.col("max_sz")))
            & (F.col("m_le") <= F.col("max_sz"))
        )
        .select("price_c", F.col("max_sz").alias("sz"))
    )
    return (
        pts.join(F.broadcast(sky), ["price_c", "sz"])
        .select(
            "p_partkey",
            F.round(F.col("price_c") / 100, 2).alias("price"),
            F.col("sz").alias("p_size"),
        )
        .orderBy("price_c", "sz", "p_partkey")
    )
