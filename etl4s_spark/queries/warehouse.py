"""Warehouse-maintenance queries: batch upsert/MERGE, SCD2 dimension
build, and an ORACLE-GATED grouped-map pandas UDF (upgrading the UDF
surface from rows-only to hash-proven — the z-score math is mirrored
exactly in window SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl4s_spark.queries import query
from etl4s_spark.sources.tables import load_table


@query(
    "q_upsert_merge",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 3 <> 0
    ), upd AS (
      SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 1.1 AS o_totalprice
      FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT coalesce(u.o_orderkey, b.o_orderkey)         AS o_orderkey,
           coalesce(u.o_orderstatus, b.o_orderstatus)   AS o_orderstatus,
           round(coalesce(u.o_totalprice, b.o_totalprice), 4) AS o_totalprice
    FROM base b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
    ORDER BY o_orderkey
    """,
)
def q_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE/upsert (operators/warehouse.py upsert): an update set
    (repriced even orderkeys) reconciled into a base table (orderkeys
    not divisible by 3) — updates replace, new keys insert, the rest
    pass through, each output row from exactly ONE side (struct
    coalesce). The oracle is the textbook full-outer formulation."""
    from etl4s_spark.operators.warehouse import upsert

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = o.filter(F.col("o_orderkey") % 3 != 0)
    updates = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
    )
    return (
        upsert(base, updates, keys=["o_orderkey"])
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 4).alias("o_totalprice"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q_scd2_build",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS valid_from,
           coalesce(CAST(lead(o_orderdate) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS DATE),
                    DATE '9999-12-31') AS valid_to,
           (lead(o_orderdate) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) IS NULL) AS is_current
    FROM orders
    WHERE o_custkey < 300
    ORDER BY o_custkey, valid_from, o_orderkey
    """,
)
def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build (operators/warehouse.py
    scd2_intervals): each customer's order stream becomes versioned
    rows with [valid_from, valid_to) intervals and an is_current flag —
    the standard dimension-table maintenance pattern, one window
    shuffle."""
    from etl4s_spark.operators.warehouse import scd2_intervals

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    return (
        scd2_intervals(o, key="o_custkey", change_ts="o_orderdate", order_tiebreak="o_orderkey")
        .select(
            "o_custkey",
            "o_orderkey",
            F.to_date("valid_from").alias("valid_from"),
            # the open-ended current version carries the standard SCD2
            # sentinel end date (also dodges engine-specific null-date
            # rendering in the driver compare)
            F.coalesce(F.to_date("valid_to"), F.lit("9999-12-31").cast("date")).alias(
                "valid_to"
            ),
            "is_current",
        )
        .orderBy("o_custkey", "valid_from", "o_orderkey")
    )


@query(
    "q_udf_grouped_zscore",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           round((o_totalprice - avg(o_totalprice) OVER w)
                 / stddev_samp(o_totalprice) OVER w, 4) AS z
    FROM orders
    WHERE o_custkey < 2000
    WINDOW w AS (PARTITION BY o_orderpriority)
    ORDER BY o_orderkey
    """,
)
def q_udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-GATED grouped-map pandas UDF: applyInPandas z-scores
    o_totalprice within each order priority (functions/udfs.py
    normalize_group_pandas — pandas mean/std(ddof=1) per group) and the
    driver proves it hash-equal to the window-SQL z-score. This upgrades
    the UDF surface from rows-only to the same gate as built-ins — the
    Arrow batch path, group iteration, and pandas arithmetic all sit on
    the proven path. Python sees each group once; the shuffle is the
    same single hash partition a groupBy would pay."""
    from etl4s_spark.functions.udfs import normalize_group_pandas

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 2000).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return (
        normalize_group_pandas(o, "o_orderpriority", "o_totalprice")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice_z", 4).alias("z"),
        )
        .orderBy("o_orderkey")
    )
