"""Filter / projection / predicate queries (SURVEY.md §2.B).

All predicates here are Catalyst expressions (JVM-side, codegen'd, and —
for deterministic ones — pushed into the parquet scan). Row-level
conditional routing uses ``F.when`` — the DataFrame analogue of the
reference's value-level ``.If/.ElseIf/.Else`` (SURVEY.md §2.A19).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl4s_spark.queries import query
from etl4s_spark.sources.tables import load_table


@query(
    "q_filter_simple",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity > 30
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q_filter_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") > 30)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q_filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus IN ('O', 'F'))
      AND (o_totalprice BETWEEN 50000 AND 150000)
      AND NOT (o_orderpriority = '5-LOW')
       OR (o_totalprice > 450000 AND o_orderstatus = 'P')
    ORDER BY o_orderkey
    """,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT, IN, BETWEEN — mirrors SQL precedence exactly
    (AND binds tighter than OR on both engines)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            (
                F.col("o_orderstatus").isin("O", "F")
                & F.col("o_totalprice").between(50000, 150000)
                & ~(F.col("o_orderpriority") == "5-LOW")
            )
            | ((F.col("o_totalprice") > 450000) & (F.col("o_orderstatus") == "P"))
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


@query(
    "q_filter_null",
    oracle="""
    WITH t AS (
      SELECT l_orderkey, l_linenumber,
             nullif(l_discount, 0.0) AS disc_or_null,
             nullif(l_returnflag, 'N') AS flag_or_null
      FROM lineitem
    )
    SELECT
      count(*)                                                    AS n_rows,
      count(disc_or_null)                                         AS n_disc_not_null,
      CAST(sum(CASE WHEN disc_or_null IS NULL THEN 1 ELSE 0 END)
           AS BIGINT)                                             AS n_disc_null,
      CAST(sum(CASE WHEN disc_or_null IS NOT DISTINCT FROM NULL
               THEN 1 ELSE 0 END) AS BIGINT)                      AS n_null_safe_eq_null,
      CAST(sum(CASE WHEN flag_or_null IS DISTINCT FROM 'A'
               THEN 1 ELSE 0 END) AS BIGINT)                      AS n_distinct_from_a
    FROM t
    """,
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null semantics: IS NULL / IS NOT NULL / null-safe equality (<=>,
    SQL IS [NOT] DISTINCT FROM). Nulls are synthesized with nullif since
    the source tables are complete."""
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc_or_null"),
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("flag_or_null"),
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("disc_or_null").alias("n_disc_not_null"),
        F.sum(F.when(F.col("disc_or_null").isNull(), 1).otherwise(0)).alias("n_disc_null"),
        F.sum(F.when(F.col("disc_or_null").eqNullSafe(F.lit(None).cast("double")), 1).otherwise(0)).alias(
            "n_null_safe_eq_null"
        ),
        F.sum(F.when(~F.col("flag_or_null").eqNullSafe(F.lit("A")), 1).otherwise(0)).alias(
            "n_distinct_from_a"
        ),
    )


@query(
    "q_project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 6)           AS net_price,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS gross_price,
           round(l_quantity * 2.5 + 1, 6)                         AS scaled_qty,
           CAST(l_quantity AS BIGINT) % 7                         AS qty_mod
    FROM lineitem
    WHERE l_orderkey <= 500
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns: arithmetic, mod, alias. Pure Project — no
    shuffle; whole-stage codegen fuses it with the scan.

    Rounding rule: products of 2-decimal inputs are exact at 6 decimals,
    so round at 6 — rounding at 4 lands on .00005 ties where Spark
    (HALF_UP on the decimal repr) and DuckDB (binary-value rounding)
    disagree. Aggregates stay at round(_, 4): continuous sums don't tie."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") <= 500)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("net_price"),
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 6
            ).alias("gross_price"),
            F.round(F.col("l_quantity") * 2.5 + 1, 6).alias("scaled_qty"),
            (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q_project_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000  THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                WHEN o_totalprice < 400000 THEN 'large'
                ELSE 'jumbo' END AS size_band,
           CASE o_orderstatus WHEN 'O' THEN 'open'
                              WHEN 'F' THEN 'filled'
                              ELSE 'other' END AS status_name
    FROM orders
    ORDER BY o_orderkey
    """,
)
def q_project_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level first-match branching — the DataFrame analogue of the
    reference's .If/.ElseIf/.Else (SURVEY.md §2.A19): F.when chains
    short-circuit top-to-bottom exactly like CASE WHEN."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .when(F.col("o_totalprice") < 400000, "large")
        .otherwise("jumbo")
        .alias("size_band"),
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "filled")
        .otherwise("other")
        .alias("status_name"),
    ).orderBy("o_orderkey")
