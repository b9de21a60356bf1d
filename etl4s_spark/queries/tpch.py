"""TPC-H-shaped macro queries (Q3 / Q5 / Q10 over the driver-generated
tables) — multi-join + aggregate + top-k compositions that exercise join
ordering, broadcast selection, partial aggregation and
TakeOrderedAndProject in ONE plan each, the way real reporting workloads
do. q_join_salted additionally proves the skew-salting operator
bit-equal to the plain join it replaces.

These are deliberately written as the reference's users would write them
(declarative joins, no manual ordering): Catalyst reorders the joins,
AQE picks broadcast sides at runtime. Plan assertions live in
tests/test_plans.py.

Revenue sums are carried as DECIMAL(18,6) on both engines so
accumulation order (partial aggs, micro-batches, DuckDB's parallel agg)
cannot move the rounded result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl4s_spark.queries import query
from etl4s_spark.sources.tables import load_table

_REV = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"


def _revenue() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )


@query(
    "q_tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           round(CAST(sum({_REV}) AS DOUBLE), 4) AS revenue,
           CAST(o_orderdate AS DATE)             AS o_orderdate,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1997-06-30'
      AND l_shipdate  > TIMESTAMP '1997-06-30'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): 3-way join, filtered on both fact
    sides, grouped per order, top-10 by revenue. The plan to want at
    100 TB: both date filters pushed to the parquet scans, customer
    (segment-filtered) broadcast or shuffled by AQE's runtime sizes, ONE
    shuffle per remaining join key, and the top-10 as
    TakeOrderedAndProject (no global sort materialization)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-30").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-30").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_revenue()).cast("double"), 4).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q_tpch_q5",
    oracle=f"""
    SELECT n_name,
           round(CAST(sum({_REV}) AS DOUBLE), 4) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): 6-way star join with the
    customer-nation = supplier-nation co-membership constraint. region
    and nation are bounded dims (5/25 rows at EVERY scale factor) —
    broadcast them explicitly; the big-side joins shuffle on their keys
    and AQE handles the rest."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, (orders.o_custkey == cust.c_custkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_revenue()).cast("double"), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name,
           round(CAST(sum({_REV}) AS DOUBLE), 4) AS revenue,
           round(c_acctbal, 4)                   AS c_acctbal,
           n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): quarter of orders ⋈ returned
    lineitems ⋈ customer ⋈ nation, top-20 customers by lost revenue.
    Both selective filters sit on the fact scans; nation broadcasts."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_revenue()).cast("double"), 4).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 4).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q_tpch_q6",
    oracle="""
    SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
                 AS DOUBLE), 4) AS revenue,
           count(*)             AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): the canonical
    pushdown-or-die query — four conjunctive predicates and a single
    ungrouped sum. The right plan is scan→filter→partial-agg→one
    exchange of ONE row; every predicate reaches PushedFilters, no
    other shuffle exists. At 100 TB this query is pure scan bandwidth."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)"))
            .cast("double"),
            4,
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q_tpch_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    SELECT c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE)  AS o_orderdate,
           round(o.o_totalprice, 4)     AS o_totalprice,
           round(sum(l.l_quantity), 4)  AS sum_qty
    FROM customer c, orders o, lineitem l
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
      AND c.c_custkey = o.o_custkey
      AND o.o_orderkey = l.l_orderkey
    GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): an aggregate-driven semi
    join — orders qualify through a grouped HAVING on lineitem, then
    re-join for detail. The scale shape: the qualifying-keys side is
    tiny after HAVING (AQE turns the IN-join into a broadcast at
    runtime), lineitem is scanned twice but shuffled on the same key
    both times, and the top-50 is TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__sq"))
        .filter(F.col("__sq") > 150)
        .select("l_orderkey")
    )
    bk = big.withColumnRenamed("l_orderkey", "__bk")
    return (
        li.join(bk, li.l_orderkey == bk["__bk"], "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            F.round("o_totalprice", 4).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(50)
    )


@query(
    "q_join_salted",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           round(l.l_extendedprice, 4) AS l_extendedprice,
           o.o_orderpriority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_quantity > 45
    ORDER BY l.l_orderkey, l.l_linenumber
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join proven BIT-EQUAL to the plain equi join it
    replaces (operators/joins.py salted_join): the left side gets a
    per-row salt, the right side is replicated salt_buckets×, and the
    join key becomes (key, salt) — a hot orderkey's rows now spread
    across salt_buckets tasks. The oracle is the unsalted SQL join, so
    the driver gate certifies the rewrite changes the DISTRIBUTION, not
    the RESULT. Use when skew lives where AQE can't see it (skew
    materializing only after upstream filters)."""
    from etl4s_spark.operators.joins import salted_join

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, orders, on=["l_orderkey"], salt_buckets=8)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 4).alias("l_extendedprice"),
            "o_orderpriority",
        )
        .orderBy("l_orderkey", "l_linenumber")
    )
