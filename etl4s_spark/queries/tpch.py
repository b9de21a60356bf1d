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


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): one quarter of orders,
    counted per priority, kept only if SOME lineitem qualifies — the
    canonical correlated-EXISTS-to-semi-join decorrelation. The driver
    tables carry no l_commitdate/l_receiptdate, so the qualifying
    predicate is l_shipdate > o_orderdate (same shape: a non-equi
    condition alongside the correlation key). The scale plan: both date
    filters pushed to the orders scan, lineitem joined LEFT SEMI on
    l_orderkey (stops at first match, no fan-out), one exchange per
    side, then a 5-group aggregate."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           round(CAST(sum(volume) AS DOUBLE), 4) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year, {_REV} AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): revenue flowing between two nations
    in either direction, by year. Exercises a DISJUNCTION ACROSS TWO
    JOINED DIMENSIONS (the nation-pair OR can only be evaluated after
    both nation joins) plus an expression group key (year). Scale plan:
    the two nation dims broadcast (bounded at every SF), the pair
    disjunction filters the joined stream before the aggregate, and the
    two-year shipdate window is pushed to the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("__sn_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("__cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(_revenue()).cast("double"), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q_tpch_q8",
    oracle=f"""
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_5' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year, {_REV} AS volume, n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): the share of ASIA-market
    ECONOMY-part revenue supplied from NATION_5, by order year — an
    8-table join whose aggregate is a RATIO OF CONDITIONAL SUMS
    (sum-if / sum over the same grouped stream, one pass). Scale plan:
    part is filtered BEFORE its join (selective p_type pushed to the
    scan), nation/region broadcast, and the conditional numerator
    costs nothing extra — it's a CASE inside the same partial agg.
    Ratios divide as doubles post-aggregation (decimal ÷ decimal would
    re-round per AQE partial shape)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__cn_key"), F.col("n_regionkey").alias("__cr_key")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("nation")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("__cn_key"))
        .join(F.broadcast(region), F.col("__cr_key") == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("__sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_5", _revenue()).otherwise(zero)
                ).cast("double")
                / F.sum(_revenue()).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q_tpch_q12",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping-mode priority split): lines shipped in one
    year, classified per group into high/low-priority counts via CASE
    inside the aggregate — the pivot-without-pivot pattern (two
    conditional sums in one pass, no second scan). The driver tables
    carry no l_shipmode/l_commitdate/l_receiptdate, so the group key is
    l_returnflag and the window predicate is on l_shipdate; shape
    preserved. Scale: one join shuffle on orderkey, CASE-sums ride the
    partial aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    one, zero = F.lit(1), F.lit(0)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, one).otherwise(zero)).alias("high_line_count"),
            F.sum(F.when(~high, one).otherwise(zero)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_tpch_q14",
    oracle=f"""
    SELECT round(
             100.00 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV}
                                    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(sum({_REV}) AS DOUBLE), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percentage of one month's revenue
    from PROMO parts — a broadcast dimension join feeding a global
    ratio-of-conditional-sums (single row out, no group key). Scale:
    the month filter prunes the lineitem scan, part broadcasts, the
    two sums share one partial-aggregate pass and ONE one-row
    exchange."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    zero = F.lit(0).cast("decimal(18,6)")
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(zero))
            .cast("double")
            / F.sum(_revenue()).cast("double"),
            4,
        ).alias("promo_revenue")
    )


@query(
    "q_tpch_q19",
    oracle=f"""
    SELECT round(CAST(sum({_REV}) AS DOUBLE), 4) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): an OR of three conjunctive
    brand/size/quantity bands straddling BOTH join sides — the
    disjunctive-predicate stress test. Catalyst can't split the OR
    across the join, but it CAN derive single-side implied filters:
    p_brand IN (...) AND p_size BETWEEN 1 AND 15 prunes the part scan,
    l_quantity BETWEEN 1 AND 30 prunes lineitem, and the full
    disjunction evaluates after the broadcast join. (No p_container /
    l_shipmode in the driver tables; bands adapted to existing
    columns, shape preserved.)"""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(band).agg(
        F.round(F.sum(_revenue()).cast("double"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "q_tpch_q21",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_name, count(*) AS numwait
    FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): for finished
    orders, count late lines whose supplier was the ONLY late supplier
    on a multi-supplier order — a correlated EXISTS plus a correlated
    NOT EXISTS against the same derived set, decorrelated here into a
    LEFT SEMI then a LEFT ANTI join with a non-equi (suppkey <>)
    conjunct. Lateness is l_shipdate > o_orderdate + 60 days (driver
    tables carry no l_commitdate/l_receiptdate; same late-line shape).
    Scale: 'late' is derived once and reused for both probe sides; all
    three joins shuffle on l_orderkey — one co-partitioned exchange
    chain, no fan-out before the semi/anti filters."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("__ok2"), F.col("l_suppkey").alias("__sk2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("__ok3"), F.col("l_suppkey").alias("__sk3")
    )
    return (
        late.join(
            l2,
            (late.l_orderkey == F.col("__ok2")) & (late.l_suppkey != F.col("__sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("__ok3"))
            & (F.col("l_suppkey") != F.col("__sk3")),
            "left_anti",
        )
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "q_tpch_q2",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice) AS supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eur AS (
      SELECT ps.l_partkey, ps.supplycost, s_name, s_acctbal, n_name
      FROM ps, supplier, nation, region
      WHERE ps.l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
    )
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
           p_partkey, p_type, round(supplycost, 4) AS supplycost
    FROM part, eur
    WHERE p_partkey = eur.l_partkey
      AND p_size = 15 AND p_type = 'STANDARD'
      AND supplycost = (SELECT min(supplycost) FROM eur e2
                        WHERE e2.l_partkey = eur.l_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): for each qualifying part, keep
    only the EU supplier rows whose cost equals the per-part minimum —
    the correlated-scalar-MIN pattern, decorrelated as a groupBy-min of
    the SAME derived relation joined back on (partkey, cost). The
    driver tables carry no partsupp, so the part-supplier relation is
    derived from lineitem (min extendedprice per pair = supplycost; no
    arithmetic, so the equality join on a picked-not-computed double is
    engine-exact). Scale plan: `eur` is built once (its exchange reused
    by both the min-agg and the probe side), nation/region broadcast,
    and the final top-100 is TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supplycost")
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eur = ps.join(supp, ps.l_suppkey == supp.s_suppkey).select(
        "l_partkey", "supplycost", "s_name", "s_acctbal", "n_name"
    )
    min_cost = eur.groupBy(F.col("l_partkey").alias("__mk")).agg(
        F.min("supplycost").alias("__min_cost")
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    return (
        part.join(eur, part.p_partkey == eur.l_partkey)
        .join(
            min_cost,
            (F.col("l_partkey") == F.col("__mk"))
            & (F.col("supplycost") == F.col("__min_cost")),
        )
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.round("supplycost", 4).alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q_tpch_q9",
    oracle="""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                               - 0.1 * p_retailprice * l_quantity
                          AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_profit
    FROM part, supplier, lineitem, orders, nation
    WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      AND p_name LIKE '%rod%'
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year DESC
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): profit on '%rod%' parts by
    supplier nation and order year. Exercises a LIKE-filtered dimension
    driving a 5-table join with an ARITHMETIC-OVER-THREE-TABLES
    aggregate input (price, discount, retailprice, quantity meet only
    after the joins). Supplycost proxy: 0.1 × p_retailprice (no
    partsupp table). Scale: part filtered before its join (LIKE can't
    push to parquet stats but runs in the scan stage), nation
    broadcast, profit cast DECIMAL(18,6) pre-sum so partial-agg order
    can't move the rounded result."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%rod%"))
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit).cast("double"), 4).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q_tpch_q11",
    oracle="""
    WITH natps AS (
      SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,6)) AS val
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_3'
    )
    , per AS (
      SELECT l_partkey, sum(val) AS part_val FROM natps GROUP BY l_partkey
    )
    SELECT l_partkey AS ps_partkey,
           round(CAST(part_val AS DOUBLE), 4) AS value
    FROM per
    WHERE CAST(part_val AS DOUBLE)
         > (SELECT CAST(sum(part_val) AS DOUBLE) * 2.0 / count(*) FROM per)
    ORDER BY value DESC, ps_partkey
    """,
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): parts whose one-nation inventory
    value exceeds a threshold derived from a scalar aggregate of the
    SAME derived relation (spec shape: HAVING vs uncorrelated
    subquery). Value proxy: extendedprice of the nation's lineitems
    (no partsupp). The spec's FRACTION is 0.0001/SF — a constant
    fraction of the total empties out as the part count grows (at
    sf0.1 NO part held 0.1% of the nation total: the r6 sf0.1 sweep
    read 0 rows, a vacuous cross-engine agreement). The SF-invariant
    reformulation keeps the spec's intent and shape: parts worth MORE
    THAN 2x THE MEAN part value (threshold = 2*total/n_parts), which
    is non-empty at every SF (14/127/1228 rows at sf0.001/0.01/0.1)
    and selects ~1-10% of parts at any scale. Scale plan: `natps` is
    derived once; the per-part agg is computed once and BOTH consumers
    (the 1-row threshold agg and the filter) hang off the same
    exchange (ReuseExchange), the threshold broadcasts as a 1-row
    cross join, and the compare is a cheap post-agg filter. Decimal
    sums exact → double conversion deterministic on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    natps = li.join(supp, li.l_suppkey == supp.s_suppkey).select(
        "l_partkey", F.col("l_extendedprice").cast("decimal(18,6)").alias("val")
    )
    per_part = natps.groupBy("l_partkey").agg(F.sum("val").alias("part_val"))
    total = per_part.agg(
        (F.sum("part_val").cast("double") * 2.0 / F.count(F.lit(1))).alias("__threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_val").cast("double") > F.col("__threshold"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.round(F.col("part_val").cast("double"), 4).alias("value"),
        )
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


@query(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order distribution): histogram of customers
    by order count, INCLUDING zero-order customers — the
    outer-join-then-double-aggregate pattern. The non-key predicate
    lives IN the join condition (not a WHERE), which is the semantic
    crux: filtering after the outer join would delete the NULL rows
    that represent zero-order customers. Priority filter proxies the
    reference's comment NOT LIKE (no o_comment column). Scale: one
    outer-join shuffle on custkey, first agg rides the same
    partitioning (no second exchange), second agg shuffles |distinct
    counts| rows only."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q_tpch_q15",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           round(CAST(total_revenue AS DOUBLE), 4) AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) whose quarterly
    revenue equals the maximum — a derived CTE consumed TWICE (per-key
    rows and its own global max), the view-reuse pattern the reference
    states as a named view. Decimal revenue end-to-end so the equality
    against the max is exact (no double ulps at the boundary). Scale:
    `revenue` is one partial-agg shuffle over the quarter's lineitems;
    the max is a 1-row broadcast back onto it (exchange reuse, no
    second scan of lineitem); supplier joins last."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue()).cast("decimal(28,6)").alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(
            F.broadcast(max_rev), F.col("total_revenue") == F.col("__max_rev")
        )
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_revenue").cast("double"), 4).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q_tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 4, 7, 10, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (part-supplier relationship count): how many distinct
    suppliers serve each qualifying (brand, type, size), excluding a
    blacklist — DISTINCT-pair derivation, negated IN-list dimension
    filters, a NOT IN anti join, and COUNT(DISTINCT) in one plan.
    Blacklist proxy: s_acctbal < 1000 (no s_comment column;
    '%Complaints%' in the reference spec). Scale: the distinct-pair agg
    is the only lineitem shuffle; part's three filters prune its scan
    before the join; NOT IN compiles to a null-aware anti join against
    a broadcast-sized blacklist; count-distinct expands then
    re-aggregates on the group keys."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 4, 7, 10, 14, 19, 23, 36, 45, 49))
    )
    blacklist = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1000.0
    ).select("s_suppkey")
    return (
        ps.join(blacklist, ps.l_suppkey == blacklist.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q_tpch_q17",
    oracle="""
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
                 AS DOUBLE) / 7.0, 4) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#11' AND p_size = 5
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue from orders
    below 20% of a part's mean order quantity — the CORRELATED SCALAR
    AVG subquery, decorrelated as a per-part aggregate of the SAME
    lineitem relation joined back on partkey. Size filter proxies the
    reference's container predicate. Determinism note: l_quantity
    values are integral doubles, so the per-part sum is exact at any
    accumulation order and avg/0.2× compare identically on both
    engines. Scale: the per-part avg shuffles |parts| rows; the
    filtered-part dim broadcasts twice (probe + avg side prune is NOT
    applied to the avg — the mean must be over ALL the part's lines,
    matching the spec)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#11") & (F.col("p_size") == 5)
    ).select("p_partkey")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("__ak")).agg(
        (0.2 * F.avg("l_quantity")).alias("__qty_limit")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part_avg, li.l_partkey == F.col("__ak"))
        .filter(F.col("l_quantity") < F.col("__qty_limit"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast(
                    "double"
                )
                / 7.0,
                4,
            ).alias("avg_yearly")
        )
    )


@query(
    "q_tpch_q20",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(l_quantity) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    recent AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(l_quantity) AS DOUBLE) AS recent_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2000-01-01'
        AND l_shipdate <  TIMESTAMP '2001-01-01'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT ps.l_suppkey
        FROM ps JOIN recent
          ON ps.l_partkey = recent.l_partkey
         AND ps.l_suppkey = recent.l_suppkey
        WHERE ps.l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'blue%'
          )
          AND ps.total_qty > 2.0 * recent.recent_qty
      )
      AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
    ORDER BY s_name
    """,
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): suppliers in one nation
    holding a surplus of 'blue%' parts — NESTED IN-subqueries three
    levels deep, each decorrelating to a semi join, with a
    derived-vs-derived quantity comparison in the middle. Surplus
    proxy: all-time supplied qty > 2× the last year's shipped qty (no
    ps_availqty column; same available-vs-demanded shape). Scale: both
    quantity relations aggregate lineitem down to |part×supp| before
    joining each other (co-partitioned on the same keys — ONE exchange
    pair, no raw-row join), the part name filter semi-joins as a
    broadcast, and the surviving suppkey set semi-joins into the
    nation-filtered supplier dim."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("total_qty")
    )
    recent = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp"))
        )
        .groupBy(
            F.col("l_partkey").alias("__rk"), F.col("l_suppkey").alias("__rs")
        )
        .agg(F.sum("l_quantity").alias("recent_qty"))
    )
    blue = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("blue%")
    ).select("p_partkey")
    surplus_supps = (
        ps.join(blue, ps.l_partkey == blue.p_partkey, "left_semi")
        .join(
            recent,
            (ps.l_partkey == F.col("__rk")) & (ps.l_suppkey == F.col("__rs")),
        )
        .filter(F.col("total_qty") > 2.0 * F.col("recent_qty"))
        .select("l_suppkey")
    )
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        supp.join(surplus_supps, supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


@query(
    "q_tpch_q22",
    oracle="""
    SELECT cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4)
             AS totacctbal
    FROM (
      SELECT c_nationkey % 5 AS cntrycode, c_acctbal
      FROM customer c
      WHERE c_acctbal > (
          SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderpriority = '1-URGENT'
        )
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): well-funded customers who
    never placed an URGENT order, grouped by country code — an uncorrelated scalar AVG
    threshold plus a correlated NOT EXISTS, decorrelated to a 1-row
    broadcast filter and a LEFT ANTI join. Country code proxy:
    c_nationkey % 5 (no c_phone column to substring). Scale: the avg is
    one 1-row agg broadcast into the customer scan's filter; the anti
    join shuffles on custkey only for customers above threshold
    (filter-before-join ordering matters at 100 TB: the anti probe side
    is pre-shrunk)."""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 5).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double"), 4
            ).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
