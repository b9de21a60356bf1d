"""Window-function queries (SURVEY.md §2.B Window functions).

A window spec = one shuffle on partitionBy keys + per-partition sort.
Multiple functions over the SAME spec share one Window exec — group
them. Orderings are made total with key tie-breaks (FIXTURES.md §C).

Scale note: a window with no partitionBy collapses to a single
partition — never ship one; every spec here partitions on a real key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl4s_spark.queries import query
from etl4s_spark.sources.tables import load_table


@query(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM orders
    WHERE o_custkey <= 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_custkey, rn
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    ).orderBy("o_custkey", "rn")


@query(
    "q_window_analytic",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS DATE)                          AS order_date,
           o_totalprice,
           lag(o_totalprice)  OVER w                          AS prev_price,
           lead(o_totalprice) OVER w                          AS next_price,
           first_value(o_totalprice) OVER w                   AS first_price,
           round(o_totalprice - coalesce(lag(o_totalprice) OVER w, o_totalprice), 4)
                                                              AS price_delta
    FROM orders
    WHERE o_custkey <= 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def q_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.round(
            F.col("o_totalprice") - F.coalesce(F.lag("o_totalprice").over(w), F.col("o_totalprice")),
            4,
        ).alias("price_delta"),
    ).orderBy("o_custkey", "order_date", "o_orderkey")


@query(
    "q_window_frame_rows",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_qty,
           round(avg(l_extendedprice) OVER (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)         AS moving_avg_price
    FROM lineitem
    WHERE l_suppkey <= 20
    ORDER BY l_suppkey, l_orderkey, l_linenumber
    """,
)
def q_window_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frames: running sum + 3-row moving average."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 20)
    order = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    w_run = (
        Window.partitionBy("l_suppkey").orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    )
    w_mov = Window.partitionBy("l_suppkey").orderBy(*order).rowsBetween(-2, 0)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w_run), 4).alias("running_qty"),
        F.round(F.avg("l_extendedprice").over(w_mov), 4).alias("moving_avg_price"),
    ).orderBy("l_suppkey", "l_orderkey", "l_linenumber")


@query(
    "q_window_frame_range",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS n_within_10k,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_price_range
    FROM orders
    WHERE o_custkey <= 100
    ORDER BY o_custkey, o_totalprice, o_orderkey
    """,
)
def q_window_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frames: value-based bounds. Note RANGE UNBOUNDED..CURRENT
    includes ALL peers of the current value (ties), unlike ROWS."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w_near = Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-10000, 10000)
    w_cum = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w_near).alias("n_within_10k"),
        F.round(F.sum("o_totalprice").over(w_cum), 4).alias("cum_price_range"),
    ).orderBy("o_custkey", "o_totalprice", "o_orderkey")


@query(
    "q_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 5
    ORDER BY c_mktsegment, rn
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: row_number + filter. Catalyst 4.x rewrites this to
    a WindowGroupLimit (per-partition top-k before the shuffle), so the
    exchange carries only k rows per group per mapper — the at-scale
    idiom; never sort-then-collect."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.select("c_mktsegment", "c_custkey", "c_name", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .orderBy("c_mktsegment", "rn")
    )


@query(
    "q_window_distribution",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(percent_rank() OVER w, 6)                    AS pct_rank,
           round(cume_dist()    OVER w, 6)                    AS cume,
           round(nth_value(o_totalprice, 2) OVER
                 (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                                                              AS second_price
    FROM orders
    WHERE o_custkey <= 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_custkey, o_totalprice, o_orderkey
    """,
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist /
    nth_value. The ordering is made total with the o_orderkey tie-break;
    nth_value uses the running frame (default in both engines for an
    ordered window) so row 2's price appears only once two rows exist."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.nth_value("o_totalprice", 2).over(wf), 4).alias("second_price"),
    ).orderBy("o_custkey", "o_totalprice", "o_orderkey")


@query(
    "q_window_range_interval",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS c
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           strftime(day, '%Y-%m-%d') AS day,
           CAST(sum(c) OVER (PARTITION BY event_type ORDER BY day
                 RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS BIGINT)
             AS rolling7_cents,
           CAST(count(*) OVER (PARTITION BY event_type ORDER BY day
                 RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS BIGINT)
             AS days_in_window
    FROM daily
    ORDER BY event_type, day
    LIMIT 500
    """,
)
def q_window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-interval RANGE frame: the rolling 7-day window defined by
    the CALENDAR (RANGE BETWEEN INTERVAL 6 DAYS PRECEDING), not by row
    count — on a gappy series the two differ exactly where it matters
    (days_in_window < 7 exposes the gaps a ROWS frame would silently
    paper over). Spark evaluates interval range frames natively in the
    window exec; sums are exact cents. The SQL form is used because
    the DataFrame rangeBetween API takes only numeric offsets —
    the one surface where SQL expresses more than the fluent API."""
    import uuid

    ev = load_table(spark, sf_dir, "events")
    view = f"__daily_cents_{uuid.uuid4().hex}"
    ev.groupBy(
        "event_type", F.date_trunc("DAY", "ts").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("c")
    ).createOrReplaceTempView(view)
    out = ev.sparkSession.sql(
        f"""
        SELECT event_type,
               date_format(day, 'yyyy-MM-dd') AS day,
               CAST(sum(c) OVER (PARTITION BY event_type ORDER BY day
                     RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS rolling7_cents,
               CAST(count(*) OVER (PARTITION BY event_type ORDER BY day
                     RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS days_in_window
        FROM {view}
        ORDER BY event_type, day
        LIMIT 500
        """
    )
    ev.sparkSession.catalog.dropTempView(view)  # plan analyzed; safe
    return out
