"""Product-analytics operators — reusable builders behind the round-5
insights queries (streaks, attribution, concentration, key-skew).

Each takes/returns DataFrames with explicit column parameters so any
event-shaped or fact-shaped table can use them; the q_* queries bind
them to the test tables and carry the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl4s_spark.operators.ranking import one_part


def activity_streaks(
    df: DataFrame,
    key: str,
    ts: str,
    min_days: int = 1,
) -> DataFrame:
    """Gaps-and-islands: per-key runs of CONSECUTIVE active days →
    (key, streak_start, streak_end, streak_days). The island id is the
    classic ``day_number − row_number`` difference — constant within a
    run, strictly increasing across gaps — so the whole computation is
    one distinct + one window + one aggregate sharing a single hash
    shuffle on the key."""
    days = df.select(
        F.col(key), F.date_trunc("DAY", F.col(ts)).cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy(key).orderBy("day")
    numbered = days.withColumn(
        "island",
        F.datediff("day", F.lit("1970-01-01").cast("date")) - F.row_number().over(w),
    )
    return (
        numbered.groupBy(key, "island")
        .agg(
            F.date_format(F.min("day"), "yyyy-MM-dd").alias("streak_start"),
            F.date_format(F.max("day"), "yyyy-MM-dd").alias("streak_end"),
            F.count(F.lit(1)).cast("long").alias("streak_days"),
        )
        .filter(F.col("streak_days") >= min_days)
        .select(key, "streak_start", "streak_end", "streak_days")
    )


def first_last_touch(
    events: DataFrame,
    key: str,
    ts: str,
    order_col: str,
    label: str,
    conversion: Column,
    none_label: str = "(none)",
) -> DataFrame:
    """Attribution: per key, the FIRST and LAST ``label`` value among
    events strictly before the first event matching ``conversion``
    (lexicographic (ts, order_col) — a total order, so same-timestamp
    ties are deterministic). Keys whose conversion is their first event
    get ``none_label``. Both touches come out of ONE aggregate via
    min_by/max_by over the (ts, order_col) struct — no ranking windows,
    two shuffles total on the key."""
    conv = events.filter(conversion)
    first_conv = conv.groupBy(key).agg(
        F.min(F.struct(ts, order_col)).alias("__fc")
    )
    before = events.join(first_conv, key).filter(
        F.struct(ts, order_col) < F.col("__fc")
    )
    touches = before.groupBy(key).agg(
        F.min_by(label, F.struct(ts, order_col)).alias("first_touch"),
        F.max_by(label, F.struct(ts, order_col)).alias("last_touch"),
    )
    return first_conv.join(touches, key, "left").select(
        key,
        F.coalesce("first_touch", F.lit(none_label)).alias("first_touch"),
        F.coalesce("last_touch", F.lit(none_label)).alias("last_touch"),
    )


def lorenz_deciles(df: DataFrame, key: str, amount: Column) -> DataFrame:
    """Concentration (Pareto/Lorenz) deciles of an exact-integer amount
    per key: (decile, n_keys, amount_total, share_e6). Deciling is the
    TWO-PASS distributed rank (operators/ranking.py — VERDICT r5 #1: the
    ntile here used to sort every key through ONE partition):
    eighth-octave log amount buckets → broadcast prefix offsets →
    per-bucket rank → exact integer ntile arithmetic, bit-identical to
    ntile(10) with the key tie-break, no unpartitioned window. The share
    is integer division — engine-exact. The share numerator runs in the
    d38 lane: decile_cents × 10⁶ crossed int64 at 100× sf0.1 (the r8
    scale probe's find — a long `amount_total * 1000000` ANSI-crashed);
    decimal × literal div decimal is IntegralDivide → long, exact to
    ~10²² total cents. DuckDB's oracle always summed into hugeint, so
    only the Spark lane needed widening."""
    from etl4s_spark.functions.exact import d38
    from etl4s_spark.operators.ranking import exact_ntile, global_index, log_bucket

    # one row per key; materialized once so the fact table is scanned
    # exactly once — the rank pass, its bucket histogram, and the total
    # all read the checkpoint
    per_key = df.groupBy(key).agg(F.sum(d38(amount)).alias("__amt")).localCheckpoint(
        eager=True
    )
    total = per_key.agg(F.sum("__amt").alias("__total"))
    ranked = global_index(
        per_key,
        F.col("__amt"),
        log_bucket(F.col("__amt")),
        [key],
        ascending=False,
        total_name="n_total",
    ).select("__amt", exact_ntile(10).alias("decile"))
    return (
        ranked.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("__amt").alias("__amt_total"),
        )
        .join(F.broadcast(total))
        .select(
            F.col("decile").cast("int"),
            "n_keys",
            F.col("__amt_total").cast("long").alias("amount_total"),
            F.expr("(__amt_total * 1000000) div __total").alias("share_e6"),
        )
    )


def key_skew_profile(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """One-row shuffle-key skew diagnostic: n_keys, n_rows, max/min
    per-key rows, top-N heavy-hitter share, exact-rank Gini — all bigint
    until one integer division to micro-units. The ranking runs over the
    per-key aggregate (O(keys) rows) via the TWO-PASS distributed rank
    (operators/ranking.py — VERDICT r5 #1: two unpartitioned row_number
    windows used to sort all keys through one partition each). ONE
    ascending index suffices: the descending top-N heavy-hitter set is
    the ascending order's LAST N rows (i > n_keys − N) — the two orders
    permute rows only within equal-count blocks, so the top-N COUNT
    multiset (and its sum) is identical regardless of key tie-break
    direction."""
    from etl4s_spark.operators.ranking import global_index, log_bucket

    # one row per key, materialized once: rank pass + bucket histogram
    # read the checkpoint, the fact table is scanned exactly once
    per_key = (
        df.groupBy(key).agg(F.count(F.lit(1)).alias("c")).localCheckpoint(eager=True)
    )
    ranked = global_index(
        per_key, F.col("c"), log_bucket(F.col("c")), [key],
        idx_name="i", total_name="nk",
    )
    # d38 lane (r8, same class as lorenz_deciles): Σ i·c is
    # keys×rows-magnitude (~10²⁰ at 100 TB) and the Gini numerator
    # multiplies it by 10⁶ — int64 accumulation dies near 10⁹ rows;
    # decimal sums keep every term exact and `div` on decimals is
    # IntegralDivide → long outputs, unchanged schema.
    from etl4s_spark.functions.exact import d38

    s = ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(d38("c")).alias("n_rows"),
        F.max("c").alias("max_cnt"),
        F.min("c").alias("min_cnt"),
        F.sum(d38("i") * d38("c")).alias("weighted"),
        F.sum(F.when(F.col("i") > F.col("nk") - top_n, d38("c"))).alias("topn"),
    )
    return s.select(
        F.col("n_keys").cast("long"),
        F.col("n_rows").cast("long"),
        F.col("max_cnt").cast("long"),
        F.col("min_cnt").cast("long"),
        F.expr("(topn * 1000000) div n_rows").alias(f"top{top_n}_share_e6"),
        F.expr(
            "((2 * weighted - (n_keys + 1) * n_rows) * 1000000) div (n_keys * n_rows)"
        ).alias("gini_e6"),
    )


def exact_quartiles_cents(
    df: DataFrame, group_col: str, cents_col: str
) -> DataFrame:
    """EXACT interpolated quartiles (Spark ``percentile`` / SQL
    percentile_cont semantics: 0-based index q·(n−1), linear
    interpolation) over an integer-cents column — as a TWO-PHASE
    counts-histogram instead of the builtin aggregate.

    Why not ``percentile()``: that aggregate funnels every raw row into
    one reducer PER GROUP (3 return flags → 3 tasks own the whole fact
    table; the 10× scaling probe clocked it at 7.6× for 10× data, the
    worst in the suite). Here the fact table collapses map-side to
    (group, value, count) — full shuffle parallelism, combiner-friendly
    — and only the DISTINCT-value histogram (bounded by the cents
    domain, not row count) flows through the per-group cumulative
    window. At 100 TB the histogram per group is still ~1M rows for
    money-like domains: constant, not corpus-sized.

    Exactness: quartile index arithmetic is pure integers —
    t·4 = q4·(n−1) with q4 ∈ {1,2,3}, floor/ceil by integer div — and
    the interpolated value a + (b−a)·frac is a quarter-cent multiple
    (dyadic rational, exact in doubles), matching both engines'
    percentile_cont bit-for-bit. Returns (group, p25, median, p75, n)
    in CENTS (callers scale/round for display)."""
    # No pre-aggregation widen here: the partial (map-side) aggregation
    # collapses the fact rows to the bounded (g, p) histogram BEFORE the
    # exchange, so the aggregation's own shuffle moves only histogram
    # rows. A repartition of the raw rows below the partial aggregate
    # costs a full raw-row shuffle and forfeits map-side combine
    # (guide §2.3 "aggregate before you shuffle"; measured +0.6-1.1 s on
    # q_anomaly_mad / weighted_median / percentile_disc in round 12).
    cnt = (
        df.select(F.col(group_col).alias("g"), F.col(cents_col).alias("p"))
        .groupBy("g", "p")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # one_part("p") rides along in every partition spec: callers that
    # pass a LITERAL group (F.lit(1).alias("g")) would otherwise have
    # the g attribute constant-folded away by FoldablePropagation,
    # decaying the window to 'No Partition Defined' — partitioning by
    # (g, const-0) is semantically identical to (g) and non-foldable
    # (operators/ranking.py one_part).
    w = Window.partitionBy("g", one_part("p")).orderBy("p")
    hist = cnt.select(
        "g",
        "p",
        "c",
        (F.sum("c").over(w) - F.col("c")).alias("cum_start"),
        F.sum("c").over(w).alias("cum_end"),
        F.sum("c").over(Window.partitionBy("g", one_part("p"))).alias("n"),
    )
    quartile_cols = []
    for name, q4 in (("p25", 1), ("median", 2), ("p75", 3)):
        t4 = F.lit(q4) * (F.col("n") - 1)  # index * 4, exact bigint
        lo_idx = F.expr(f"({q4} * (n - 1)) div 4")
        hi_idx = F.expr(f"({q4} * (n - 1) + 3) div 4")
        frac4 = t4 % 4  # numerator of the fractional part, /4
        a = F.max(
            F.when(
                (lo_idx >= F.col("cum_start")) & (lo_idx < F.col("cum_end")), F.col("p")
            )
        )
        b = F.max(
            F.when(
                (hi_idx >= F.col("cum_start")) & (hi_idx < F.col("cum_end")), F.col("p")
            )
        )
        frac_num = F.max(
            F.when(
                (lo_idx >= F.col("cum_start")) & (lo_idx < F.col("cum_end")), frac4
            )
        )
        # a + (b - a) * frac4/4 — quarter-cent exact
        quartile_cols.append(
            (a + (b - a) * frac_num / F.lit(4.0)).alias(name)
        )
    return (
        hist.groupBy("g")
        .agg(*quartile_cols, F.max("n").cast("long").alias("n"))
        .withColumnRenamed("g", group_col)
    )
