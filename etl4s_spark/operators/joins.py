"""Join operators (SURVEY.md §2.B Joins).

Standard joins are thin, documented wrappers over ``DataFrame.join`` —
Catalyst + AQE pick broadcast / sort-merge / shuffled-hash and handle
skew. The custom compositions Spark SQL lacks natively:

- ``asof_join``: nearest-earlier-timestamp match via the union+window
  pattern — ONE shuffle on the keys, linear in input, no range
  explosion. This is the 100 TB-safe formulation (a naive
  ``l.ts >= r.ts`` theta join is a per-key cross product).
- ``interval_join``: equi-key + range predicate — hash join on the key
  with the range as a post-join filter (Catalyst evaluates it inside the
  join), falling back to broadcast-nested-loop only when no equi key
  exists (then the small side MUST be broadcast-sized).

Reference context: etl4s delegates all joins to the host engine
(/root/reference/docs/examples-spark.md:91-97); these operators are the
native surface our engine provides instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Equi/theta join. ``how``: inner, left, right, full, left_semi,
    left_anti, cross. Catalyst picks the physical strategy; AQE converts
    to broadcast at runtime if a side turns out small."""
    return left.join(right, on=on, how=how)


def broadcast_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Join with an explicit broadcast hint on the right side. Use for
    bounded dims (region/nation — 5/25 rows at EVERY scale factor):
    eliminates the shuffle of the big side entirely."""
    return left.join(F.broadcast(right), on=on, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach the right row with the
    greatest ``right_ts`` <= ``left_ts`` within the same ``keys``
    (``direction="backward"``, inclusive — DuckDB ``ASOF JOIN``
    semantics), or the SMALLEST ``right_ts`` >= ``left_ts``
    (``direction="forward"`` — pandas ``merge_asof`` parity; the same
    window scans with the sort reversed, so cost is identical), or the
    CLOSEST of the two (``direction="nearest"``, ties to backward —
    pandas ``merge_asof(direction='nearest')``; both fills share one
    hash exchange, so nearest costs one extra sort, not a second
    shuffle).

    Implementation (union + window, SURVEY.md §7.4):
      1. Tag right rows side=0 carrying ONE payload struct (ts + value
         columns); left rows side=1 with a null payload.
      2. One window per key, ordered by (ts, side, payload): a single
         running ``last(payload, ignorenulls=True)`` fills each left row
         with the most recent right payload at-or-before it. side orders
         right BEFORE left at equal ts → inclusive match; the payload
         struct makes the ordering total among right rows sharing a
         timestamp AND the fill atomic — ONE right row wins ties
         wholesale (the greatest value tuple), never a per-column merge
         of different right rows with complementary nulls (ADVICE r2).
      3. Keep the left rows, unpack the struct.

    Scale: exactly ONE hash shuffle on ``keys`` + a per-partition sort —
    identical cost profile to a groupBy. No driver collect, no range
    cross-product; skewed keys are handled by AQE skew-split on the
    exchange. ``tolerance`` (a Column interval, e.g. F.expr("INTERVAL 1
    HOUR")) turns matches farther than ``tolerance`` from ``left_ts``
    (older for backward, newer for forward) into nulls.
    """
    from pyspark.sql import types as T

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    keys = list(keys)
    lcols = left.columns

    payload_type = T.StructType(
        [T.StructField("__ts", right.schema[right_ts].dataType)]
        + [T.StructField(v, right.schema[v].dataType) for v in right_values]
    )
    right_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias("__asof_side"),
        F.struct(
            F.col(right_ts).alias("__ts"), *[F.col(v) for v in right_values]
        ).alias("__asof_p"),
        *[F.lit(None).alias(f"__asof_l_{c}") for c in lcols],
    )
    left_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias("__asof_side"),
        F.lit(None).cast(payload_type).alias("__asof_p"),
        *[F.col(c).alias(f"__asof_l_{c}") for c in lcols],
    )

    unioned = right_tagged.unionByName(left_tagged)
    # forward = the same scan with time reversed: ts DESC puts later rows
    # first, so the running last() holds the SMALLEST right ts at-or-after
    # each left row. side stays ASC (right before left at equal ts →
    # inclusive both directions); payload stays ASC so the greatest value
    # tuple still wins ties wholesale.
    def running_fill(ts_order):
        w = (
            Window.partitionBy(*keys)
            .orderBy(
                ts_order,
                F.col("__asof_side").asc(),
                F.col("__asof_p").asc_nulls_first(),
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last(F.col("__asof_p"), ignorenulls=True).over(w)

    def within(match, direc):
        if direc == "backward":
            return F.col(f"{match}.__ts") >= (F.col("__asof_ts") - tolerance)
        return F.col(f"{match}.__ts") <= (F.col("__asof_ts") + tolerance)

    if direction == "nearest":
        # both fills share ONE hash exchange on keys (same partitioning,
        # two sort orders); the closer match wins, ties go backward —
        # pandas merge_asof(direction='nearest') parity
        filled = unioned.select(
            "*",
            running_fill(F.col("__asof_ts").asc()).alias("__asof_b"),
            running_fill(F.col("__asof_ts").desc()).alias("__asof_f"),
        )
        out = filled.filter(F.col("__asof_side") == 1)
        b, f = F.col("__asof_b"), F.col("__asof_f")
        if tolerance is not None:
            b = F.when(within("__asof_b", "backward"), b)
            f = F.when(within("__asof_f", "forward"), f)
        out = out.select("*", b.alias("__asof_bt"), f.alias("__asof_ft"))
        diff_b = F.unix_micros(F.col("__asof_ts")) - F.unix_micros(
            F.col("__asof_bt.__ts")
        )
        diff_f = F.unix_micros(F.col("__asof_ft.__ts")) - F.unix_micros(
            F.col("__asof_ts")
        )
        out = out.select(
            "*",
            F.when(F.col("__asof_ft").isNull(), F.col("__asof_bt"))
            .when(F.col("__asof_bt").isNull(), F.col("__asof_ft"))
            .when(diff_b <= diff_f, F.col("__asof_bt"))
            .otherwise(F.col("__asof_ft"))
            .alias("__asof_mn"),
        )
        matched = "__asof_mn"
    else:
        ts_order = (
            F.col("__asof_ts").asc()
            if direction == "backward"
            else F.col("__asof_ts").desc()
        )
        filled = unioned.select("*", running_fill(ts_order).alias("__asof_m"))
        out = filled.filter(F.col("__asof_side") == 1)
        if tolerance is not None:
            out = out.select(
                "*",
                F.when(within("__asof_m", direction), F.col("__asof_m")).alias(
                    "__asof_mt"
                ),
            )
            matched = "__asof_mt"
        else:
            matched = "__asof_m"

    return out.select(
        *[F.col(f"__asof_l_{c}").alias(c) for c in lcols],
        F.col(f"{matched}.__ts").alias(f"matched_{right_ts}"),
        *[F.col(f"{matched}.{v}").alias(f"matched_{v}") for v in right_values],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    equi_keys: Sequence[tuple[str, str]],
    range_cond: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-key + range-predicate join: hash-partitioned on the equi keys
    with the range condition evaluated inside the join — no cross
    product. ``equi_keys`` is [(left_col, right_col), ...]. With NO equi
    key, pass equi_keys=[] — Catalyst falls back to
    BroadcastNestedLoopJoin; only do that when one side is
    broadcast-small (bands, calendars, bucket tables)."""
    cond = range_cond
    for lc, rc in equi_keys:
        cond = (left[lc] == right[rc]) & cond
    return left.join(right, on=cond, how=how)


def range_bucket_join(
    intervals: DataFrame,
    points: DataFrame,
    lo_col: str,
    hi_col: str,
    pt_col: str,
    bucket_width: int,
) -> DataFrame:
    """Pure range join (NO equi key) rewritten as an equi join on range
    buckets — the formulation that scales when ``interval_join``'s no-
    equi-key fallback (BroadcastNestedLoopJoin) can't: both sides big.

    Each interval [lo, hi] is exploded to every bucket of width
    ``bucket_width`` it overlaps (``sequence`` — at most
    ceil(max_width/bucket_width)+1 rows per interval); each point lands
    in exactly ONE bucket, so the bucket equi-join proposes every
    true (interval, point) pair EXACTLY ONCE (no post-dedup) and the
    exact predicate lo <= pt <= hi refines inside the join. Cost: one
    hash shuffle per side on the bucket id + the bounded interval
    blow-up. Pick ``bucket_width`` ≈ the typical interval width: wider
    → fewer interval replicas but more false candidates per bucket;
    narrower → the reverse. Columns must be numeric (cast timestamps to
    epoch first); both inputs keep all their columns in the output."""
    b_lo = F.floor(F.col(lo_col) / bucket_width).cast("long")
    b_hi = F.floor(F.col(hi_col) / bucket_width).cast("long")
    iv = intervals.withColumn("__bucket", F.explode(F.sequence(b_lo, b_hi)))
    pt = points.withColumn(
        "__bucket", F.floor(F.col(pt_col) / bucket_width).cast("long")
    )
    return (
        iv.join(pt, "__bucket")
        .filter((F.col(pt_col) >= F.col(lo_col)) & (F.col(pt_col) <= F.col(hi_col)))
        .drop("__bucket")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-resistant equi join: a hot key's rows no longer land in one
    task. The left (big, skewed) side gets a per-row salt derived from
    xxhash64 of the whole row; the right side is replicated salt_buckets×
    via explode; the join key becomes (keys..., salt), splitting each hot
    key across salt_buckets tasks at the cost of a salt_buckets× blow-up
    of the (smaller) right side.

    Supported ``how``: inner, left, left_semi, left_anti — modes where
    replicated right rows can't fabricate unmatched-row output. (right /
    full outer would emit one null-padded row per *replica*; use AQE
    skew-join for those.) Prefer AQE's automatic skew splitting first —
    this operator is for the cases AQE can't see: skew materializing
    mid-pipeline after AQE planned, or aggregation-free pipelines where a
    specific hot key is known in advance."""
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(f"salted_join supports {sorted(allowed)}, got {how!r}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets)
    ).cast("int")
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    # Pin a SORT-MERGE join. Left to its stats Catalyst may instead
    # BROADCAST the replicated side — a plan where salting is pure
    # overhead (a broadcast join has no shuffle and thus no partition
    # skew; building a salt_buckets× hashed relation per executor just
    # burns memory and build time, measured 3.6× slower on the driver
    # gate). The hinted plan shuffles both sides on (keys, salt) — the
    # distribution the operator exists to create. MERGE rather than
    # SHUFFLE_HASH (r8): both produce the identical exchange, but the
    # hash variant must hold the whole per-partition build side
    # (salt_buckets × right) in one in-memory map — the r8 TPC-H scale
    # probe OOM'd it at 10× data ("not enough memory to build hash
    # map"); sort-merge spills and is the big×big join of record at
    # 100 TB.
    out = l_salted.join(r_salted.hint("merge"), on=[*on, "__salt"], how=how)
    return out.drop("__salt")
