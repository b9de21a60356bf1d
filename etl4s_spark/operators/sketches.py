"""Sketches-as-data: Count-Min frequency sketch and exact bitmap
distinct counting, both built from pure DataFrame aggregations.

The engine already carries the two mergeable cardinality sketches Spark
ships natively (HLL via ``hll_sketch_agg`` — q_agg_hll_union — and the
Bloom filter — q_filter_bloom). This module adds the FREQUENCY sketch of
that family (Count-Min, Cormode & Muthukrishnan 2005) and the exact
counterpart people reach for when approximate isn't acceptable: fixed
width bitmap distinct (the RoaringBitmap pattern, expressed with plain
``bit_or``/``bit_count`` so it stays inside whole-stage codegen).

Determinism contract: the Count-Min hash family is universal hashing
over pure BIGINT arithmetic — ``((a_j * key + b_j) % P) % width`` with
P = 2^31 − 1 and fixed odd constants — NOT any engine hash builtin, so a
DuckDB oracle reproduces every counter and every estimate bit-for-bit.
No float appears anywhere in either operator.

Native-builtin relationship: Spark also ships ``count_min_sketch()``
(binary DataSketches payload) and the ``bitmap_construct_agg`` family
(binary bitmaps — surfaced by q_agg_bitmap_native). Those are the
engine-optimized fast paths; the renditions here keep the sketch STATE
as ordinary relational rows, which is what makes them cross-engine
verifiable, diffable, and shardable with plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed universal-hash parameters (classic LCG multipliers/increments);
# P is the Mersenne prime 2^31-1. a_j * key stays well inside int64 for
# any key < 2^32 — at 100 TB, pre-hash wider keys down with xxhash64
# (both sides of a Spark-only pipeline) or a modular fold first.
CMS_P = 2_147_483_647
CMS_A = (1_103_515_245, 214_013, 69_069, 1_664_525)
CMS_B = (12_345, 2_531_011, 362_437, 1_013_904_223)


def _cms_bucket(key, j: int, width: int):
    return ((F.lit(CMS_A[j]) * key + F.lit(CMS_B[j])) % CMS_P) % width


def cms_counters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the Count-Min counter table: (j, bucket, c) with
    depth × width rows. ONE map-side-combined shuffle over the input
    (rows are exploded ×depth map-side, then grouped on the tiny
    (j, bucket) domain) — the whole sketch is ~depth·width rows, small
    enough to broadcast anywhere, and mergeable across shards by summing
    matching (j, bucket) cells.

    ``weight_col`` inserts each key ``weight`` times (CMS over a
    multiset = count-weighted inserts of its support) — pass a
    pre-aggregated (key, count) frame to build the sketch without
    re-scanning the fact table."""
    if depth > len(CMS_A):
        raise ValueError(f"depth must be <= {len(CMS_A)}, got {depth}")
    key = F.col(key_col).cast("long")
    w = F.lit(1).cast("long") if weight_col is None else F.col(weight_col).cast("long")
    rows = df.select(
        w.alias("__w"),
        F.posexplode(
            F.array(*[_cms_bucket(key, j, width) for j in range(depth)])
        ).alias("j", "bucket"),
    )
    return rows.groupBy("j", "bucket").agg(F.sum("__w").alias("c"))


def cms_estimates(
    keys: DataFrame, counters: DataFrame, key_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: est(key) =
    min_j counter[j, h_j(key)] — the Count-Min guarantee is
    true ≤ est ≤ true + ε·N with prob 1−δ (ε = e/width, δ = e^−depth).
    The counter table is broadcast (≤ depth·width rows by construction),
    so this never shuffles the key frame."""
    key = F.col(key_col).cast("long")
    probes = keys.select(
        key_col,
        F.posexplode(
            F.array(*[_cms_bucket(key, j, width) for j in range(depth)])
        ).alias("j", "bucket"),
    )
    return (
        probes.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy(key_col)
        .agg(F.min("c").cast("long").alias("est"))
    )


def bitmap_words(
    df: DataFrame, group_cols: list[str], id_col: str, width: int = 62
) -> DataFrame:
    """The mergeable bitmap STATE: group_cols + (bucket, word), where
    bucket = id div width and word OR-accumulates bit (id mod width).
    Map-side combined — the shuffle carries at most one word per bucket
    per group per task. OR is associative, commutative AND idempotent,
    so word states merge across shards, micro-batches, or duplicate
    deliveries by OR-ing matching buckets (the property count-based
    states lack). width ≤ 62 keeps ``1 << bit`` positive in a signed
    int64."""
    if not 1 <= width <= 62:
        raise ValueError(f"width must be in [1, 62], got {width}")
    return (
        df.select(
            *group_cols,
            # integer div (not float `/`): exact for ids beyond 2^53
            F.expr(f"CAST({id_col} AS BIGINT) div {width}").alias("bucket"),
            # expr form: F.shiftleft only takes a Python-int bit count
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(CAST({id_col} AS BIGINT) % {width} AS INT))"
            ).alias("w"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.expr("bit_or(w)").alias("word"))
    )


def bitmap_counts(words: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold bitmap word state to group_cols + (n_distinct, n_buckets)."""
    return words.groupBy(*group_cols).agg(
        F.sum(F.bit_count("word")).cast("long").alias("n_distinct"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )


def bitmap_distinct(
    df: DataFrame, group_cols: list[str], id_col: str, width: int = 62
) -> DataFrame:
    """EXACT distinct count of a dense non-negative integer id per
    group, without ``count_distinct``'s full-id shuffle: ids are packed
    into ``width``-bit words, OR-merged per (group, bucket) — see
    ``bitmap_words`` — and popcounts are summed per group. The
    RoaringBitmap pattern in plain ``bit_or``/``bit_count`` codegen.

    Returns group_cols + (n_distinct, n_buckets). Mergeable across
    shards/streams by OR-ing matching buckets — the property
    count_distinct lacks and the reason this shape survives incremental
    rollups (q_stream_bitmap_distinct_replay streams through the same
    word state)."""
    return bitmap_counts(bitmap_words(df, group_cols, id_col, width), group_cols)
