"""Deduplication operators for LLM training-data pipelines.

Four tiers, cheapest-first — the standard corpus-dedup funnel:

1. ``exact_dedup``     — md5 of normalized text; one shuffle on the hash.
2. ``minhash_lsh``     — MinHash signatures + banded LSH: near-dup
                         CANDIDATE pairs with one shuffle on
                         (band_idx, band_hash). Sub-quadratic; the only
                         formulation that survives 100 TB.
3. ``simhash``         — 64-bit SimHash per doc (Hamming-distance near-dup
                         key); pure per-row expression, zero shuffles.
4. ``ngram_jaccard_pairs`` — EXACT Jaccard for candidate verification;
                         quadratic per bucket, so only ever applied to
                         LSH candidates or bounded subsets.

All hashing uses Spark's built-in xxhash64 with per-permutation seed
columns — deterministic across runs/partitions (fixed seeds, FIXTURES.md
§C), JVM-side, no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl4s_spark.operators.text import fingerprint_md5, normalize_text, shingles


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the lowest-id row per normalized-content fingerprint.

    Deterministic by construction (row_number over an explicit ordering)
    — unlike ``dropDuplicates``, which keeps an arbitrary row and would
    flake the oracle. One shuffle on the fingerprint."""
    fp = fingerprint_md5(F.col(text_col)).alias("__fp")
    w = Window.partitionBy("__fp").orderBy(F.col(id_col))
    return (
        df.select("*", fp)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


def minhash_signature(text: Column, num_perm: int = 64, shingle_k: int = 3) -> Column:
    """MinHash signature (array<bigint>, length num_perm) of the word
    k-shingle set.

    Permutation i = xxhash64(shingle, seed=i); the signature element is
    the min over shingles. Entirely higher-order expressions — computed
    in the scan stage."""
    sh = shingles(text, k=shingle_k)

    def perm_hash(i: int):
        # closure factory — a default-arg lambda would become a 2-param
        # (element, index) lambda and hash with the index instead of the seed
        return lambda s: F.xxhash64(s, F.lit(i))

    return F.array(*[F.array_min(F.transform(sh, perm_hash(i))) for i in range(num_perm)])


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded LSH.

    rows × bands get exploded to (band_idx, band_hash) keys; docs sharing
    a band key are candidates. Returns (id_a, id_b, n_shared_bands) with
    id_a < id_b.

    Scale: the explode is a bands-× row multiplier (16 here) but each row
    is (key, id) only; the single shuffle partitions by (band_idx,
    band_hash). Hot buckets (boilerplate docs) are the skew risk —
    AQE skew-join handles moderate cases; for pathological ones cap
    bucket size with a per-bucket limit before the self-join
    (dropping mega-buckets ≈ dropping boilerplate, usually desired).
    """
    rows_per_band = num_perm // bands
    sig = minhash_signature(F.col(text_col), num_perm=num_perm, shingle_k=shingle_k)
    banded = df.select(F.col(id_col).alias("doc"), sig.alias("__sig")).select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("__sig", b * rows_per_band + r + 1).cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc", "band.band_idx", "band.band_hash")

    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .groupBy(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    return pairs


def simhash(text: Column, bits: int = 64) -> Column:
    """SimHash of the word set: per word, xxhash64 contributes ±1 to each
    bit position; the sign of each accumulated bit forms the hash
    (returned as bigint). Near-dups = small Hamming distance.

    Zero shuffles — a pure per-row fold, usable as a grouping key for
    bucketed near-dup joins at any scale."""
    from etl4s_spark.operators.text import words

    w = words(text)
    hashes = F.transform(w, lambda x: F.xxhash64(x))
    acc0 = F.array_repeat(F.lit(0), bits)
    # bit positions unrolled as Python ints — F.shiftright requires a
    # literal int shift amount, not a Column
    accumulated = F.aggregate(
        hashes,
        acc0,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                    for b in range(bits)
                ]
            ),
            lambda a, v: a + v,
        ),
    )
    out = F.lit(0).cast("bigint")
    for b in range(bits):
        # bit 63 is the sign bit: 1<<63 overflows signed int64, so use its
        # two's-complement value
        bit_val = 1 << b if b < 63 else -(1 << 63)
        out = out.bitwiseOR(
            F.when(
                F.element_at(accumulated, b + 1) > 0, F.lit(bit_val).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint"))
        )
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit simhashes (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard for all pairs — via explode + equi-join on the
    shingle (set semantics: distinct shingles per doc).

    |A∩B| from the join, |A∪B| = |A|+|B|−|A∩B|. Quadratic in bucket
    size: apply ONLY to LSH candidates or bounded slices; the shuffle key
    is the shingle string."""
    sh = (
        df.select(F.col(id_col).alias("doc"), F.explode(F.array_distinct(shingles(F.col(text_col), k=shingle_k))).alias("sh"))
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
