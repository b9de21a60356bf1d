"""Pair-cap engagement probe (VERDICT r7 item 2, r8 items 2+6 Done
criteria): show that the CAPPED propose paths — text MinHash-LSH and
embedding hyperplane-LSH — are bounded per decade once the cap binds,
on the same duplicate-heavy replication the 100x probe uses.

Why the general probe can't show this: table replication at 100x gives
every document ~100 identical copies, i.e. LSH buckets of ~100 members
= 4,950 combination pairs — UNDER a fixed 10k cap, so the r7 default
legitimately emitted the full (quadratically growing) true pair set and
its decade ratio stayed output-bound (the r8 verdict's calibration nit:
14.21x/decade with 24.07M of 27.31M pairs still emitted). Round 9 made
the default SIZE-RELATIVE — effective cap = least(10k, 8·g) binds at
g>17 — so the default lane itself must now show ~linear pairs and a
bounded decade. Text lanes per scale k in {1, 10, 100} on in-memory
k x-replicated documents:

  uncapped     abs=None,   factor=None — the quadratic baseline
  abs_10k_only abs=10_000, factor=None — the r7/r8 default; binds only
                                         past ~142 copies, i.e. NOT on
                                         this corpus (the verdict nit)
  default      abs=10_000, factor=8    — the r9 default; binds at g>17,
                                         i.e. AT the 100x (and 10x at
                                         g~=100... no: g~=k) point

Truncation accounting (ADVICE r8): the operator's per-pair `truncated`
column is the MAX single-bucket drop the pair witnessed — an audit
signal, NOT additive across pairs (every emitted pair of a capped bucket
repeats that bucket's drop count). The probe therefore records
`pairs_with_truncation` (how many emitted pairs are flagged) and
`truncated_max` (the largest single-bucket drop seen), never a sum.

Embedding section (VERDICT r8 item 6, default flipped ON in r10 —
VERDICT r9 item 1): embedding_neardup_lsh's propose stage has the same
Σg² output shape. The probe runs the SHIPPED default lane
(emb_default_capped64: least(10k, 64·g), binding at g>129 — above the
angular propose buckets the test SFs produce), the explicit
(None, None) opt-out as the output-bound baseline, and a factor-8 lane
showing the text funnel's factor is too aggressive for angular-region
buckets. EMB_DEFAULT_SCALING.json extends the default lane to 2M
vectors where auto-plane sizing engages. semdedup section (r9): its
OUTPUT is linear but
its WALL at a fixed k is O(n²/k) — the wide two-decade probe measured
27x/decade at k=8 — so two lanes compare the retired fixed-k8 default
against the r9 auto default k = ceil(sqrt(n)) (O(n^1.5), the flat-
quantizer optimum; strict linearity = the embedding-LSH route).

Planted recall sections (r11): `planted_text_recall_100x` (end-to-end
partner→group connectivity under the binding cap, ceiling = banding
probability), `planted_text_pair_emission_100x` (+ kept_band_g500/g1000
sub-lanes — PAIR-level emission recall with an uncapped control
cancelling banding; the metric that discriminates chain from star),
and `planted_text_recall_megagroup` (the g > max_bucket_size guard
posture on BOTH funnels: wholesale drop, exact-dedup-first restore).
Each carries its own in-artifact adjudication.

Usage:
    python tools/dedup_cap_probe.py [--sf /root/testdata/sf0.1]
        [--emb-sf /root/testdata/sf0.01] [-o DEDUP_CAP_PROBE.json]
        # full run ~20-30 min, run ALONE
    python tools/dedup_cap_probe.py --megagroup-only -o DEDUP_CAP_PROBE.json
        # ~5 min: re-runs ONLY the megagroup + pair-emission recall
        # lanes and MERGES their keys into the existing artifact
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def replicated(spark, sf_dir: str, table: str, id_col: str, payload: str, k: int):
    base = spark.read.parquet(f"{sf_dir}/{table}.parquet").select(id_col, payload)
    unit = base.agg(F.max(id_col)).first()[0] + 1
    out = None
    for i in range(k):
        part = base.select((F.col(id_col) + i * unit).alias(id_col), payload)
        out = part if out is None else out.unionByName(part)
    return out.localCheckpoint(eager=True)


def planted_text_recall(spark, sf_dir: str, k: int, n_plant: int = 200) -> dict:
    """Text-side emission recall under a BINDING cap (the text analog of
    EMB_DEFAULT_SCALING's pair_emitted_95): replicate documents k× (each
    original doc becomes a g=k dup group whose buckets overflow the
    default least(10k, 8g) cap), then plant ``n_plant`` NEAR-DUP
    partners — the original text with every 12th word replaced by a
    unique marker, so 3-gram Jaccard lands ~0.55-0.75: near-threshold,
    NOT a signature-identical copy.

    Returns connectivity rates: ``candidate`` = fraction of partners
    with ≥1 candidate pair into their group (propose-stage — cap-
    independent component signal), ``verified`` = fraction with ≥1
    funnel-verified pair ≥ 0.5 into their group (what a pairwise
    consumer actually sees). The ceiling on both is the banding
    probability (the partner must share ≥1 band hash with its group).

    HONEST-CONTRAST CORRECTION (of this lane's first r11 emission,
    which claimed the retired star held the partner to an ~1/g
    hub-adjacency bound): group-connectivity is hub-ROBUST — the star
    also emitted (hub, partner) whenever the partner co-bucketed, and
    the hub is a same-doc replica w.h.p., so the star would score
    comparably on THIS metric. The star's measured deficit is
    PAIR-level emission of non-hub pairs (EMB_DEFAULT_SCALING
    pair_emitted_95: 0.209 star → 0.8105 chain, a planted-PAIR lane).
    This lane's value is pinning the text funnel's end-to-end
    connectivity under a binding cap (propose → capped emission →
    exact verify), not a star-vs-chain A/B."""
    from etl4s_spark.operators.dedup import dedup_funnel, minhash_lsh_candidates

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    unit = base.agg(F.max("doc_id")).first()[0] + 1
    n_docs = base.count()
    stride = max(n_docs // n_plant, 1)
    corpus = replicated(spark, sf_dir, "documents", "doc_id", "text", k)
    p_base = 10 * unit * k  # partner ids: clear of every replica id
    partners = (
        base.filter(F.col("doc_id") % stride == 1)
        .limit(n_plant)
        .select(
            (F.col("doc_id") + p_base).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w, i: F.when(
                        i % 12 == 11, F.concat(F.lit("ptkq"), F.col("doc_id"))
                    ).otherwise(w),
                ),
                " ",
            ).alias("text"),
        )
    )
    planted = corpus.unionByName(partners).localCheckpoint(eager=True)
    n_partners = partners.count()

    def connected(pairs_df) -> int:
        p = pairs_df.select("id_a", "id_b")
        hit = (
            p.filter((F.col("id_b") >= p_base) & (F.col("id_a") < p_base))
            .filter((F.col("id_a") % unit) == (F.col("id_b") - p_base))
            .select(F.col("id_b").alias("pid"))
            .union(
                p.filter((F.col("id_a") >= p_base) & (F.col("id_b") < p_base))
                .filter((F.col("id_b") % unit) == (F.col("id_a") - p_base))
                .select(F.col("id_a").alias("pid"))
            )
            .distinct()
            .count()
        )
        return hit

    t0 = time.monotonic()
    cand = connected(minhash_lsh_candidates(planted, "doc_id", "text"))
    verified = connected(
        dedup_funnel(planted, "doc_id", "text", min_jaccard=0.5)
    )
    return {
        "k": k,
        "n_partners": n_partners,
        "group_size_g": k,
        "candidate_connected": round(cand / n_partners, 4),
        "verified_connected": round(verified / n_partners, 4),
        "wall_sec": round(time.monotonic() - t0, 3),
    }


def planted_text_recall_megagroup(
    spark, sf_dir: str, g: int, n_groups: int = 50, dedup_first: bool = False
) -> dict:
    """Planted-partner connectivity next to mega dup groups — the
    shipped default's posture ACROSS the max_bucket_size boundary.

    Under text defaults the pair cap keeps c=8 at every KEPT bucket
    (least(10k, 8g)//g = 8 for g ≤ max_bucket_size = 1000) — the c=1
    floor is unreachable — but buckets past max_bucket_size are
    DROPPED WHOLESALE before emission (the funnels' skew guard), so a
    g > 1000 boilerplate group emits NO pairs and a near-dup partner
    next to it is funnel-orphaned. The designed composition for that
    regime is exact-dedup FIRST: collapsing identical replicas to one
    representative shrinks the group's buckets back under the guard,
    after which the partner connects normally; ``dedup_first=True``
    measures exactly that composition (text-hash collapse → funnel).

    Unlike planted_text_recall (whole-corpus k×-replication), only
    ``n_groups`` sampled docs are replicated g× — via ONE
    explode(sequence) projection, not k unions — against the original
    corpus as background, keeping the planted corpus ~n_groups·g docs
    at any g."""
    from etl4s_spark.operators.dedup import dedup_funnel, minhash_lsh_candidates

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    unit = base.agg(F.max("doc_id")).first()[0] + 1
    n_docs = base.count()
    stride = max(n_docs // n_groups, 1)
    picks = base.filter(F.col("doc_id") % stride == 1).limit(n_groups)
    replicas = picks.select(
        F.col("doc_id"),
        F.col("text"),
        F.explode(F.sequence(F.lit(1), F.lit(g - 1))).alias("r"),
    ).select((F.col("doc_id") + F.col("r") * unit).alias("doc_id"), "text")
    p_base = (g + 2) * unit
    partners = picks.select(
        (F.col("doc_id") + p_base).alias("doc_id"),
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w, i: F.when(
                    i % 12 == 11, F.concat(F.lit("ptkq"), F.col("doc_id"))
                ).otherwise(w),
            ),
            " ",
        ).alias("text"),
    )
    planted = (
        base.unionByName(replicas).unionByName(partners).localCheckpoint(eager=True)
    )
    n_partners = partners.count()

    def connected(pairs_df) -> int:
        p = pairs_df.select("id_a", "id_b")
        return (
            p.filter((F.col("id_b") >= p_base) & (F.col("id_a") < p_base))
            .filter((F.col("id_a") % unit) == (F.col("id_b") - p_base))
            .select(F.col("id_b").alias("pid"))
            .distinct()
            .count()
        )

    t0 = time.monotonic()
    inp = planted
    if dedup_first:
        # the designed composition: exact-collapse identical replicas to
        # their min-id representative (the original doc, id < unit — the
        # connected() group test is unchanged), THEN run the funnel
        inp = planted.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    cands = minhash_lsh_candidates(inp, "doc_id", "text")
    cand = connected(cands)
    cand_pairs = cands.count()
    verified = connected(dedup_funnel(inp, "doc_id", "text", min_jaccard=0.5))
    return {
        "group_size_g": g,
        "n_groups": n_groups,
        "n_partners": n_partners,
        "dedup_first": dedup_first,
        "bucket_guard": (
            "kept (g <= max_bucket_size=1000, chain c=8)"
            if g <= 1000 or dedup_first
            else "dropped (g > max_bucket_size=1000: no pairs emitted)"
        ),
        "candidate_connected": round(cand / n_partners, 4),
        "verified_connected": round(verified / n_partners, 4),
        "candidate_pairs_total": cand_pairs,
        "wall_sec": round(time.monotonic() - t0, 3),
    }


def planted_text_pair_emission(
    spark, sf_dir: str, k: int = 100, n_pairs: int = 200
) -> dict:
    """Text-side PAIR-level emission recall — the metric that actually
    discriminates chain from star (see planted_text_recall's
    HONEST-CONTRAST CORRECTION: group-connectivity is hub-robust, so it
    can't A/B emission strategies). For each of ``n_pairs`` sampled
    docs, plant TWO distinct near-threshold variants (different marker
    phases → mutually near-dup, both non-identical to the doc's g=k
    replica group), so each variant pair co-buckets inside the group's
    overflowing capped buckets. A pair is counted iff the pair ITSELF
    (v1, v2) is candidate-emitted — under the retired hub star that
    required one variant to BE the bucket hub (≈ 2/(g+2) per co-bucket;
    the text analog of EMB's pair_emitted_95 0.209); under the r11
    chain it needs rank distance ≤ c−1 = 7 in some bucket's locality
    order, and the variants' similar signatures sort them adjacent.
    The UNCAPPED control run emits EVERY co-bucketing pair, so
    ``emission_recall = pair_emitted_capped / pair_emitted_uncapped``
    cancels the banding probability (variants differ from the base doc
    at every 24th word with different phases → mutual 3-gram Jaccard
    ≈ 0.6, per-band agreement ≈ 0.16, co-bucket ceiling ≈ 0.93) and
    isolates what the cap's emission strategy keeps. ``pair_verified``
    is the capped funnel at min_jaccard 0.3 (non-binding for these
    variants), so it equals capped emission when verification loses
    nothing."""
    from etl4s_spark.operators.dedup import dedup_funnel, minhash_lsh_candidates

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    unit = base.agg(F.max("doc_id")).first()[0] + 1
    n_docs = base.count()
    stride = max(n_docs // n_pairs, 1)
    corpus = replicated(spark, sf_dir, "documents", "doc_id", "text", k)
    p_base = 10 * unit * k

    def variant(phase: int):
        return base.filter(F.col("doc_id") % stride == 1).select(
            (F.col("doc_id") + p_base * (phase + 1)).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w, i: F.when(
                        i % 24 == (11 if phase == 0 else 23),
                        F.concat(F.lit(f"pv{phase}q"), F.col("doc_id")),
                    ).otherwise(w),
                ),
                " ",
            ).alias("text"),
        )

    v0, v1 = variant(0), variant(1)
    planted = corpus.unionByName(v0).unionByName(v1).localCheckpoint(eager=True)
    n_planted = v0.count()

    def pair_hits(pairs_df) -> int:
        # canonical order puts v0 (ids in [p_base, 2·p_base)) as id_a
        # and v1 (ids in [2·p_base, 3·p_base)) as id_b
        p = pairs_df.select("id_a", "id_b")
        return (
            p.filter(
                (F.col("id_a") >= p_base)
                & (F.col("id_a") < 2 * p_base)
                & (F.col("id_b") >= 2 * p_base)
            )
            .filter((F.col("id_a") % unit) == (F.col("id_b") % unit))
            .select(F.col("id_a").alias("pid"))
            .distinct()
            .count()
        )

    t0 = time.monotonic()
    emitted = pair_hits(minhash_lsh_candidates(planted, "doc_id", "text"))
    emitted_uncapped = pair_hits(
        minhash_lsh_candidates(
            planted,
            "doc_id",
            "text",
            max_pairs_per_bucket=None,
            pair_cap_factor=None,
        )
    )
    verified = pair_hits(dedup_funnel(planted, "doc_id", "text", min_jaccard=0.3))
    return {
        "k": k,
        "group_size_g": k,
        "n_planted_pairs": n_planted,
        "pair_emitted_capped": round(emitted / n_planted, 4),
        "pair_emitted_uncapped": round(emitted_uncapped / n_planted, 4),
        "emission_recall": (
            round(emitted / emitted_uncapped, 4) if emitted_uncapped else None
        ),
        "pair_verified_capped": round(verified / n_planted, 4),
        "star_analytic_bound_per_bucket": round(2 / (k + 2), 4),
        "wall_sec": round(time.monotonic() - t0, 3),
    }


def planted_text_pair_emission_megagroup(
    spark, sf_dir: str, g: int, n_groups: int = 50
) -> dict:
    """Pair-level emission recall at LARGER kept-band g — the open
    question the 100× lane can't answer: with more identical replicas
    between them in a bucket's locality order, do the two planted
    variants still land within a window of each other in SOME emitting
    band? (Identical replicas share identical locality keys, so the
    variants sort at the run's edges; whether they sort on the SAME
    edge varies per band with their own band hashes.) Megagroup-style
    construction (explode-sequence replicas of ``n_groups`` picked
    docs against the unreplicated corpus) keeps the planted corpus
    ~n_groups·g docs at any g ≤ max_bucket_size."""
    from etl4s_spark.operators.dedup import minhash_lsh_candidates

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    unit = base.agg(F.max("doc_id")).first()[0] + 1
    n_docs = base.count()
    stride = max(n_docs // n_groups, 1)
    picks = base.filter(F.col("doc_id") % stride == 1).limit(n_groups)
    replicas = picks.select(
        F.col("doc_id"),
        F.col("text"),
        F.explode(F.sequence(F.lit(1), F.lit(g - 1))).alias("r"),
    ).select((F.col("doc_id") + F.col("r") * unit).alias("doc_id"), "text")
    p_base = (g + 2) * unit

    def variant(phase: int):
        return picks.select(
            (F.col("doc_id") + p_base * (phase + 1)).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w, i: F.when(
                        i % 24 == (11 if phase == 0 else 23),
                        F.concat(F.lit(f"pv{phase}q"), F.col("doc_id")),
                    ).otherwise(w),
                ),
                " ",
            ).alias("text"),
        )

    v0, v1 = variant(0), variant(1)
    planted = (
        base.unionByName(replicas)
        .unionByName(v0)
        .unionByName(v1)
        .localCheckpoint(eager=True)
    )
    n_planted = v0.count()

    def pair_hits(pairs_df) -> int:
        p = pairs_df.select("id_a", "id_b")
        return (
            p.filter(
                (F.col("id_a") >= p_base)
                & (F.col("id_a") < 2 * p_base)
                & (F.col("id_b") >= 2 * p_base)
            )
            .filter((F.col("id_a") % unit) == (F.col("id_b") % unit))
            .select(F.col("id_a").alias("pid"))
            .distinct()
            .count()
        )

    t0 = time.monotonic()
    emitted = pair_hits(minhash_lsh_candidates(planted, "doc_id", "text"))
    emitted_uncapped = pair_hits(
        minhash_lsh_candidates(
            planted,
            "doc_id",
            "text",
            max_pairs_per_bucket=None,
            pair_cap_factor=None,
        )
    )
    return {
        "group_size_g": g,
        "n_planted_pairs": n_planted,
        "pair_emitted_capped": round(emitted / n_planted, 4),
        "pair_emitted_uncapped": round(emitted_uncapped / n_planted, 4),
        "emission_recall": (
            round(emitted / emitted_uncapped, 4) if emitted_uncapped else None
        ),
        "wall_sec": round(time.monotonic() - t0, 3),
    }


def _pair_emission_section(spark, sf_dir: str) -> dict:
    """planted_text_pair_emission + its in-artifact adjudication."""
    lane = planted_text_pair_emission(spark, sf_dir)
    print(f"# planted_text_pair_emission: {lane}", file=sys.stderr)
    for g in (500, 1000):
        mg = planted_text_pair_emission_megagroup(spark, sf_dir, g)
        lane[f"kept_band_g{g}"] = mg
        print(f"# planted_text_pair_emission g={g}: {mg}", file=sys.stderr)
    return {
        **lane,
        "adjudication": (
            "the text analog of EMB_DEFAULT_SCALING's pair_emitted_95 — "
            "the PAIR-level metric that discriminates emission "
            "strategies (unlike group-connectivity, which is hub-robust "
            "— see planted_text_recall_100x's correction). "
            "emission_recall divides the capped run by the uncapped "
            "control, cancelling banding probability: it is exactly the "
            "fraction of co-bucketing planted pairs the hub-anchored "
            "chain keeps under the binding default cap. The retired "
            "star's per-bucket analytic bound for the same pairs is "
            "star_analytic_bound_per_bucket = 2/(g+2) (one of the two "
            "variants must BE the hub). kept_band_g500/g1000 repeat the "
            "capped/uncapped pair at the TOP of the kept band, where "
            "ever more identical replicas sit between the variants in a "
            "bucket's locality order. Reading: g=500 emission_recall "
            "1.0 — window-hit recall holds across the kept band (the "
            "variants sort at the identical-run's edges and meet within "
            "a window in some band). g=1000 reads 0/0 on BOTH runs: "
            "the group+variants bucket is 1002 members, past "
            "max_bucket_size — the uncapped 0 proves this is the skew "
            "GUARD, not cap emission (the variants cannot co-bucket "
            "without the replicas: their shared shingles are a subset "
            "of the base doc's, so any band they agree on, a replica "
            "agrees too) — the guard-edge orphaning the megagroup "
            "section documents, seen at pair level."
        ),
    }


def planted_emb_megagroup(
    spark, emb_sf: str, g: int, n_groups: int = 20, dedup_first: bool = False
) -> dict:
    """Embedding-side analog of planted_text_recall_megagroup: the
    hyperplane funnel's skew guard (similarity.py — a DISTINCT code
    path from the text guard) drops buckets over max_bucket_size, so a
    g > 1000 identical-vector group emits no pairs and its planted
    near-identical partner (one perturbed component, cosine ≈ 0.999 —
    it lands INSIDE the mega bucket, identical signature w.h.p.) is
    funnel-orphaned; exact-collapse by vector value first
    (``dedup_first=True``) shrinks the group under the guard and
    restores connectivity."""
    from etl4s_spark.operators.similarity import embedding_neardup_lsh

    base = spark.read.parquet(f"{emb_sf}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    unit = base.agg(F.max("vec_id")).first()[0] + 1
    n_vecs = base.count()
    stride = max(n_vecs // n_groups, 1)
    picks = base.filter(F.col("vec_id") % stride == 1).limit(n_groups)
    replicas = picks.select(
        F.col("vec_id"),
        F.col("embedding"),
        F.explode(F.sequence(F.lit(1), F.lit(g - 1))).alias("r"),
    ).select((F.col("vec_id") + F.col("r") * unit).alias("vec_id"), "embedding")
    p_base = (g + 2) * unit
    partners = picks.select(
        (F.col("vec_id") + p_base).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(i == 0, x * F.lit(1.05) + F.lit(0.01)).otherwise(x),
        ).alias("embedding"),
    )
    planted = (
        base.unionByName(replicas).unionByName(partners).localCheckpoint(eager=True)
    )
    n_partners = partners.count()

    def connected(pairs_df) -> int:
        p = pairs_df.select("id_a", "id_b")
        return (
            p.filter((F.col("id_b") >= p_base) & (F.col("id_a") < p_base))
            .filter((F.col("id_a") % unit) == (F.col("id_b") - p_base))
            .select(F.col("id_b").alias("pid"))
            .distinct()
            .count()
        )

    t0 = time.monotonic()
    inp = planted
    if dedup_first:
        inp = planted.groupBy("embedding").agg(F.min("vec_id").alias("vec_id"))
    cands = embedding_neardup_lsh(inp, "vec_id", "embedding", dim=64, threshold=0.9)
    cand = connected(cands)
    cand_pairs = cands.count()
    return {
        "group_size_g": g,
        "n_groups": n_groups,
        "n_partners": n_partners,
        "dedup_first": dedup_first,
        "bucket_guard": (
            "kept (post-collapse buckets under max_bucket_size=1000)"
            if dedup_first
            else "dropped (identical-signature mega bucket > 1000)"
        ),
        "candidate_connected": round(cand / n_partners, 4),
        "candidate_pairs_total": cand_pairs,
        "wall_sec": round(time.monotonic() - t0, 3),
    }


def _megagroup_section(spark, sf_dir: str, emb_sf: str) -> dict:
    """The shipped default's mega-group posture, measured on both sides
    of the max_bucket_size boundary plus the designed exact-dedup-first
    composition — on BOTH funnels (the guards are distinct code
    paths); shared by the full run and --megagroup-only merge."""
    out: dict[str, dict | str] = {}
    for key, g, df_first in (
        ("g500_kept", 500, False),
        ("g2000_dropped", 2_000, False),
        ("g8000_dropped", 8_000, False),
        ("g8000_dedup_first", 8_000, True),
    ):
        lane = planted_text_recall_megagroup(spark, sf_dir, g, dedup_first=df_first)
        out[key] = lane
        print(f"# planted_megagroup {key}: {lane}", file=sys.stderr)
    for key, g, df_first in (
        ("emb_g2000_dropped", 2_000, False),
        ("emb_g2000_dedup_first", 2_000, True),
    ):
        lane = planted_emb_megagroup(spark, emb_sf, g, dedup_first=df_first)
        out[key] = lane
        print(f"# planted_megagroup {key}: {lane}", file=sys.stderr)
    out["adjudication"] = (
        "the shipped default's posture for boilerplate mega-groups, "
        "measured rather than argued. KEPT band (g <= max_bucket_size = "
        "1000): the pair cap keeps chain c=8 at every kept bucket "
        "(least(10k, 8g)//g = 8), so a near-threshold partner connects "
        "at ~the banding-probability ceiling (g500_kept; the c=1 floor "
        "of pair_emission.py is UNREACHABLE under defaults). DROPPED "
        "band (g > 1000): the funnels' skew guard drops the bucket "
        "WHOLESALE before emission — candidate_connected 0.0 at "
        "g2000/g8000 is the guard working as designed (bounding any "
        "task's bucket at 1000 members), NOT a cap-emission recall "
        "property; the cost is that a near-dup partner of an "
        "UNCOLLAPSED mega-group is funnel-orphaned. The designed "
        "composition for that regime is exact-dedup FIRST (the engine's "
        "standard pipeline order: q_dedup_exact collapses identical "
        "replicas, shrinking the group's buckets back under the guard) "
        "— g8000_dedup_first measures that composition end-to-end and "
        "restores partner connectivity to the kept-band level. "
        "Raising max_bucket_size is the explicit knob when mega-buckets "
        "of DISTINCT texts must pair directly. The emb_* lanes repeat "
        "the drop/restore pair on the EMBEDDING funnel (its guard is a "
        "distinct code path in similarity.py): an identical-vector "
        "mega-group swallows its near-identical partner into the "
        "dropped bucket (connectivity 0), and exact-collapse by vector "
        "value restores it — same posture, both funnels, measured."
    )
    return out


def _trunc_stats(df) -> dict:
    agg = df.agg(
        F.count(F.lit(1)).alias("pairs"),
        F.sum((F.col("truncated") > 0).cast("long")).alias("flagged"),
        F.max("truncated").alias("tmax"),
    ).first()
    return {
        "pairs": int(agg["pairs"]),
        "pairs_with_truncation": int(agg["flagged"] or 0),
        "truncated_max": int(agg["tmax"] or 0),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--emb-sf",
        default="/root/testdata/sf0.01",
        help="embedding lanes replicate a smaller base: the uncapped "
        "baseline is output-bound quadratic by design",
    )
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument(
        "--megagroup-only",
        action="store_true",
        help="run ONLY the mega-group recall lanes and MERGE the "
        "planted_text_recall_megagroup key into the existing -o artifact "
        "(a full probe re-run would discard the other sections' walls)",
    )
    args = ap.parse_args()

    from etl4s_spark.operators.dedup import minhash_lsh_candidates
    from etl4s_spark.operators.similarity import embedding_neardup_lsh
    from etl4s_spark.session import get_spark

    spark = get_spark("dedup_cap_probe")
    spark.sparkContext.setLogLevel("ERROR")

    if args.megagroup_only:
        mega = _megagroup_section(spark, args.sf, args.emb_sf)
        pe = _pair_emission_section(spark, args.sf)
        with open(args.out) as f:
            doc = json.load(f)
        doc["planted_text_recall_megagroup"] = mega
        doc["planted_text_pair_emission_100x"] = pe
        with open(args.out, "w") as f:
            f.write(json.dumps(doc, indent=1, sort_keys=True))
        print(json.dumps({k: v for k, v in pe.items() if k != "adjudication"}))
        return

    # lane -> (max_pairs_per_bucket, pair_cap_factor)
    lanes = {
        "uncapped": (None, None),
        "abs_10k_only": (10_000, None),
        "default": (10_000, 8),
    }
    rows: dict[str, dict] = {lane: {} for lane in lanes}
    for k in (1, 10, 100):
        docs = replicated(spark, args.sf, "documents", "doc_id", "text", k)
        print(f"# text scale {k}x: {docs.count()} docs", file=sys.stderr)
        for lane, (cap, factor) in lanes.items():
            t0 = time.monotonic()
            stats = _trunc_stats(
                minhash_lsh_candidates(
                    docs,
                    "doc_id",
                    "text",
                    max_pairs_per_bucket=cap,
                    pair_cap_factor=factor,
                )
            )
            stats["wall_sec"] = round(time.monotonic() - t0, 3)
            rows[lane][f"{k}x"] = stats
            print(f"#   {lane} @ {k}x: {stats}", file=sys.stderr)

    # r10: the operator default flipped ON — least(10k, 64·g), binding
    # at g>129 (VERDICT r9 item 1). emb_default_capped64 is what ships;
    # emb_uncapped_optout is the explicit (None, None) opt-out baseline
    # whose decade-2 47x is WHY the default flipped; emb_capped_factor8
    # stays as the text-funnel-factor comparison lane (it would bind at
    # the test SFs' g=74 propose buckets — too aggressive for angular
    # regions, see embedding_neardup_lsh docstring).
    emb_lanes = {
        "emb_uncapped_optout": (None, None),
        "emb_capped_factor8": (None, 8),
        "emb_default_capped64": (10_000, 64),
    }
    emb_rows: dict[str, dict] = {lane: {} for lane in emb_lanes}
    for k in (1, 10, 100):
        vecs = replicated(spark, args.emb_sf, "embeddings", "vec_id", "embedding", k)
        print(f"# emb scale {k}x: {vecs.count()} vecs", file=sys.stderr)
        for lane, (cap, factor) in emb_lanes.items():
            t0 = time.monotonic()
            stats = _trunc_stats(
                embedding_neardup_lsh(
                    vecs,
                    "vec_id",
                    "embedding",
                    dim=64,
                    threshold=0.99,
                    max_pairs_per_bucket=cap,
                    pair_cap_factor=factor,
                )
            )
            stats["wall_sec"] = round(time.monotonic() - t0, 3)
            emb_rows[lane][f"{k}x"] = stats
            print(f"#   {lane} @ {k}x: {stats}", file=sys.stderr)

    # semdedup lanes (r9 wide-probe finding: q_dedup_semdedup read
    # 27x/decade at 10x — the within-cell pair stage is O(n²/k) at fixed
    # k even though the OUTPUT is linear, so the old "nothing to cap"
    # adjudication was a claim about emission, not wall). Two lanes over
    # the same replicated embeddings: the retired fixed default (k=8,
    # quadratic wall) and the new auto default (k = ceil(sqrt(n)),
    # O(n^1.5) wall — the flat-quantizer optimum; strict linearity needs
    # the hyperplane-LSH route measured above).
    from etl4s_spark.operators.similarity import semdedup

    sem_lanes = {"semdedup_fixed_k8": 8, "semdedup_auto_sqrtk": None}
    sem_rows: dict[str, dict] = {lane: {} for lane in sem_lanes}
    for k in (1, 10, 100):
        vecs = replicated(spark, args.emb_sf, "embeddings", "vec_id", "embedding", k)
        n = vecs.count()
        print(f"# semdedup scale {k}x: {n} vecs", file=sys.stderr)
        for lane, n_clusters in sem_lanes.items():
            t0 = time.monotonic()
            agg = (
                semdedup(
                    vecs, "vec_id", "embedding",
                    n_clusters=n_clusters, threshold=0.99,
                )
                .agg(
                    F.count(F.lit(1)).alias("rows"),
                    F.sum((~F.col("keep")).cast("long")).alias("dropped"),
                )
                .first()
            )
            stats = {
                "rows": int(agg["rows"]),
                "dropped": int(agg["dropped"] or 0),
                "wall_sec": round(time.monotonic() - t0, 3),
            }
            sem_rows[lane][f"{k}x"] = stats
            print(f"#   {lane} @ {k}x: {stats}", file=sys.stderr)

    for r in list(rows.values()) + list(emb_rows.values()) + list(sem_rows.values()):
        t1, t10, t100 = (r[s]["wall_sec"] for s in ("1x", "10x", "100x"))
        r["decade1_ratio"] = round(t10 / t1, 2) if t1 > 0 else None
        r["decade2_ratio"] = round(t100 / t10, 2) if t10 > 0 else None

    # r11: planted near-threshold TEXT partners at the binding (100x)
    # composition — the text analog of EMB_DEFAULT_SCALING's
    # pair_emitted_95 (see planted_text_recall docstring)
    planted = planted_text_recall(spark, args.sf, k=100)
    print(f"# planted_text_recall @ 100x: {planted}", file=sys.stderr)
    mega = _megagroup_section(spark, args.sf, args.emb_sf)
    pe = _pair_emission_section(spark, args.sf)

    doc = {
        "sf_base": args.sf,
        "emb_sf_base": args.emb_sf,
        "scales": [1, 10, 100],
        "note": "text: three cap lanes over k x-replicated documents; the "
        "effective cap least(abs, factor*g) binds when a bucket's g(g-1)/2 "
        "exceeds it (g ~= k copies per doc). Since r11 a capped bucket "
        "emits the hub-anchored locality chain (pair_emission.py): the "
        "budget c*g - c(c+1)/2 <= cap is SPENT, not the star's g-1, so "
        "capped-lane pair counts sit at the size-relative budget "
        "(factor*g per bucket, linear in n) instead of sub-linear hub "
        "stars — compare pairs vs the uncapped quadratic baseline. A "
        "bound lane must show "
        "pairs_with_truncation > 0, pairs at ~the budget, decade-2 wall <= 10; "
        "the uncapped lane is the output-bound quadratic baseline the "
        "r7/r8 SCALING_100X adjudications describe. abs_10k_only is the "
        "retired r8 default, kept to show WHY it was retired (it never "
        "binds at g~=100). Embedding (r10): the SHIPPED default is "
        "emb_default_capped64 — least(10k, 64*g), binding at g>129, above "
        "every test-SF propose bucket (max g=74) so oracle rows stay "
        "exhaustive; emb_uncapped_optout is the explicit (None, None) "
        "opt-out whose decade-2 blow-up is why the default flipped "
        "(VERDICT r9 item 1); emb_capped_factor8 shows the text funnel's "
        "factor would bind on ordinary angular-region buckets — too "
        "aggressive for a propose tier. semdedup lanes: see "
        "semdedup_adjudication. truncated_* fields are audit "
        "signals (max per-bucket drop / flagged-pair count), not "
        "dropped-pair totals (ADVICE r8).",
        "lanes": rows,
        "embedding_lanes": emb_rows,
        "semdedup_lanes": sem_rows,
        "planted_text_recall_100x": {
            **planted,
            "adjudication": "end-to-end text-funnel connectivity under a "
            "BINDING cap: near-threshold partners (3-gram Jaccard "
            "~0.55-0.75 — every-12th-word markers, NOT copies) planted "
            "next to g=100 dup groups whose buckets overflow the default "
            "least(10k, 8g) cap. candidate_connected is the propose-stage "
            "component signal (ceiling = banding probability); "
            "verified_connected is what a PAIRWISE funnel consumer sees. "
            "candidate == verified means every proposed partner survived "
            "capped emission + exact verification. CORRECTION of this "
            "lane's first r11 emission: group-connectivity is hub-robust "
            "(the retired star also emitted (hub, partner), hub a "
            "same-doc replica w.h.p.), so this lane does NOT A/B "
            "star-vs-chain — the chain's measured pair-level win is "
            "EMB_DEFAULT_SCALING's planted-PAIR lane (pair_emitted_95 "
            "0.209 star -> 0.8105 chain).",
        },
        "planted_text_recall_megagroup": mega,
        "planted_text_pair_emission_100x": pe,
        "semdedup_adjudication": "OUTPUT is linear (one (id, cell, keep) "
        "row per input), but the r9 wide probe showed WALL is O(n²/k) at "
        "a fixed k (q_dedup_semdedup: 27x/decade at k=8) — the old "
        "'nothing to cap' note conflated the two. The semdedup_lanes "
        "measure the retired fixed-k8 default (quadratic) against the r9 "
        "auto default k = ceil(sqrt(n)) (O(n^1.5), the flat-quantizer "
        "assignment-vs-pairs balance point). n^1.5 is the best a flat "
        "quantizer can do; strict-linear 100 TB dedup routes to "
        "embedding_neardup_lsh (emb lanes above). The oracle query "
        "q_dedup_semdedup stays pinned at k=8 first-8 centroids for "
        "cross-engine exactness — it is a correctness instrument, "
        "adjudicated in SCALING_100X.json.",
    }
    text = json.dumps(doc, indent=1, sort_keys=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        print(
            json.dumps(
                {
                    ln: r.get("decade2_ratio")
                    for ln, r in list(rows.items())
                    + list(emb_rows.items())
                    + list(sem_rows.items())
                }
            )
        )
    else:
        print(text)


if __name__ == "__main__":
    main()
