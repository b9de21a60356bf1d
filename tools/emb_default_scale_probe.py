"""Scale probe for embedding_neardup_lsh's SHIPPED DEFAULTS — the first
measurement where the r10 auto-plane sizing actually ENGAGES.

Every earlier lane (DEDUP_CAP_PROBE's embedding lanes at ≤50k vectors,
SCALING_100X's registry query with its pinned 6-plane config) ran below
the auto-sizing boundary (n = 256·2⁸ ≈ 65k), so auto planes always
resolved to the historical fixed 8. This probe replicates the sf0.1
embeddings to 1×/10×/100×/1000× (2k → 2M vectors; key-shifted copies,
so each original vector gains k signature-identical duplicates — the
dup-heavy regime that makes the PAIR CAP bind too) and runs the
operator with EVERY knob at its default:

  n_planes=None        → auto: 8 / 8 / 10 / 13 planes
  pair cap (10k, 64·g) → star-collapse on overflowing buckets — at
                         1000× this is what bounds the g=1000 dup
                         groups (size(ids) <= max_bucket_size KEEPS
                         exactly-1000 buckets; they star-collapse to
                         999 flagged hub pairs each)
  max_bucket_size=1000 → would drop only buckets STRICTLY larger —
                         none in these compositions; the probe records
                         pair counts so the binding mechanism is
                         visible, not assumed

Reading the output: decadeN_ratio ≤ 10 per decade is linear-or-better;
`n_planes_used` shows the auto-sizer's choice; `pairs` vs
`pairs_with_truncation` shows how much of the output the cap flagged.

Usage:
    python tools/emb_default_scale_probe.py [-o EMB_DEFAULT_SCALING.json]
        [--sf /root/testdata/sf0.1] [--decades 3]   # run ALONE
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--decades", type=int, default=3, choices=(2, 3))
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args()

    from etl4s_spark.operators.similarity import auto_planes, embedding_neardup_lsh
    from etl4s_spark.session import get_spark

    spark = get_spark("emb_default_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{args.sf}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    unit = base.agg(F.max("vec_id")).first()[0] + 1

    def replicated(k: int):
        # broadcast k-row range cross-join, not a k-way union — a
        # 1000-part union plan is its own bottleneck; this is one
        # constant-side nested loop with key-shifted ids
        reps = F.broadcast(spark.range(k).withColumnRenamed("id", "__rep"))
        return (
            base.crossJoin(reps)
            .select(
                (F.col("vec_id") + F.col("__rep") * unit).alias("vec_id"),
                "embedding",
            )
            .repartition(32)
            .localCheckpoint(eager=True)
        )

    scales = [10**i for i in range(args.decades + 1)]
    rows: dict[str, dict] = {}
    for k in scales:
        vecs = replicated(k)
        n = vecs.count()
        planes = auto_planes(n)
        t0 = time.monotonic()
        # same pairs/pairs_with_truncation/truncated_max triple as every
        # other cap probe — shared helper so the audit-column semantics
        # can't drift between probes (r10 review finding)
        from tools.dedup_cap_probe import _trunc_stats

        stats = _trunc_stats(
            embedding_neardup_lsh(
                vecs, "vec_id", "embedding", dim=64, threshold=0.99
            )
        )
        rows[f"{k}x"] = {
            "n_vectors": n,
            "n_planes_used": planes,
            **stats,
            "wall_sec": round(time.monotonic() - t0, 3),
        }
        print(f"# {k}x: {rows[f'{k}x']}", file=sys.stderr)

    for i in range(1, len(scales)):
        lo = rows[f"{scales[i - 1]}x"]["wall_sec"]
        hi = rows[f"{scales[i]}x"]["wall_sec"]
        rows[f"decade{i}_ratio"] = round(hi / lo, 2) if lo > 0 else None

    doc = {
        "sf_base": args.sf,
        "scales": scales,
        "note": "embedding_neardup_lsh with EVERY knob at its shipped r10 "
        "default over k x-replicated sf0.1 embeddings (each vector gains k "
        "signature-identical copies). n_planes_used records the auto-sizer's "
        "choice — the >=100x lanes are the first probes above the 65k "
        "auto-plane boundary. Measured binding mechanism at 1000x: each "
        "distinct vector's 1000 copies share one signature and, at 13 "
        "planes, rarely collide with anything else, so buckets are exactly "
        "the g=1000 dup groups — INSIDE max_bucket_size (the <= filter "
        "keeps them; only strictly-larger buckets drop), star-collapsed by "
        "the least(10k, 64g) cap to 999 flagged hub pairs per group: the "
        "cap, not the bucket-drop, bounds the dup-heavy regime "
        "(pairs_with_truncation counts the flagged survivors).",
        "lanes": rows,
    }
    text = json.dumps(doc, indent=1, sort_keys=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        print(json.dumps({k: rows.get(k) for k in ("decade1_ratio", "decade2_ratio", "decade3_ratio") if k in rows}))
    else:
        print(text)


if __name__ == "__main__":
    main()
