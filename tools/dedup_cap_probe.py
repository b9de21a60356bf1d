"""Pair-cap engagement probe (VERDICT r7 item 2 Done criterion): show
that the CAPPED MinHash-LSH path is bounded per decade once the cap
binds, on the same duplicate-heavy replication the 100x probe uses.

Why the general probe can't show this: table replication at 100x sf0.1
gives every document ~100 identical copies, i.e. LSH buckets of ~100
members = 4,950 combination pairs — UNDER the 10k production default,
so the default-capped query legitimately emits the full (quadratically
growing) true pair set and its decade ratio stays output-bound
(SCALING_100X r8: minhash 14.4, funnel 33.0 on decade 2). The cap is a
guardrail for mega-clusters (boilerplate), not a rewrite of correct
output. This probe therefore times THREE lanes per scale k in
{1, 10, 100} on in-memory k x-replicated documents:

  uncapped   max_pairs_per_bucket=None   — the quadratic baseline
  default    max_pairs_per_bucket=10k    — binds only past ~142 copies
  tight      max_pairs_per_bucket=1000   — binds at >=46 copies, i.e.
                                           AT the probe's 100x point

and records wall, emitted pairs, and the truncated-audit sum. Expected
shape (asserted by the judge from the artifact): the tight lane's 100x
pair count collapses to ~linear (star emission) with truncated > 0,
and its decade-2 wall ratio lands <= 10 while the uncapped lane's
output (and wall) keeps growing quadratically.

Usage:
    python tools/dedup_cap_probe.py [--sf /root/testdata/sf0.1]
        [-o DEDUP_CAP_PROBE.json]    # ~5-10 min, run ALONE
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def replicated_docs(spark, sf_dir: str, k: int):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    unit = base.agg(F.max("doc_id")).first()[0] + 1
    out = None
    for i in range(k):
        part = base.select((F.col("doc_id") + i * unit).alias("doc_id"), "text")
        out = part if out is None else out.unionByName(part)
    return out.localCheckpoint(eager=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("-o", "--out", default=None)
    args = ap.parse_args()

    from etl4s_spark.operators.dedup import minhash_lsh_candidates
    from etl4s_spark.session import get_spark

    spark = get_spark("dedup_cap_probe")
    spark.sparkContext.setLogLevel("ERROR")

    lanes = {"uncapped": None, "default_10k": 10_000, "tight_1k": 1_000}
    rows: dict[str, dict] = {lane: {} for lane in lanes}
    for k in (1, 10, 100):
        docs = replicated_docs(spark, args.sf, k)
        print(f"# scale {k}x: {docs.count()} docs", file=sys.stderr)
        for lane, cap in lanes.items():
            t0 = time.monotonic()
            agg = (
                minhash_lsh_candidates(
                    docs, "doc_id", "text", max_pairs_per_bucket=cap
                )
                .agg(
                    F.count(F.lit(1)).alias("pairs"),
                    F.sum("truncated").alias("truncated_sum"),
                )
                .first()
            )
            wall = round(time.monotonic() - t0, 3)
            rows[lane][f"{k}x"] = {
                "wall_sec": wall,
                "pairs": int(agg["pairs"]),
                "truncated_sum": int(agg["truncated_sum"] or 0),
            }
            print(f"#   {lane} @ {k}x: {wall}s, {agg['pairs']} pairs, "
                  f"truncated={agg['truncated_sum']}", file=sys.stderr)

    for lane, r in rows.items():
        t1, t10, t100 = (r[s]["wall_sec"] for s in ("1x", "10x", "100x"))
        r["decade1_ratio"] = round(t10 / t1, 2) if t1 > 0 else None
        r["decade2_ratio"] = round(t100 / t10, 2) if t10 > 0 else None

    doc = {
        "sf_base": args.sf,
        "scales": [1, 10, 100],
        "note": "three cap lanes over k x-replicated documents; the cap "
        "binds when a bucket's g(g-1)/2 exceeds it (g ~= k copies per "
        "doc). A bound lane must show truncated_sum > 0, ~linear pairs, "
        "and decade-2 wall <= 10; the uncapped lane is the output-bound "
        "quadratic baseline the r7/r8 SCALING_100X adjudications "
        "describe.",
        "lanes": rows,
    }
    text = json.dumps(doc, indent=1, sort_keys=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        print(json.dumps({ln: r.get("decade2_ratio") for ln, r in rows.items()}))
    else:
        print(text)


if __name__ == "__main__":
    main()
