"""Two-decade scale-up probe (VERDICT r6 item 2): the 10× probe
(tools/scaling_probe.py → SCALING.json) answers "survives 10×"; the
brief's bar is 100×. This probe times the TOP-HEAVIEST uncapped queries
at 1×, 10×, AND 100× replicated data IN ONE PROCESS (same box state, so
decade ratios are internally consistent) and reports the PER-DECADE
growth:

    decade1 = t(10x) / t(1x)        decade2 = t(100x) / t(10x)

Reading it: a linear query shows ≲10 per decade (usually much less
locally, where constant overheads dominate at 1×); decade2 >> 10 flags
superlinear work that the 10× probe was too small to expose (quadratic
pair growth, rank buckets collapsing, state that scales with corpus).
decade2 is the honest one — at 100× the job is compute-bound, not
overhead-bound.

The query list is the 20 heaviest by 10×-scaled wall from SCALING.json
plus the round-6 watch items (q_sample_quality_decile 3.67×,
q_pack_sequences / q_dedup_substring 2.58×). Replication reuses
scaling_probe.build_scaled (key-shifted facts, fixed dims — referential
integrity preserved).

Usage:
    python tools/scaling_probe_100x.py [--sf /root/testdata/sf0.1]
        [-o SCALING_100X.json]   # ~30-45 min, run ALONE (timing-sensitive)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_probe import build_scaled, time_queries  # noqa: E402

PROBE_QUERIES = [
    # 20 heaviest by scaled_sec in SCALING.json (r6, k=10)
    "q_dedup_substring",
    "q_sample_bootstrap_se",
    "q_market_basket",
    "q_histogram_equidepth",
    "q_sample_quality_decile",
    "q_agg_median_exact",
    "q_rfm_segmentation",
    "q_anomaly_mad",
    "q_agg_weighted_median",
    "q_user_stickiness",
    "q_growth_accounting",
    "q_stat_spearman",
    "q_agg_moments",
    "q_lorenz_curve",
    "q_grouped_regression",
    "q_feature_woe",
    "q_abc_classification",
    "q_gini_concentration",
    "q_join_inner_hash",
    "q_corr_matrix",
    # round-6 watch items not already above
    "q_pack_sequences",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument(
        "--reuse",
        action="store_true",
        help="skip rebuilding a scaled copy whose dir already has every table "
        "(implies --keep; amortizes the build across probe batches)",
    )
    ap.add_argument(
        "--decades",
        type=int,
        default=2,
        choices=(2, 3),
        help="2 = 1x/10x/100x (default); 3 adds a 1000x copy (~17 GB at "
        "sf0.1 — events at 100M rows, lineitem at 600M) built by composing "
        "another 10x of the 100x dir",
    )
    ap.add_argument("names", nargs="*", help="override the probe list")
    args = ap.parse_args()

    from etl4s_spark.queries import QUERIES, load_all
    from etl4s_spark.session import get_spark
    from tools.scaling_probe import FIXED, SHIFT

    load_all()
    spark = get_spark("scaling_100x")
    names = args.names or PROBE_QUERIES

    scales = [1] + [10**i for i in range(1, args.decades + 1)]
    all_tables = list(SHIFT) + FIXED
    dirs = {1: args.sf}
    for k in scales[1:]:
        dst = f"/tmp/etl4s_scaling100_k{k}"
        # provenance manifest (ADVICE r9): --reuse must not silently
        # accept a stale dir built from a DIFFERENT --sf base or
        # composition chain — that would skew committed probe evidence.
        manifest_path = f"{dst}/_etl4s_manifest.json"
        manifest = {"base_sf": os.path.abspath(args.sf), "scale_k": k}
        have_all = all(
            os.path.exists(f"{dst}/{t}.parquet/_SUCCESS") for t in all_tables
        )
        have_provenance = False
        if have_all and os.path.exists(manifest_path):
            try:
                with open(manifest_path) as f:
                    have_provenance = json.load(f) == manifest
            except (OSError, ValueError):
                have_provenance = False
        if args.reuse and have_all and have_provenance:
            print(f"# reusing existing {k}x copy at {dst}", file=sys.stderr)
        else:
            if args.reuse and have_all:
                print(
                    f"# NOT reusing {dst}: manifest missing or built from a "
                    f"different base — rebuilding",
                    file=sys.stderr,
                )
            # compose from the previous decade's dir (10 unions of 10x is
            # the same replication as 100 unions of 1x, with a shallower
            # plan) — key shifts recompute from the source dir's maxes, so
            # referential integrity is preserved through composition
            src = dirs[k // 10]
            print(f"# building {k}x copy at {dst} (10x of {src})", file=sys.stderr)
            shutil.rmtree(dst, ignore_errors=True)
            build_scaled(spark, src, dst, 10)
            with open(manifest_path, "w") as f:
                json.dump(manifest, f)
        dirs[k] = dst

    try:
        times = {}
        for k in scales:
            print(f"# timing {len(names)} queries at {k}x", file=sys.stderr)
            times[k] = time_queries(spark, QUERIES, names, dirs[k])
    finally:
        if not (args.keep or args.reuse):
            for k in scales[1:]:
                shutil.rmtree(dirs[k], ignore_errors=True)

    rows = {}
    for n in names:
        r = {f"t_{k}x_sec": times[k][n] for k in scales}
        for i in range(1, len(scales)):
            lo, hi = times[scales[i - 1]][n], times[scales[i]][n]
            r[f"decade{i}_ratio"] = round(hi / lo, 2) if lo > 0 else None
        rows[n] = r
    d2 = sorted(v["decade2_ratio"] for v in rows.values() if v.get("decade2_ratio"))
    doc = {
        "sf_base": args.sf,
        "scales": scales,
        "note": "decadeN_ratio = wall growth per 10x data decade (best-of-2, "
        "noop-write full plan); <=10 per decade is linear-or-better, "
        ">10 on decade2 flags superlinear work the 10x probe missed",
        # guard: every query sub-resolution at 10x leaves d2 empty — the
        # per-query rows must still be written (ADVICE r7)
        "median_decade2": d2[len(d2) // 2] if d2 else None,
        "max_decade2": d2[-1] if d2 else None,
        "superlinear_decade2": sorted(
            n for n, v in rows.items() if (v.get("decade2_ratio") or 0) > 10
        ),
        "queries": rows,
    }
    if args.decades >= 3:
        d3 = sorted(
            v["decade3_ratio"] for v in rows.values() if v.get("decade3_ratio")
        )
        doc["median_decade3"] = d3[len(d3) // 2] if d3 else None
        doc["max_decade3"] = d3[-1] if d3 else None
        doc["superlinear_decade3"] = sorted(
            n for n, v in rows.items() if (v.get("decade3_ratio") or 0) > 10
        )
    text = json.dumps(doc, indent=1, sort_keys=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        summary_keys = ["median_decade2", "max_decade2", "superlinear_decade2"]
        if args.decades >= 3:
            # ADVICE r9: the decade-3 headline keys were written to the
            # file but omitted from the console line batch logs capture
            summary_keys += [
                "median_decade3",
                "max_decade3",
                "superlinear_decade3",
            ]
        print(json.dumps({k: doc[k] for k in summary_keys}))
    else:
        print(text)


if __name__ == "__main__":
    main()
