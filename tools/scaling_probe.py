"""Empirical scale-up probe: does each query's cost grow linearly?

Builds a K×-duplicated copy of an sf dir in /tmp (fact tables replicated
with SHIFTED keys so uniqueness/referential semantics survive; dims that
a real warehouse keeps bounded — part, supplier, nation, region — are
left fixed), then times a representative query set at both scales and
reports the wall-clock ratio per query.

Reading the ratio: a scan/agg/join query should scale ≲ K (sub-linear
when the output is bounded and partial aggregation absorbs the growth);
anything scaling ≳ K² has a hidden quadratic and fails the 100 TB test.
Queries whose work is bounded by construction (id-capped corpus slices,
constant-size outputs over fixed dims) are excluded — their flat ratio
would flatter the average without saying anything.

Usage:
    python tools/scaling_probe.py [--sf /root/testdata/sf0.1] [-k 10]
        [-o SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (table, {column: key domain}) — facts replicate K× with shifted keys.
# Columns sharing a DOMAIN (orders.o_custkey ↔ customer.c_custkey,
# orders.o_orderkey ↔ lineitem.l_orderkey) shift by one shared unit =
# max over the whole domain + 1 — per-table maxes desynchronize the
# replicas whenever the maxes differ (e.g. orderless customers) and
# silently break the referential integrity the probe promises.
SHIFT = {
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order"},
    "customer": {"c_custkey": "cust"},
}
FIXED = ["part", "supplier", "nation", "region"]

# uncapped queries spanning the operator families; each touches the FULL
# fact table(s), so K× data means K× input work
PROBE_QUERIES = [
    "q_agg_groupby",
    "q_join_inner_hash",
    "q_topk_per_group",
    "q_histogram_numeric",
    "q_corr_matrix",
    "q_regression_ols",
    "q_skew_profile",
    "q_rfm_segmentation",
    "q_revenue_pareto",
    "q_customer_ltv_cohort",
    "q_attribution_touch",
    "q_market_basket",
    "q_anomaly_zscore",
    "q_ts_cross_corr",
    "q_audit_benford",
    "q_audit_expectations",
    "q_dedup_exact",
    "q_text_quality",
    "q_sample_token_budget",
    "q_pack_sequences",
    "q_period_over_period",
    "q_agg_median_exact",
    "q_dedup_substring",
    "q_sketch_cms",
    "q_agg_bitmap_distinct",
    "q_window_rolling_distinct",
    "q_mixture_weights",
    # round-5 third wave (uncapped over their fact tables)
    "q_join_geo_radius",
    "q_geo_cell_density",
    "q_sample_weighted",
    "q_anomaly_mad",
    "q_ts_changepoint",
    "q_histogram_equidepth",
    "q_agg_weighted_median",
    "q_skyline_pareto",
    # round-5 fourth wave (uncapped over their fact tables)
    "q_stat_spearman",
    "q_stat_kendall",
    "q_agg_moments",
    "q_gini_concentration",
    "q_concentration_hhi",
    "q_returns_wilson",
    "q_grouped_regression",
    "q_user_stickiness",
    "q_cumulative_uniques",
    "q_growth_accounting",
    "q_delta_method_ratio",
    "q_sample_bootstrap_se",
    "q_jackknife_groups",
    "q_attribution_position",
    "q_attribution_time_decay",
    "q_funnel_windowed",
    "q_lorenz_curve",
    "q_psi_stability",
    # round-6: the full set of two-pass distributed-rank rewrites
    # (VERDICT r5 item 2) — their K× ratio is the direct evidence the
    # single-partition sort is gone (see also RANK_CROSSOVER.json)
    "q_feature_woe",
    "q_sample_quality_decile",
    "q_eval_calibration",
    "q_abc_classification",
]


def build_scaled(spark, src: str, dst: str, k: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dst, exist_ok=True)
    frames = {t: spark.read.parquet(f"{src}/{t}.parquet") for t in SHIFT}
    # one shift unit per key DOMAIN: max over every column in the domain
    units: dict[str, int] = {}
    for t, cols in SHIFT.items():
        for c, dom in cols.items():
            m = frames[t].agg(F.max(c)).first()[0]
            units[dom] = max(units.get(dom, 0), int(m) + 1)
    for t, cols in SHIFT.items():
        df = frames[t]
        shifted = None
        for i in range(k):
            part = df
            for c, dom in cols.items():
                part = part.withColumn(c, F.col(c) + F.lit(i * units[dom]))
            shifted = part if shifted is None else shifted.unionByName(part)
        shifted.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
    for t in FIXED:
        src_p = f"{src}/{t}.parquet"
        if os.path.exists(src_p):
            spark.read.parquet(src_p).write.mode("overwrite").parquet(
                f"{dst}/{t}.parquet"
            )


def time_queries(spark, qs, names, sf_dir: str, runs: int = 2) -> dict[str, float]:
    out = {}
    for name in names:
        best = None
        for _ in range(runs):
            t0 = time.monotonic()
            # noop sink materializes EVERY output column — .count() lets
            # Catalyst prune unreferenced aggregates/projections, timing
            # a reduced plan (verified: groupBy+sum under count() drops
            # the sum and the column read entirely)
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"#   {name}: {out[name]}s", file=sys.stderr)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument("--keep", action="store_true", help="keep the scaled dir")
    args = ap.parse_args()

    from etl4s_spark.queries import QUERIES, load_all
    from etl4s_spark.session import get_spark

    load_all()
    spark = get_spark()
    dst = f"/tmp/etl4s_scaling_k{args.k}"
    print(f"# building {args.k}x copy of {args.sf} at {dst}", file=sys.stderr)
    build_scaled(spark, args.sf, dst, args.k)
    try:
        base = time_queries(spark, QUERIES, PROBE_QUERIES, args.sf)
        scaled = time_queries(spark, QUERIES, PROBE_QUERIES, dst)
    finally:
        if not args.keep:
            shutil.rmtree(dst, ignore_errors=True)
    rows = {
        n: {
            "base_sec": base[n],
            "scaled_sec": scaled[n],
            "ratio": round(scaled[n] / base[n], 2) if base[n] > 0 else None,
        }
        for n in PROBE_QUERIES
    }
    ratios = sorted(v["ratio"] for v in rows.values() if v["ratio"])
    doc = {
        "k": args.k,
        "sf_base": args.sf,
        "note": "ratio = best-of-2 wall at Kx data / best-of-2 at 1x; "
        "<=K is linear-or-better, >>K flags a hidden quadratic",
        "median_ratio": ratios[len(ratios) // 2],
        "max_ratio": ratios[-1],
        "queries": rows,
    }
    text = json.dumps(doc, indent=1, sort_keys=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        print(json.dumps({k: doc[k] for k in ("k", "median_ratio", "max_ratio")}))
    else:
        print(text)


if __name__ == "__main__":
    main()
