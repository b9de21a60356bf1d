"""Cross-round bench comparison under the BASELINE.md rules.

Compares two BENCH_DETAIL files per-query using the sum of WARM MEDIANS
over the INTERSECTION of queries with non-error medians in BOTH files —
the rule ADVICE r3 forced after error sentinels (-1.0) summed into a
total inverted a conclusion, and VERDICT r4 re-applied after machine
contention inflated absolute numbers.

Also reports per-query ratio outliers (>2x either way) so "regression
vs data-drift vs contention" is decidable from artifacts: a broad
uniform inflation across unrelated queries is contention; a single
query moving alone is code or data.

Two gate rules encoded here (VERDICT r6 item 7 + ADVICE r6):

- MEASUREMENT-VERSION GUARD: BENCH_DETAIL files carry
  ``schema_version`` (2 = noop-write full-plan execution, r6+; absent =
  count()-based, r<=5, partially pruned by Catalyst). Comparing across
  versions is meaningless — the tool REFUSES unless --allow-mixed.

- SUB-SECOND NOISE RULE: a 2x-gate breach where EITHER median is below
  ``--noise-floor`` seconds (default 0.5) is NOT a confirmed regression
  — the warm-JVM run spread on this box is +-0.3-0.9 s, which alone
  produces 1.5-2x ratios on sub-second queries (r6 false alarms:
  q_scalar_variant 0.24->0.37, q_bpe_pair_counts 0.30->0.46). Such
  breaches are bucketed separately as ``needs_idle_remeasure`` and only
  count as regressions after an idle re-measure (re-run bench.py for
  just those queries on a quiet box) reproduces the ratio.
  VERDICT r7 closed a coverage hole in the original BOTH-medians form:
  contention can inflate a sub-second baseline median PAST the floor
  (q_text_quality 0.30->1.71 s at loadavg 6.3; idle re-measure 0.33 s),
  escaping the bucket exactly when it matters.

- LOADAVG CONTENTION RULE (VERDICT r7 item 3): when either file records
  ``loadavg_1min_at_run_start`` above ``--loadavg-threshold`` (default
  2.0), ALL 2x breaches route to ``needs_idle_remeasure`` regardless of
  median size — a loaded box cannot confirm a regression at any
  magnitude (the r7 bench ran at loadavg 5.9-6.7 and produced three
  false alarms, all idle-re-measured back to baseline).

Usage:
    python tools/bench_compare.py OLD_DETAIL.json NEW_DETAIL.json \
        [--outlier 2.0] [--noise-floor 0.5] [--loadavg-threshold 2.0] \
        [--allow-mixed]
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def medians(d: dict) -> dict[str, float]:
    m = d.get("medians", d.get("queries", {}))
    return {
        k: float(v)
        for k, v in m.items()
        if isinstance(v, (int, float)) and float(v) >= 0
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--outlier", type=float, default=2.0)
    ap.add_argument(
        "--noise-floor",
        type=float,
        default=0.5,
        help="both-medians-below-this 2x breaches are flagged for idle "
        "re-measure instead of counted as regressions",
    )
    ap.add_argument(
        "--loadavg-threshold",
        type=float,
        default=2.0,
        help="if either file's loadavg_1min_at_run_start exceeds this, "
        "ALL 2x breaches route to idle re-measure (contended run)",
    )
    ap.add_argument(
        "--allow-mixed",
        action="store_true",
        help="compare across measurement schema versions anyway "
        "(count()-era vs noop-write-era medians — normally refused)",
    )
    args = ap.parse_args()
    dold, dnew = load(args.old), load(args.new)
    vold = dold.get("schema_version", 1)
    vnew = dnew.get("schema_version", 1)
    if vold != vnew and not args.allow_mixed:
        print(
            json.dumps(
                {
                    "error": "mixed_measurement_versions",
                    "old_schema_version": vold,
                    "new_schema_version": vnew,
                    "detail": "v1=count()-based (Catalyst-pruned, r<=5), "
                    "v2=noop-write full plan (r6+); medians are not "
                    "comparable. Pass --allow-mixed to override.",
                },
                indent=1,
            )
        )
        sys.exit(2)
    old, new = medians(dold), medians(dnew)
    common = sorted(set(old) & set(new))
    so, sn = sum(old[k] for k in common), sum(new[k] for k in common)
    out = {
        "old_schema_version": vold,
        "new_schema_version": vnew,
        "n_old": len(old),
        "n_new": len(new),
        "n_common_nonerror": len(common),
        "sum_old_sec": round(so, 2),
        "sum_new_sec": round(sn, 2),
        "ratio_new_over_old": round(sn / so, 3) if so else None,
    }
    slower = sorted(
        (
            (round(new[k] / old[k], 2), k, old[k], new[k])
            for k in common
            if old[k] > 0.05 and new[k] / old[k] > args.outlier
        ),
        reverse=True,
    )
    faster = sorted(
        (round(old[k] / new[k], 2), k, old[k], new[k])
        for k in common
        if new[k] > 0.05 and old[k] / new[k] > args.outlier
    )
    # sub-second noise rule: a breach where EITHER median sits under the
    # noise floor cannot be distinguished from run spread (contention can
    # push the inflated side PAST the floor — VERDICT r7). Loadavg rule:
    # a breach whose query ran at loadavg above the threshold (in either
    # file; per-query lists, max over runs) routes to idle re-measure at
    # ANY magnitude — a loaded box cannot confirm a regression.
    def per_query_load(d: dict) -> dict[str, float]:
        la = d.get("loadavg_1min_at_run_start")
        if isinstance(la, (int, float)):  # file-level scalar (older files)
            return {"__file__": float(la)}
        if isinstance(la, dict):
            return {
                k: max(v) if isinstance(v, list) and v else float(v)
                for k, v in la.items()
                if isinstance(v, (int, float, list)) and v
            }
        return {}

    lold, lnew = per_query_load(dold), per_query_load(dnew)
    file_old = lold.get("__file__", max(lold.values(), default=None))
    file_new = lnew.get("__file__", max(lnew.values(), default=None))
    out["loadavg_max_old"] = round(file_old, 2) if file_old is not None else None
    out["loadavg_max_new"] = round(file_new, 2) if file_new is not None else None

    def query_load(k: str) -> float:
        # fallback for a query missing from a per-query dict is the FILE
        # level max (per-query dicts never contain "__file__" — ADVICE
        # r8: a 0.0 fallback let unrecorded queries dodge the
        # contention re-measure routing)
        return max(
            lold.get(k, lold.get("__file__", file_old or 0.0)),
            lnew.get(k, lnew.get("__file__", file_new or 0.0)),
        )

    def needs_remeasure(x):
        return (
            x[2] < args.noise_floor
            or x[3] < args.noise_floor
            or query_load(x[1]) > args.loadavg_threshold
        )

    confirmed = [x for x in slower if not needs_remeasure(x)]
    remeasure = [x for x in slower if needs_remeasure(x)]
    out["slower_than_%sx" % args.outlier] = [
        {"query": k, "old": o, "new": n, "x": r} for r, k, o, n in confirmed
    ]
    out["needs_idle_remeasure"] = [
        {
            "query": k,
            "old": o,
            "new": n,
            "x": r,
            "loadavg": round(query_load(k), 2),
        }
        for r, k, o, n in remeasure
    ]
    out["faster_than_%sx" % args.outlier] = [
        {"query": k, "old": o, "new": n, "x": r} for r, k, o, n in faster[::-1]
    ]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
