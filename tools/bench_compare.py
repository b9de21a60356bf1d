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

Usage:
    python tools/bench_compare.py OLD_DETAIL.json NEW_DETAIL.json [--outlier 2.0]
"""

from __future__ import annotations

import argparse
import json


def medians(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
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
    args = ap.parse_args()
    old, new = medians(args.old), medians(args.new)
    common = sorted(set(old) & set(new))
    so, sn = sum(old[k] for k in common), sum(new[k] for k in common)
    out = {
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
    out["slower_than_%sx" % args.outlier] = [
        {"query": k, "old": o, "new": n, "x": r} for r, k, o, n in slower
    ]
    out["faster_than_%sx" % args.outlier] = [
        {"query": k, "old": o, "new": n, "x": r} for r, k, o, n in faster[::-1]
    ]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
