"""Dump .explain("formatted") for the named queries into plans/r13/.

Usage:
    python tools/dump_plans.py [--sf DIR] [--suffix before|after] q_a q_b ...
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--outdir", default=os.path.join(REPO, "plans", "r13"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from etl4s_spark.session import get_spark

    spark = get_spark("dump_plans")
    qs = entry_mod.queries()
    os.makedirs(args.outdir, exist_ok=True)
    for q in args.queries:
        df = qs[q](spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.outdir, f"{q}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
