"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (collect) once after a warm-up of the
Spark session; per-query wall time is measured around the action.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # The driver parses stdout as JSON (BENCH_r01 recorded parsed:null —
    # JVM/log4j noise had leaked onto fd 1). Point fd 1 at stderr for the
    # whole run — the JVM inherits the redirected fd — and restore it only
    # for the final JSON line.
    real_stdout = os.dup(1)
    os.dup2(2, 1)

    import __spark_entry__ as entry_mod
    from etl4s_spark.session import get_spark

    spark = get_spark("bench")
    qs = entry_mod.queries()

    # Warm up the JVM + parquet footer caches with a trivial action.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in sorted(qs):
        t0 = time.monotonic()
        try:
            df = qs[name](spark, sf_dir)
            if hasattr(df, "count"):
                df.count()
            timings[name] = round(time.monotonic() - t0, 3)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"# bench error {name}: {type(e).__name__}: {e}", file=sys.stderr)

    ok = [t for t in timings.values() if t >= 0]
    total = round(sum(ok), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    line = json.dumps(
        {
            "metric": "declared_queries_total_wall",
            "value": total,
            "unit": "sec",
            # the declared surface grows per round — normalize for
            # cross-round comparison against BASELINE.md (r1: 79 queries)
            "n_queries": len(ok),
            "mean_sec_per_query": round(total / len(ok), 4) if ok else -1.0,
            "queries": timings,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        }
    )
    sys.stdout.flush()
    sys.stderr.flush()
    os.dup2(real_stdout, 1)
    os.write(1, (line + "\n").encode())


if __name__ == "__main__":
    main()
