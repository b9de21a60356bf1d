"""Local replica of the driver's correctness gate.

Runs every registered query through Spark AND its DuckDB oracle on the
same parquet tables, then compares row count, schema shape, and
order-insensitive values (columns sorted by name — the driver's rule).

Usage:
    python tools/verify_local.py [--sf /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def normalize(rows: list[tuple]) -> list[tuple]:
    """Canonicalize values so Spark and DuckDB results compare equal."""
    import datetime
    import decimal

    def norm(v):
        if isinstance(v, decimal.Decimal):
            return float(v)
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # collapse -0.0 and last-ulp noise at 1e-9 relative scale
            return round(v, 9)
        if isinstance(v, datetime.datetime):
            return v.replace(tzinfo=None).isoformat(timespec="milliseconds")
        if isinstance(v, datetime.date):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        if isinstance(v, bytearray):
            return bytes(v)
        return v

    return sorted((tuple(norm(v) for v in r) for r in rows), key=repr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from etl4s_spark.session import get_spark

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or sorted(qs)

    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        if name not in qs:
            print(f"  {name}: NOT REGISTERED")
            n_fail += 1
            continue
        t0 = time.monotonic()
        try:
            sdf = qs[name](spark, args.sf)
            scols = sorted(sdf.columns)
            srows = [tuple(r[c] for c in scols) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {dt:.1f}s)")
            n_rows_only += 1
            continue
        try:
            rel = con.execute(oracles[name])
            dcols_raw = [d[0] for d in rel.description]
            drows_raw = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        order = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
        dcols = [dcols_raw[i] for i in order]
        drows = [tuple(r[i] for i in order) for r in drows_raw]

        problems = []
        if scols != dcols:
            problems.append(f"columns differ: spark={scols} duck={dcols}")
        if len(srows) != len(drows):
            problems.append(f"rowcount differs: spark={len(srows)} duck={len(drows)}")
        if not problems:
            ns, nd = normalize(srows), normalize(drows)
            if ns != nd:
                diffs = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
                problems.append(f"values differ; first diffs: {diffs}")
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows, {dt:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
