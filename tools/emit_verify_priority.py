"""Emit VERIFY_PRIORITY.json — the exact order in which the driver should
prove queries, as produced by etl4s_spark.queries.load_all()'s rotation
(VERDICT r5 item 1c: "if the driver honors registration order strictly,
also emit a VERIFY_PRIORITY list the driver can consume").

The file records, per name: its position, whether it has ever had a
non-vacuous driver CORRECTNESS row, the round it was last proven, and the
round it was first registered — so the window's composition is auditable
without re-running the rotation.

Usage:  python tools/emit_verify_priority.py
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    from etl4s_spark import queries

    queries.load_all()
    last = queries._driver_last_proven()
    age = queries._registration_age()
    out = [
        {
            "pos": i,
            "name": n,
            "proven_round": last.get(n, 0),
            "registered_round": age.get(n, 999),
            "has_oracle": n in queries.ORACLES,
        }
        for i, n in enumerate(queries.QUERIES)
    ]
    never = sum(1 for r in out if r["proven_round"] == 0)
    payload = {
        "total": len(out),
        "never_proven": never,
        "order": out,
    }
    path = os.path.join(ROOT, "VERIFY_PRIORITY.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {path}: {len(out)} queries, {never} never-proven")
    print("first 12:", [r["name"] for r in out[:12]])


if __name__ == "__main__":
    main()
