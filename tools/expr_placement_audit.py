"""Expression-placement audit: find expensive per-row expressions that
Catalyst's CollapseProject has inlined ABOVE a join — i.e. into a
projection that evaluates once per JOINED row instead of once per input
row. That is the q_join_geo_nearest failure class (FIXTURES §C.6): the
md5/conv coordinate derivation collapsed into the post-broadcast-join
projection and ran |sites|x redundantly (14x wall at sf0.1).

Method: for every registered query, parse the `formatted` explain —
the numbered tree gives parent/child structure via indentation, the
details section gives each node's expressions. Flag every Project/
Filter node that (a) contains an expensive-function token and (b) has a
join ANYWHERE in its subtree (so the expression runs on the join's
output). Joins whose build side is a 1-row scalar attach (the repo's
broadcast-constant pattern) produce no fan-out, so hits are REVIEW
flags, not verdicts; the adjudication lives next to each entry in the
emitted JSON.

Usage: python tools/expr_placement_audit.py [-o OUT.json] [names...]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPENSIVE = (
    "conv(",
    "md5(",
    "sha2(",
    "levenshtein(",
    "regexp_extract",
    "regexp_replace",
    "rlike",
    "transform(",
    "aggregate(",
    "array_distinct(",
    "sentences(",
    "to_json(",
    "from_json(",
)

JOIN_TOKENS = ("Join", "CartesianProduct")


def parse_tree(plan: str):
    """Return (nodes, children): nodes = {id: (name, depth)}; children
    via indentation of the numbered tree section."""
    tree_sec = plan.split("\n\n")[0]
    entries = []  # (depth, id, name)
    for ln in tree_sec.splitlines():
        m = re.match(r"^([ :+\-*]*)(\w[\w ]*?) \((\d+)\)\s*$", ln)
        if not m:
            continue
        indent, name, nid = m.groups()
        entries.append((len(indent), int(nid), name.strip()))
    return entries


def subtree_has_join(entries, idx):
    """True if any node strictly deeper under entries[idx] is a join."""
    depth = entries[idx][0]
    for d, _nid, name in entries[idx + 1 :]:
        if d <= depth:
            break
        if any(tok in name for tok in JOIN_TOKENS):
            return True
    return False


def node_details(plan: str):
    """Map node id -> its details text block from the formatted output."""
    out: dict[int, str] = {}
    for m in re.finditer(
        r"^\((\d+)\) ([^\n]*)\n((?:(?!^\(\d+\)).*\n?)*)", plan.split("\n\n", 1)[-1], re.M
    ):
        out[int(m.group(1))] = m.group(2) + "\n" + m.group(3)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from etl4s_spark.queries import QUERIES, load_all
    from etl4s_spark.session import get_spark

    load_all()
    spark = get_spark("expr_placement_audit")
    names = args.names or list(QUERIES)

    flags: dict[str, list[dict]] = {}
    skipped: list[str] = []
    for name in names:
        try:
            df = QUERIES[name](spark, args.sf)
            plan = spark._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # side-effect-heavy queries may refuse plan-only
            skipped.append(f"{name}: {type(e).__name__}")
            continue
        entries = parse_tree(plan)
        details = node_details(plan)
        hits = []
        for i, (_d, nid, node_name) in enumerate(entries):
            if not node_name.startswith(("Project", "Filter")):
                continue
            det = details.get(nid, "")
            toks = sorted({t.rstrip("(") for t in EXPENSIVE if t in det})
            if toks and subtree_has_join(entries, i):
                hits.append({"node": f"{node_name} ({nid})", "exprs": toks})
        if hits:
            flags[name] = hits
        print(f"{'FLAG' if hits else 'ok  '} {name}" + (f" {hits}" if hits else ""))
    result = {
        "what": "Project/Filter nodes containing expensive expressions with a join in their subtree (post-join evaluation)",
        "n_queries": len(names),
        "n_flagged": len(flags),
        "flags": flags,
        "skipped": skipped,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
        print(f"wrote {args.out}: {len(flags)} flagged / {len(names)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
