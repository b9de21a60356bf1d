"""Two-decade scale probe for the ITERATIVE GRAPH OPERATORS themselves
(VERDICT r7 item 5's "iterative graph family"), decoupled from the
declared graph queries — those are id-capped by construction
(queries/analytics.py _neardup_pairs filters vec_id < 500, so the
table-replication probe in scaling_probe_100x.py would time constant
work and prove nothing).

Instead this probe feeds the operators deterministic synthetic edge
lists at 1x / 10x / 100x edge counts, built DISTRIBUTED (spark.range +
multiplicative hashing — no driver-side materialization, no rand(), so
re-runs time the identical graph) with constant average degree, i.e.
node count grows with edge count exactly like a growing corpus'
near-dup graph does.

Operators probed (operators/graph.py + operators/dedup.py):
  cc_contracted  — min-neighbor contraction components with the
                   on_nonconvergence="star" fallback: the synthetic
                   graph's linear-congruential endpoints create
                   long-diameter paths, exactly the shape where
                   min-label sweeps exceed their budget and the
                   O(log n)-round large-star/small-star variant is the
                   production path (first probe run raised the
                   documented non-convergence error without it)
  cc_star        — the large-star/small-star variant directly (the
                   100 TB high-diameter algorithm of record)
  k_core         — iterative peeling at k=3
  pagerank       — 3 integer-arithmetic iterations over the symmetrized
                   distinct edge list (materialized once, as the
                   operator docstring prescribes)
  bfs_hops       — multi-source frontier BFS, 4 seeds, 6-hop budget

Reading the output: decadeN_ratio = wall(10^N x) / wall(10^(N-1) x);
<= 10 per decade is linear-or-better. Iterative operators have a
log-ish round count on top (components' contraction depth), so a
decade ratio slightly above 10 on decade 2 means "rounds grew", not
"a quadratic appeared"; >> 10 flags real superlinear work.

Usage:
    python tools/graph_scaling_probe.py [-o GRAPH_SCALING.json]
        [--base-edges 30000]   # ~10-20 min, run ALONE (timing-sensitive)
        [--decades 3]          # adds a 1000x scale (30M edges) — VERDICT
                               # r9 item 4's third decade for the
                               # iterative graph family; ~45-90 min
        [--only k_core_planted]  # re-measure selected lanes; with -o the
                               # results MERGE into the existing artifact

Heap: the 1000x k_core_planted lane holds CHAIN_LEN+1 rounds of
localCheckpointed ~60M-row edge snapshots in the block manager (old
rounds free only on driver GC) — run 3-decade probes with
SPARK_GRAFT_DRIVER_MEM=24g; the default 8g OOMs in the task
serializers. On a real cluster the same blocks spill per-executor.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def synthetic_edges(spark, n_edges: int):
    """Deterministic pseudo-random multigraph: n_nodes = n_edges / 8
    (constant average degree 16 after symmetrization), endpoints from
    Knuth multiplicative hashes of the edge index. Self-loops land on a
    few indices — both consumers (components, k_core) define behavior
    for them, so they stay in. Returns (id_a, id_b) bigint."""
    n_nodes = max(n_edges // 8, 16)
    return (
        spark.range(n_edges)
        .select(
            (F.col("id") * 2654435761 % n_nodes).cast("long").alias("id_a"),
            (F.col("id") * 2246822519 % n_nodes + 1).cast("long").alias("id_b"),
        )
        # spread across tasks the way a real shuffled pair list arrives
        .repartition(32)
    )


CHAIN_LEN = 8  # planted peel depth — every scale needs exactly this many rounds


def planted_cascade_edges(spark, n_edges: int):
    """Planted 3-core graph whose peel CASCADES for CHAIN_LEN rounds at
    every scale (VERDICT r10 item 4: the pseudo-random multigraph's
    3-core collapses in ONE round at 100×/1000×, so its decade ratios
    never exercised multi-round peeling — this generator makes round
    count a planted constant, so per-round cost is the ONLY thing a
    decade ratio can measure).

    Structure (deterministic, distributed — spark.range only):
    - CORE: n_core nodes in a circulant graph, node c adjacent to
      c±1, c±2 (mod n_core) — distinct-degree 4 ≥ 3, survives any peel.
    - CHAINS: m triangle-chains of length L=CHAIN_LEN hanging off the
      core: chain node (j,l) adjacent to (j,l+1) and (j,l+2); the two
      tail nodes attach into the core (t_{L-1} to two core nodes,
      t_{L-2} to one) so mid-chain degrees are ≥3 until the unravel
      reaches them. The free end t_0 has degree 2 → peels round 1 →
      t_1 drops to 2 → peels round 2 → … exactly L rounds, then one
      fixpoint-confirm round.
    - Closed form: the 3-core is EXACTLY the n_core circulant nodes
      (each keeps its 4 circulant neighbors; chain edges vanish), so
      the probe can assert output size == n_core at every scale.

    Edge budget: 2·n_core circulant + 2·L per chain with
    n_core = n_edges//4, m = n_edges//(4·L) → ≈ n_edges total,
    constant average degree ≈ 4 across scales."""
    L = CHAIN_LEN
    n_core = max(n_edges // 4, 16)
    m = max(n_edges // (4 * L), 1)
    c = spark.range(n_core)
    core_e = c.select(
        F.col("id").alias("id_a"), ((F.col("id") + 1) % n_core).alias("id_b")
    ).unionByName(
        c.select(
            F.col("id").alias("id_a"), ((F.col("id") + 2) % n_core).alias("id_b")
        )
    )
    ch = spark.range(m * L).select(
        (F.col("id") / L).cast("long").alias("j"),
        (F.col("id") % L).alias("l"),
        (F.col("id") + n_core).alias("node"),
    )
    e_next = ch.filter(F.col("l") < L - 1).select(
        F.col("node").alias("id_a"), (F.col("node") + 1).alias("id_b")
    )
    e_skip = ch.filter(F.col("l") < L - 2).select(
        F.col("node").alias("id_a"), (F.col("node") + 2).alias("id_b")
    )
    anchor = (F.col("j") * 2654435761) % n_core
    tail_a = ch.filter(F.col("l") == L - 1).select(
        F.col("node").alias("id_a"), anchor.alias("id_b")
    )
    tail_b = ch.filter(F.col("l") == L - 1).select(
        F.col("node").alias("id_a"), ((anchor + 1) % n_core).alias("id_b")
    )
    tail_c = ch.filter(F.col("l") == L - 2).select(
        F.col("node").alias("id_a"), ((anchor + 2) % n_core).alias("id_b")
    )
    return (
        core_e.unionByName(e_next)
        .unionByName(e_skip)
        .unionByName(tail_a)
        .unionByName(tail_b)
        .unionByName(tail_c)
        .repartition(32)
    ), n_core


def _time(fn) -> float:
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-edges", type=int, default=30_000)
    ap.add_argument("-o", "--out", default=None)
    ap.add_argument(
        "--decades",
        type=int,
        default=2,
        choices=(2, 3),
        help="2 = 1x/10x/100x (default); 3 adds a 1000x scale — 30M edges "
        "/ 3.75M nodes at the default base (VERDICT r9 item 4: the 1000x "
        "panel had no graph operator; iterative round counts grow with "
        "log(diameter), so the third decade is where they show)",
    )
    ap.add_argument(
        "--only",
        nargs="*",
        default=None,
        help="run only these operator lanes (e.g. --only k_core_planted); "
        "with -o, results MERGE into the existing artifact so untouched "
        "lanes keep their recorded walls",
    )
    args = ap.parse_args()

    from etl4s_spark.operators.dedup import (
        connected_components_contracted,
        connected_components_star,
    )
    from etl4s_spark.operators.graph import (
        bfs_hops,
        k_core,
        pagerank_edges,
        symmetrize,
    )
    from etl4s_spark.session import get_spark

    spark = get_spark("graph_scaling")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[str, float]] = {}
    scales = [10**i for i in range(args.decades + 1)]
    for k in scales:
        n_edges = args.base_edges * k
        print(f"# scale {k}x: {n_edges} edges", file=sys.stderr)
        wanted = lambda name: args.only is None or name in args.only  # noqa: E731
        if not any(
            wanted(n)
            for n in ("cc_contracted", "cc_star", "k_core", "pagerank", "bfs_hops")
        ):
            edges = None  # planted-only run: skip the multigraph build
        else:
            edges = synthetic_edges(spark, n_edges).localCheckpoint(eager=True)

        def run_cc():
            connected_components_contracted(
                edges, on_nonconvergence="star"
            ).agg(F.count_distinct("component")).collect()

        def run_cc_star():
            connected_components_star(edges).agg(
                F.count_distinct("component")
            ).collect()

        def run_kcore():
            k_core(edges, k=3).agg(F.count(F.lit(1))).collect()

        def run_pagerank():
            sym = symmetrize(edges).distinct().localCheckpoint(eager=True)
            pagerank_edges(sym, iterations=3).agg(F.sum("rank_e6")).collect()

        def run_bfs():
            seeds = spark.createDataFrame([(1,), (2,), (3,), (5,)], "id long")
            bfs_hops(edges, seeds, max_hops=6).agg(F.max("hops")).collect()

        for name, fn in (
            ("cc_contracted", run_cc),
            ("cc_star", run_cc_star),
            ("k_core", run_kcore),
            ("pagerank", run_pagerank),
            ("bfs_hops", run_bfs),
        ):
            if not wanted(name):
                continue
            # warm once at 1x so plan-compile/Arrow-fork constants don't
            # pollute the smallest scale's denominator
            if k == 1:
                fn()
            t = _time(fn)
            results.setdefault(name, {})[f"t_{k}x_sec"] = t
            print(f"#   {name} @ {k}x: {t}s", file=sys.stderr)

        if wanted("k_core_planted"):
            # planted multi-round cascade (VERDICT r10 item 4): round
            # count is a built-in constant (CHAIN_LEN peels + 1 confirm)
            # and the 3-core is exactly the circulant core, both checked
            # hard — a decade ratio over this lane measures per-round
            # cost growth and NOTHING else
            p_edges, n_core = planted_cascade_edges(spark, n_edges)
            p_edges = p_edges.localCheckpoint(eager=True)
            row = results.setdefault("k_core_planted", {})

            def run_kcore_planted():
                rounds: list[int] = []
                out = k_core(p_edges, k=3, round_sizes=rounds)
                got = out.agg(
                    F.count(F.lit(1)).alias("n"), F.min("core_degree").alias("d")
                ).first()
                assert got["n"] == n_core, (got["n"], n_core)
                assert got["d"] >= 3
                assert len(rounds) == CHAIN_LEN + 1, rounds
                row[f"rounds_{k}x"] = len(rounds)

            if k == 1:
                run_kcore_planted()
            t = _time(run_kcore_planted)
            row[f"t_{k}x_sec"] = t
            print(
                f"#   k_core_planted @ {k}x: {t}s "
                f"(rounds={row[f'rounds_{k}x']}, core={n_core})",
                file=sys.stderr,
            )

    for name, row in results.items():
        for i in range(1, len(scales)):
            lo, hi = row[f"t_{scales[i - 1]}x_sec"], row[f"t_{scales[i]}x_sec"]
            row[f"decade{i}_ratio"] = round(hi / lo, 2) if lo > 0 else None

    doc = {
        "base_edges": args.base_edges,
        "scales": scales,
        "avg_degree_sym": 16,
        "note": "synthetic deterministic multigraph, node count grows with "
        "edge count (constant avg degree); decadeN_ratio = wall per 10x "
        "decade; iterative round-count growth adds a log factor on top "
        "of linear work, so <=~12 on decade 2 is healthy, >>10 with "
        "flat rounds flags superlinear work. Decade 3 (--decades 3) is "
        "where round growth actually shows: apply the same <=~12 bound "
        "PER DECADE but read it against measured round counts — a >10 "
        "decade-3 ratio with FLAT rounds over an overhead-bound "
        "denominator is a timing artifact (adjudicate with the round "
        "count, as GRAPH_SCALING's k_core entry does), while >10 with "
        "GROWING rounds is the log factor and >>12 is superlinear work. "
        "k_core_planted (r11) removes that ambiguity: a planted circulant-"
        "core + triangle-chain graph whose 3-core peel needs EXACTLY "
        f"{CHAIN_LEN} cascade rounds (+1 fixpoint confirm) at every scale "
        "and whose 3-core is exactly the circulant core (both asserted "
        "in-probe, rounds_Nx recorded) — its decade ratios measure "
        "per-round cost growth on a real multi-round peel, closing the "
        "one-round-collapse gap in the pseudo-random k_core lane",
        "operators": results,
    }
    if args.only is not None and args.out and os.path.exists(args.out):
        # partial run: merge the re-measured lanes into the existing
        # artifact so untouched lanes keep their recorded walls (walls
        # from different box sessions must not be cross-compared, so
        # only whole lanes are replaced, never mixed)
        with open(args.out) as f:
            prior = json.load(f)
        prior.setdefault("operators", {}).update(results)
        prior["note"] = doc["note"]
        doc = prior
    text = json.dumps(doc, indent=1, sort_keys=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        last = len(scales) - 1
        print(
            json.dumps(
                {n: r.get(f"decade{last}_ratio") for n, r in results.items()}
            )
        )
    else:
        print(text)


if __name__ == "__main__":
    main()
