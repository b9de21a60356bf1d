"""Model-based test for the shared capped pair-emission contract.

``locality_chain_combos`` (operators/pair_emission.py) is the one
expression both LSH funnels (text minhash + embedding hyperplane) trust
for their boundedness AND their component-preservation guarantees, so it
gets an exact reference model: for every (g, max_pairs_per_bucket,
pair_cap_factor) scenario the emitted pair SET must equal the model's —
not just counts — plus the budget/audit closed forms and the diameter≤2
hub-adjacency property the CC consumers rely on.

All scenarios run as ONE Spark job (one row per scenario, the expression
applied per-row), so the grid stays cheap: ~200 scenarios, one collect.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from etl4s_spark.operators.pair_emission import locality_chain_combos


def _model(ids_sorted, max_pairs, factor):
    """Reference emission: mirrors the documented contract, not the code.

    ids_sorted is the bucket's id list in array (locality) order; the
    hub is position 0. Returns (set of canonical pairs, dropped count).
    """
    g = len(ids_sorted)
    full = g * (g - 1) // 2
    caps = [c for c in (max_pairs, None if factor is None else factor * g) if c is not None]
    if not caps or full <= min(caps):
        all_pairs = {
            (min(a, b), max(a, b)) for a, b in itertools.combinations(ids_sorted, 2)
        }
        return all_pairs, 0
    cap_eff = min(caps)
    c = max(1, cap_eff // g)
    w = c - 1
    pairs = set()
    for i in range(g):
        for j in range(i + 1, min(i + w, g - 1) + 1):
            a, b = ids_sorted[i], ids_sorted[j]
            pairs.add((min(a, b), max(a, b)))
    hub = ids_sorted[0]
    for j in range(w + 1, g):
        b = ids_sorted[j]
        pairs.add((min(hub, b), max(hub, b)))
    return pairs, full - len(pairs)


# ids are deliberately NOT in sorted-by-id order within the array: the
# array order is LOCALITY order (key, id) — canonicalization must come
# from least/greatest, not from array position.
def _ids_for(g):
    return [(7919 * (i + 1)) % (2 * g + 3) * 1000 + i for i in range(g)]


GRID = [
    (g, mp, pf)
    for g in (0, 1, 2, 3, 5, 13, 50, 200)
    for mp in (None, 1, 5, 100, 10_000)
    for pf in (None, 1, 8, 64)
] + [
    # default cap knobs at mega-bucket sizes — reachable only when a
    # caller raises max_bucket_size past 1000 (the operators' skew
    # guard drops such buckets under shipped defaults): the shrinking
    # chain band (c = 10k//2000 = 5) and the c=1 floor past g=5000,
    # where emission must be byte-identical to the pure hub star
    (2_000, 10_000, 8),
    (6_000, 10_000, 8),
    (2_000, 10_000, 64),
    (6_000, 10_000, 64),
]


@pytest.mark.parametrize("chunk", [0, 1])
def test_chain_emission_matches_model(spark, chunk):
    scenarios = [s for i, s in enumerate(GRID) if i % 2 == chunk]
    # group scenarios by knob pair — the knobs are Python-side constants
    # baked into the expression, so each knob pair is one DataFrame pass
    by_knobs: dict[tuple, list[tuple[int, list[int]]]] = {}
    for g, mp, pf in scenarios:
        by_knobs.setdefault((mp, pf), []).append((g, _ids_for(g)))

    for (mp, pf), rows in by_knobs.items():
        df = spark.createDataFrame(
            [(g, [{"id": i} for i in ids]) for g, ids in rows],
            "g int, members array<struct<id:bigint>>",
        )
        combos, dropped = locality_chain_combos(F.col("members"), mp, pf)
        got = {
            r.g: (
                {(p.id_a, p.id_b) for p in r.pairs},
                len(r.pairs),
                r.dropped,
            )
            for r in df.select("g", combos.alias("pairs"), dropped.alias("dropped"))
            .collect()
        }
        for g, ids in rows:
            want_pairs, want_dropped = _model(ids, mp, pf)
            got_pairs, got_len, got_dropped = got[g]
            assert got_pairs == want_pairs, (g, mp, pf)
            # no duplicate emissions: the array length IS the set size
            assert got_len == len(want_pairs), (g, mp, pf)
            assert got_dropped == want_dropped, (g, mp, pf)
            # canonical orientation
            assert all(a < b for a, b in got_pairs), (g, mp, pf)
            # budget: emitted ≤ effective cap whenever the cap binds
            # above the c=1 connectivity floor (cap ≥ 2g)
            caps = [c for c in (mp, None if pf is None else pf * g) if c is not None]
            if caps and g and min(caps) >= 2 * g:
                full = g * (g - 1) // 2
                if full > min(caps):
                    assert len(got_pairs) <= min(caps), (g, mp, pf)
            # diameter ≤ 2: every member adjacent to the hub, so CC over
            # capped pairs == CC over the clique (what the funnels pin)
            if g >= 2:
                hub = ids[0]
                for other in ids[1:]:
                    pair = (min(hub, other), max(hub, other))
                    assert pair in got_pairs, (g, mp, pf, other)
