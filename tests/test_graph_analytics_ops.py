"""Operator-level tests for graph + analytics builders on crafted
inputs with hand-computable answers (the query oracles cover them on
the big tables; these pin the algebra on knowable graphs/distributions)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_triangle_census_counts_clique_exactly_once(spark):
    from etl4s_spark.operators.graph import triangle_census

    # 4-clique on {1,2,3,4} -> C(4,3)=4 triangles; plus a dangling path
    # 5-6-7 (no triangle); edges given in MIXED orientation to prove the
    # operator orients internally
    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = clique + [(6, 5), (6, 7)]
    row = triangle_census(_pairs(spark, edges)).first()
    assert row.n_triangles == 4
    assert row.n_apex_nodes == 2  # apexes 1 and 2 generate all 4 wedges


def test_degree_histogram_star(spark):
    from etl4s_spark.operators.graph import degree_histogram

    # star: center 0 with 5 leaves (+ one duplicate edge that must not
    # inflate distinct-neighbor degree)
    edges = [(0, i) for i in range(1, 6)] + [(0, 1)]
    out = {r.degree: r.n_nodes for r in degree_histogram(_pairs(spark, edges)).collect()}
    assert out == {5: 1, 1: 5}


def test_pagerank_integer_is_deterministic_and_hub_heavy(spark):
    from etl4s_spark.operators.graph import pagerank_integer

    # barbell: two 3-cliques bridged through node 10 — the bridge gets
    # contributions from both sides
    c1 = [(1, 2), (1, 3), (2, 3)]
    c2 = [(4, 5), (4, 6), (5, 6)]
    bridge = [(3, 10), (4, 10)]
    pairs = _pairs(spark, c1 + c2 + bridge)
    a = {r.id: r.rank_e6 for r in pagerank_integer(pairs, iterations=4).collect()}
    b = {r.id: r.rank_e6 for r in pagerank_integer(pairs, iterations=4).collect()}
    assert a == b  # bit-identical across runs — integer arithmetic
    # symmetric graph -> symmetric ranks
    assert a[1] == a[2] == a[5] == a[6]
    assert a[3] == a[4]
    assert all(v >= 150000 for v in a.values())


def test_lorenz_deciles_exact_shares(spark):
    from etl4s_spark.operators.analytics import lorenz_deciles

    rows = [(k, 1, k * 100) for k in range(1, 11)]  # amounts 100..1000
    df = spark.createDataFrame(rows, "k long, one int, amt long")
    out = {
        r.decile: (r.n_keys, r.amount_total, r.share_e6)
        for r in lorenz_deciles(df, key="k", amount=F.col("amt")).collect()
    }
    total = sum(k * 100 for k in range(1, 11))  # 5500
    assert len(out) == 10 and all(v[0] == 1 for v in out.values())
    assert out[1][1] == 1000 and out[10][1] == 100  # desc by amount
    assert out[1][2] == (1000 * 1000000) // total


def test_key_skew_profile_gini_zero_on_uniform(spark):
    from etl4s_spark.operators.analytics import key_skew_profile

    uniform = spark.createDataFrame(
        [(k, i) for k in range(10) for i in range(7)], "k long, i long"
    )
    row = key_skew_profile(uniform, key="k").first()
    assert row.gini_e6 == 0 and row.max_cnt == row.min_cnt == 7

    skewed = spark.createDataFrame(
        [(0, i) for i in range(91)] + [(k, 0) for k in range(1, 10)],
        "k long, i long",
    )
    row2 = key_skew_profile(skewed, key="k").first()
    assert row2.gini_e6 > 700000  # one key holds 91% of rows
    assert row2.top10_share_e6 == 1000000


def test_key_skew_gini_matches_reference_formula(spark):
    """Random per-key multiplicities: operator Gini == the exact-rank
    formula computed independently in Python over the same counts."""
    import random

    from etl4s_spark.operators.analytics import key_skew_profile

    rng = random.Random(7)
    counts = {k: rng.randrange(1, 40) for k in range(25)}
    rows = [(k, i) for k, c in counts.items() for i in range(c)]
    df = spark.createDataFrame(rows, "k long, i long")
    got = key_skew_profile(df, key="k").first()

    cs = sorted((c, k) for k, c in counts.items())
    n = len(cs)
    total = sum(c for c, _ in cs)
    weighted = sum((i + 1) * c for i, (c, _) in enumerate(cs))
    want_gini = ((2 * weighted - (n + 1) * total) * 1000000) // (n * total)
    top10 = sum(c for c, _ in sorted(cs, reverse=True)[:10])
    assert got.gini_e6 == want_gini
    assert got.top10_share_e6 == (top10 * 1000000) // total
    assert (got.n_keys, got.n_rows) == (n, total)


def test_pagerank_dedups_duplicate_edges_by_default(spark):
    """A duplicate pair must not inflate degrees/contributions — default
    contract matches degree_histogram/triangle_census normalization."""
    from etl4s_spark.operators.graph import pagerank_integer

    clean = _pairs(spark, [(1, 2), (1, 3)])
    dup = _pairs(spark, [(1, 2), (1, 2), (1, 3)])
    a = {r.id: (r.degree, r.rank_e6) for r in pagerank_integer(clean).collect()}
    b = {r.id: (r.degree, r.rank_e6) for r in pagerank_integer(dup).collect()}
    assert a == b
