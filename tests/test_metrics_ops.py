"""Semantic tests for the distribution-shape & dependence metrics
(queries/metrics.py) on PLANTED data — each statistic is checked
against a tiny pure-Python reference implementation or a closed-form
value, not against the DuckDB oracle (tools/verify_local.py covers
that)."""

from __future__ import annotations

import datetime as dt
import math

from etl4s_spark.queries import QUERIES, load_all

load_all()


def _write(spark, tmp_path, table, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/{table}.parquet"
    )


# ---------------------------------------------------------------- spearman


def _lineitem_rows(triples):
    """(qty, disc_pct, tax_pct) -> minimal lineitem rows."""
    return [
        (float(q), float(d) / 100.0, float(t) / 100.0, 1000.0, "N")
        for q, d, t in triples
    ]


_LI_SCHEMA = (
    "l_quantity double, l_discount double, l_tax double, "
    "l_extendedprice double, l_returnflag string"
)


def _spearman_ref(xs, ys):
    """Tie-aware Spearman: Pearson on average ranks."""

    def avg_ranks(v):
        order = sorted(range(len(v)), key=lambda i: v[i])
        ranks = [0.0] * len(v)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and v[order[j + 1]] == v[order[i]]:
                j += 1
            r = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = r
            i = j + 1
        return ranks

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(sum((a - mx) ** 2 for a in rx)) * math.sqrt(
        sum((b - my) ** 2 for b in ry)
    )
    return num / den


def test_spearman_perfect_monotone(spark, tmp_path):
    """Strictly increasing / decreasing pairs give rho = +1 / -1."""
    triples = [(i, i, 21 - i) for i in range(1, 21)]
    _write(spark, tmp_path, "lineitem", _lineitem_rows(triples), _LI_SCHEMA)
    out = QUERIES["q_stat_spearman"](spark, str(tmp_path)).collect()[0]
    assert out.n == 20
    assert out.rho_qty_disc == 1.0
    assert out.rho_qty_tax == -1.0
    assert out.rho_disc_tax == -1.0


def test_spearman_ties_match_reference(spark, tmp_path):
    """Heavy ties: the doubled-average-rank histogram formula must equal
    the classic tie-aware Spearman computed row-wise."""
    triples = [
        (1, 5, 2), (1, 3, 2), (2, 5, 1), (2, 3, 4), (2, 1, 4),
        (3, 1, 1), (3, 5, 2), (4, 3, 4), (4, 1, 1), (4, 1, 2),
    ]
    _write(spark, tmp_path, "lineitem", _lineitem_rows(triples), _LI_SCHEMA)
    out = QUERIES["q_stat_spearman"](spark, str(tmp_path)).collect()[0]
    qs = [t[0] for t in triples]
    ds = [t[1] for t in triples]
    ts = [t[2] for t in triples]
    assert abs(out.rho_qty_disc - round(_spearman_ref(qs, ds), 6)) < 1e-9
    assert abs(out.rho_qty_tax - round(_spearman_ref(qs, ts), 6)) < 1e-9
    assert abs(out.rho_disc_tax - round(_spearman_ref(ds, ts), 6)) < 1e-9


# ---------------------------------------------------------------- acf


def _acf_ref(xs, k):
    n = len(xs)
    mu = sum(xs) / n
    num = sum((xs[t] - mu) * (xs[t + k] - mu) for t in range(n - k))
    den = sum((x - mu) ** 2 for x in xs)
    return num / den


def test_acf_matches_reference_on_planted_series(spark, tmp_path):
    """Plant an exact hourly click-count series (including empty hours
    that must zero-fill) and compare all 7 lags to the textbook ACF."""
    xs = [3, 0, 4, 1, 5, 0, 2, 6, 1, 3, 0, 7, 2, 2, 4, 0, 1, 5, 3, 0, 2, 4, 1, 6]
    rows = []
    eid = 0
    base = dt.datetime(2024, 3, 1)
    for h, cnt in enumerate(xs):
        for j in range(cnt):
            rows.append(
                (eid, base + dt.timedelta(hours=h, minutes=j), 1, "click", 1.0, "{}")
            )
            eid += 1
        # a non-click event per hour so even 0-click hours are inside the
        # span (the grid zero-fills them)
        rows.append(
            (eid, base + dt.timedelta(hours=h, minutes=59), 1, "view", 1.0, "{}")
        )
        eid += 1
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.lag_hours: r for r in QUERIES["q_ts_acf"](spark, str(tmp_path)).collect()}
    assert sorted(out) == [1, 2, 3, 4, 5, 6, 7]
    for k in range(1, 8):
        assert out[k].n_pairs == len(xs) - k
        assert abs(out[k].acf - round(_acf_ref(xs, k), 6)) < 1e-9


# ---------------------------------------------------------------- moments


def _moments_ref(vals):
    n = len(vals)
    mu = sum(vals) / n
    m2 = sum((v - mu) ** 2 for v in vals) / n
    m3 = sum((v - mu) ** 3 for v in vals) / n
    m4 = sum((v - mu) ** 4 for v in vals) / n
    return m3 / (m2 * math.sqrt(m2)), m4 / (m2 * m2) - 3


def test_moments_symmetric_distribution_has_zero_skew(spark, tmp_path):
    prices = [10.0, 20.0, 20.0, 30.0]
    rows = [(1.0, 0.0, 0.0, p, "A") for p in prices]
    _write(spark, tmp_path, "lineitem", rows, _LI_SCHEMA)
    out = QUERIES["q_agg_moments"](spark, str(tmp_path)).collect()[0]
    assert out.n == 4
    assert out.mean_price == 20.0
    assert out.skewness == 0.0
    skew, kurt = _moments_ref([p * 100 for p in prices])
    assert abs(out.kurtosis_excess - round(kurt, 6)) < 1e-9


def test_moments_per_group_match_reference(spark, tmp_path):
    groups = {"A": [1.0, 2.0, 3.0, 10.0], "R": [5.0, 5.0, 6.0, 9.0, 25.0]}
    rows = [
        (1.0, 0.0, 0.0, p, flag) for flag, ps in groups.items() for p in ps
    ]
    _write(spark, tmp_path, "lineitem", rows, _LI_SCHEMA)
    out = {r.l_returnflag: r for r in QUERIES["q_agg_moments"](spark, str(tmp_path)).collect()}
    for flag, ps in groups.items():
        skew, kurt = _moments_ref([p * 100 for p in ps])
        assert out[flag].n == len(ps)
        assert abs(out[flag].skewness - round(skew, 6)) < 1e-9
        assert abs(out[flag].kurtosis_excess - round(kurt, 6)) < 1e-9


# ---------------------------------------------------------------- gini


_CUST_SCHEMA = "c_custkey long, c_mktsegment string"
_ORD_SCHEMA = "o_orderkey long, o_custkey long, o_totalprice double"


def test_gini_equal_revenues_is_zero(spark, tmp_path):
    custs = [(i, "SEG") for i in range(1, 6)]
    orders = [(i, i, 100.0) for i in range(1, 6)]
    _write(spark, tmp_path, "customer", custs, _CUST_SCHEMA)
    _write(spark, tmp_path, "orders", orders, _ORD_SCHEMA)
    out = QUERIES["q_gini_concentration"](spark, str(tmp_path)).collect()[0]
    assert out.n_customers == 5
    assert out.total_rev_cents == 50000
    assert out.gini == 0.0


def test_gini_single_whale_is_n_minus_one_over_n(spark, tmp_path):
    """One customer holds (almost) all revenue -> G -> (n-1)/n. Exact
    when the others hold zero; we give them epsilon-free zero by
    excluding non-ordering customers, so plant tiny-vs-huge instead and
    check against the closed form on the planted values."""
    custs = [(i, "SEG") for i in range(1, 5)]
    orders = [(1, 1, 1.0), (2, 2, 1.0), (3, 3, 1.0), (4, 4, 9997.0)]
    _write(spark, tmp_path, "customer", custs, _CUST_SCHEMA)
    _write(spark, tmp_path, "orders", orders, _ORD_SCHEMA)
    out = QUERIES["q_gini_concentration"](spark, str(tmp_path)).collect()[0]
    xs = sorted([100, 100, 100, 999700])
    n = len(xs)
    six = sum((i + 1) * x for i, x in enumerate(xs))
    want = (2 * six - (n + 1) * sum(xs)) / (n * sum(xs))
    assert abs(out.gini - round(want, 6)) < 1e-9
    assert out.gini > 0.74  # whale-dominated: close to (n-1)/n = 0.75


def test_gini_partitions_by_segment(spark, tmp_path):
    custs = [(1, "A"), (2, "A"), (3, "B"), (4, "B")]
    orders = [(1, 1, 10.0), (2, 2, 10.0), (3, 3, 10.0), (4, 4, 30.0)]
    _write(spark, tmp_path, "customer", custs, _CUST_SCHEMA)
    _write(spark, tmp_path, "orders", orders, _ORD_SCHEMA)
    out = {r.segment: r for r in QUERIES["q_gini_concentration"](spark, str(tmp_path)).collect()}
    assert out["A"].gini == 0.0
    assert out["B"].gini == 0.25  # {1000,3000}: (2*(1*1000+2*3000)-3*4000)/(2*4000)


# ------------------------------------------------------- assortativity


def test_assortativity_star_graph_is_minus_one(spark, tmp_path):
    """A star (hub + 6 leaves) is the canonical disassortative graph:
    every edge pairs degree 6 with degree 1 -> r = -1. Planted vectors:
    hub = e0; leaf_i = 0.5*e0 + sqrt(0.75)*e_i, so cos(hub, leaf) = 0.5
    >= 0.4 and cos(leaf_i, leaf_j) = 0.25 < 0.4."""
    d = 64
    rows = []

    def vec(vals):
        v = [0.0] * d
        for idx, x in vals:
            v[idx] = x
        return v

    rows.append((0, vec([(0, 1.0)])))
    for i in range(1, 7):
        rows.append((i, vec([(0, 0.5), (i, math.sqrt(0.75))])))
    _write(spark, tmp_path, "embeddings", rows, "vec_id long, embedding array<double>")
    out = QUERIES["q_graph_assortativity"](spark, str(tmp_path)).collect()[0]
    assert out.n_edges == 6
    assert out.n_nodes == 7
    assert out.assortativity == -1.0


# ------------------------------------------------------- theil-sen


def test_theil_sen_ignores_single_outlier(spark, tmp_path):
    """A clean +2/day trend with one spiked day: Theil-Sen stays 2.0,
    OLS is dragged away from it."""
    rows = []
    eid = 0
    base = dt.datetime(2024, 5, 1)
    clicks = [2 + 2 * t for t in range(10)]
    clicks[4] = 200  # outlier day
    for day, cnt in enumerate(clicks):
        for j in range(cnt):
            rows.append(
                (eid, base + dt.timedelta(days=day, minutes=j), 1, "click", 1.0, "{}")
            )
            eid += 1
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = QUERIES["q_ts_theil_sen"](spark, str(tmp_path)).collect()[0]
    assert out.n_days == 10
    assert out.n_pairs == 45
    assert out.theil_sen_slope == 2.0
    assert abs(out.ols_slope - 2.0) > 1.0  # OLS dragged by the spike


def test_theil_sen_median_matches_reference(spark, tmp_path):
    """Exact lower-median of pairwise slopes on an irregular series."""
    rows = []
    eid = 0
    base = dt.datetime(2024, 5, 1)
    ys = [5, 1, 9, 4, 12, 3]
    for day, cnt in enumerate(ys):
        for j in range(cnt):
            rows.append(
                (eid, base + dt.timedelta(days=day, minutes=j), 1, "click", 1.0, "{}")
            )
            eid += 1
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = QUERIES["q_ts_theil_sen"](spark, str(tmp_path)).collect()[0]
    slopes = sorted(
        round((ys[b] - ys[a]) * 1e6 / (b - a)) / 1e6
        for a in range(len(ys))
        for b in range(a + 1, len(ys))
    )
    m = len(slopes)
    # lower median: smallest slope with 2*rank >= m
    want = slopes[(m - 1) // 2] if m % 2 else slopes[m // 2 - 1]
    assert out.n_pairs == m
    assert abs(out.theil_sen_slope - round(want, 6)) < 1e-9


# ------------------------------------------------------- pmi / coverage


def test_pmi_separates_glued_pair_from_stopword_pair(spark, tmp_path):
    """'foo bar' always co-occur (PMI = ln(N^2 * c_ab / (M c_a c_b)) high);
    'the the' co-occurs at chance (PMI ~ 0); check exact values."""
    import math as _m

    docs = []
    for i in range(10):
        docs.append((i, "foo bar", "en", "s", 7))
    for i in range(10, 30):
        docs.append((i, "the xx the yy the zz", "en", "s", 20))
    _write(spark, tmp_path, "documents", docs,
           "doc_id long, text string, lang string, source string, n_chars long")
    rows = {r.bigram: r for r in QUERIES["q_text_pmi_bigrams"](spark, str(tmp_path)).collect()}
    # corpus: 10x "foo bar" (2 tokens), 20x 6-token docs
    n_uni = 10 * 2 + 20 * 6          # 140
    n_bi = 10 * 1 + 20 * 5           # 110
    c_foo = 10; c_bar = 10; c_foobar = 10
    want = _m.log(c_foobar * n_uni * n_uni / (n_bi * c_foo * c_bar))
    assert "foo bar" in rows
    assert abs(rows["foo bar"].pmi - round(want, 6)) < 1e-9
    assert rows["foo bar"].n_pair == 10
    # a chance-level pair like 'the yy' must score far below 'foo bar'
    for name, r in rows.items():
        if name != "foo bar":
            assert r.pmi < rows["foo bar"].pmi


def test_vocab_coverage_exact_interpolation(spark, tmp_path):
    """Freq classes {a:5, b:3, c:3, d:1}: top-10 covers everything;
    k beyond vocab clamps; interpolation inside a class is exact."""
    text = " ".join(["a"] * 5 + ["b"] * 3 + ["c"] * 3 + ["d"])
    _write(spark, tmp_path, "documents", [(1, text, "en", "s", len(text))],
           "doc_id long, text string, lang string, source string, n_chars long")
    rows = {r.k: r for r in QUERIES["q_text_vocab_coverage"](spark, str(tmp_path)).collect()}
    assert rows[10].vocab_used == 4
    assert rows[10].covered_tokens == 12 and rows[10].coverage == 1.0
    assert rows[100].covered_tokens == 12
    assert rows[10000].total_tokens == 12


def test_vocab_coverage_partial_class(spark, tmp_path):
    """12 words of freq 2 + 20 words of freq 1: k=10 lands inside the
    freq-2 class -> covered = 10*2."""
    words_ = [f"w{i} w{i}" for i in range(12)] + [f"u{i}" for i in range(20)]
    text = " ".join(words_)
    _write(spark, tmp_path, "documents", [(1, text, "en", "s", len(text))],
           "doc_id long, text string, lang string, source string, n_chars long")
    rows = {r.k: r for r in QUERIES["q_text_vocab_coverage"](spark, str(tmp_path)).collect()}
    assert rows[10].covered_tokens == 20
    assert rows[10].coverage == round(20 / 44, 6)
    assert rows[100].covered_tokens == 44


# ------------------------------------------------------- kendall


def _kendall_ref(xs, ys):
    """Naive O(n^2) tau-b."""
    n = len(xs)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = (xs[i] > xs[j]) - (xs[i] < xs[j])
            dy = (ys[i] > ys[j]) - (ys[i] < ys[j])
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
    n0 = n * (n - 1) // 2
    from collections import Counter

    n1 = sum(c * (c - 1) // 2 for c in Counter(xs).values())
    n2 = sum(c * (c - 1) // 2 for c in Counter(ys).values())
    return conc, disc, (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2))


def test_kendall_histogram_equals_naive_pairs(spark, tmp_path):
    """The contingency-cell formulation must reproduce the O(n^2)
    row-pair tau-b exactly, ties included."""
    qd = [(1, 5), (1, 3), (2, 5), (2, 3), (2, 1), (3, 1), (3, 5),
          (4, 3), (4, 1), (4, 1), (1, 1), (2, 2)]
    rows = [(float(q), float(d) / 100.0, 0.0, 1000.0, "N") for q, d in qd]
    _write(spark, tmp_path, "lineitem", rows, _LI_SCHEMA)
    out = QUERIES["q_stat_kendall"](spark, str(tmp_path)).collect()[0]
    conc, disc, tau = _kendall_ref([q for q, _ in qd], [d for _, d in qd])
    assert out.n == 12
    assert out.concordant == conc
    assert out.discordant == disc
    assert abs(out.tau_b - round(tau, 6)) < 1e-9


def test_kendall_perfect_order(spark, tmp_path):
    rows = [(float(i), float(i) / 100.0, 0.0, 1000.0, "N") for i in range(1, 11)]
    _write(spark, tmp_path, "lineitem", rows, _LI_SCHEMA)
    out = QUERIES["q_stat_kendall"](spark, str(tmp_path)).collect()[0]
    assert out.tau_b == 1.0 and out.discordant == 0


# ------------------------------------------------------- mutual info


_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_mutual_info_independent_is_zero(spark, tmp_path):
    """lang ⫫ source (product distribution) -> MI = 0, NMI = 0."""
    docs = []
    did = 0
    for lang in ("en", "de"):
        for src in ("a", "b", "c"):
            for _ in range(4):
                docs.append((did, "x", lang, src, 1))
                did += 1
    _write(spark, tmp_path, "documents", docs, _DOC_SCHEMA)
    out = QUERIES["q_stat_mutual_info"](spark, str(tmp_path)).collect()[0]
    assert out.n_docs == 24 and out.n_langs == 2 and out.n_sources == 3
    assert out.mi_nats == 0.0 and out.nmi == 0.0
    assert abs(out.h_lang - round(math.log(2), 6)) < 1e-9
    assert abs(out.h_source - round(math.log(3), 6)) < 1e-9


def test_mutual_info_perfect_silos(spark, tmp_path):
    """Each source carries exactly one language -> MI = H(lang) and
    NMI = sqrt(H(lang)/H(source)) for uniform margins."""
    docs = []
    did = 0
    for lang, src in (("en", "a"), ("de", "b"), ("fr", "c")):
        for _ in range(5):
            docs.append((did, "x", lang, src, 1))
            did += 1
    _write(spark, tmp_path, "documents", docs, _DOC_SCHEMA)
    out = QUERIES["q_stat_mutual_info"](spark, str(tmp_path)).collect()[0]
    h = math.log(3)
    assert abs(out.mi_nats - round(h, 6)) < 2e-6  # nano-nat quantization
    assert abs(out.nmi - 1.0) < 2e-6


# ------------------------------------------------------- lexical profile


def test_lexical_profile_exact_ratios(spark, tmp_path):
    docs = [
        (1, "aa bb aa cc", "en", "s1", 11),   # tokens 4, vocab 3, hapax 2
        (2, "aa aa aa aa", "en", "s2", 11),   # tokens 4, vocab 1, hapax 0
    ]
    _write(spark, tmp_path, "documents", docs, _DOC_SCHEMA)
    out = {r.source: r for r in QUERIES["q_text_lexical_profile"](spark, str(tmp_path)).collect()}
    s1 = out["s1"]
    assert (s1.n_tokens, s1.vocab, s1.hapax) == (4, 3, 2)
    assert s1.type_token_ratio == 0.75
    assert s1.hapax_share == round(2 / 3, 6)
    assert s1.avg_word_len == 2.0
    s2 = out["s2"]
    assert (s2.n_tokens, s2.vocab, s2.hapax) == (4, 1, 0)
    assert s2.type_token_ratio == 0.25 and s2.hapax_share == 0.0


# ------------------------------------------------------- order aging


def test_order_aging_buckets_and_shares(spark, tmp_path):
    base = dt.date(2024, 6, 30)
    orders = [
        (1, 1, 100.0, "O", base),                        # age 0   -> 0-30
        (2, 1, 200.0, "O", base - dt.timedelta(days=31)),  # 31-90
        (3, 1, 300.0, "O", base - dt.timedelta(days=180)), # 91-180
        (4, 1, 400.0, "O", base - dt.timedelta(days=400)), # 365+
        (5, 1, 999.0, "F", base),                        # closed: excluded
    ]
    _write(
        spark, tmp_path, "orders", orders,
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderstatus string, o_orderdate date",
    )
    rows = {r.bucket: r for r in QUERIES["q_order_aging"](spark, str(tmp_path)).collect()}
    assert sorted(rows) == [0, 1, 2, 4]  # no 181-365 orders
    assert rows[0].age_band == "0-30" and rows[0].open_value_cents == 10000
    assert rows[2].n_orders == 1 and rows[2].open_value_cents == 30000
    assert rows[4].value_share == round(40000 / 100000, 6)
    assert sum(r.open_value_cents for r in rows.values()) == 100000


# ------------------------------------------------------- stickiness


_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_stickiness_rolling_window_exact(spark, tmp_path):
    """10 days; user 1 active daily, user 2 every 3rd day, user 3 only
    day 0. Check DAU/WAU7 on the last day and that pre-window days are
    dropped."""
    rows = []
    eid = 0
    base = dt.datetime(2024, 4, 1)
    for day in range(10):
        active = [1]
        if day % 3 == 0:
            active.append(2)
        if day == 0:
            active.append(3)
        for u in active:
            rows.append((eid, base + dt.timedelta(days=day, hours=1), u, "view", 1.0, "{}"))
            eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r.day.isoformat(): r for r in QUERIES["q_user_stickiness"](spark, str(tmp_path)).collect()}
    assert len(out) == 4  # days 6..9 only (first full 7d window)
    d9 = out["2024-04-10"]
    # window days 3..9: user1 all, user2 on days 3,6,9 -> wau7 = 2; dau day9 = {1,2}
    assert (d9.dau, d9.wau7) == (2, 2)
    assert d9.stickiness == 1.0
    d6 = out["2024-04-07"]
    # window days 0..6: users {1,2,3}; dau day6 = {1,2}
    assert (d6.dau, d6.wau7) == (2, 3)
    assert d6.stickiness == round(2 / 3, 6)


# ------------------------------------------------------- wilson


def test_wilson_lower_bound_formula_and_small_sample_penalty(spark, tmp_path):
    """Brand A: 1/2 returned (tiny sample); brand B: 40/100 returned.
    Plain rate ranks A first; the Wilson lower bound must rank B first.
    Values checked against the closed form."""
    parts = [(i, f"p{i}", "Brand#A" if i == 1 else "Brand#B", "t", 1, 1.0)
             for i in (1, 2)]
    _write(spark, tmp_path, "part", parts,
           "p_partkey long, p_name string, p_brand string, p_type string, "
           "p_size int, p_retailprice double")
    li = []
    li += [(1, "R" if j == 0 else "N") for j in range(2)]          # A: 1/2
    li += [(2, "R" if j < 40 else "N") for j in range(100)]        # B: 40/100
    _write(spark, tmp_path, "lineitem",
           [(pk, 1.0, 0.0, 0.0, 100.0, rf) for pk, rf in li],
           "l_partkey long, l_quantity double, l_discount double, l_tax double, "
           "l_extendedprice double, l_returnflag string")
    rows = QUERIES["q_returns_wilson"](spark, str(tmp_path)).collect()

    def wilson(k, n):
        ph = k / n
        return (ph + 3.8416 / (2 * n)
                - 1.96 * math.sqrt(ph * (1 - ph) / n + 3.8416 / (4.0 * n * n))
                ) / (1 + 3.8416 / n)

    assert rows[0].brand == "Brand#B"  # despite lower raw rate
    assert rows[0].return_rate < rows[1].return_rate
    assert abs(rows[0].wilson_lower - round(wilson(40, 100), 6)) < 1e-9
    assert abs(rows[1].wilson_lower - round(wilson(1, 2), 6)) < 1e-9


# ------------------------------------------------------- new/returning


def test_new_returning_weekly_split(spark, tmp_path):
    """Week 1: users {1,2} (both new). Week 2: users {1,3}: 1 returning,
    3 new."""
    rows = []
    eid = 0
    w1 = dt.datetime(2024, 4, 1)   # a Monday
    w2 = w1 + dt.timedelta(days=7)
    for u in (1, 2):
        rows.append((eid, w1 + dt.timedelta(hours=u), u, "view", 1.0, "{}")); eid += 1
    for u in (1, 3):
        rows.append((eid, w2 + dt.timedelta(hours=u), u, "view", 1.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = sorted(QUERIES["q_users_new_returning"](spark, str(tmp_path)).collect(),
                 key=lambda r: r.week)
    assert (out[0].active_users, out[0].new_users, out[0].returning_users) == (2, 2, 0)
    assert (out[1].active_users, out[1].new_users, out[1].returning_users) == (2, 1, 1)
    assert out[1].new_share == 0.5


# ------------------------------------------------------- recursive CTEs


def test_recursive_drawdown_clamps_at_zero(spark, tmp_path):
    """User 1: +5, -10, +3 (one delta per WEEK) -> clamped path
    5000,0,3000 (final 3000, peak 5000); an unclamped prefix sum would
    end at -2000. User 2 stays positive so clamped == plain cumsum."""
    rows = []
    eid = 0
    base = dt.datetime(2024, 4, 1)
    for wk, (etype, val) in enumerate(
        [("purchase", 5.0), ("error", 10.0), ("purchase", 3.0)]
    ):
        rows.append((eid, base + dt.timedelta(weeks=wk), 1, etype, val, "{}")); eid += 1
    for wk, (etype, val) in enumerate(
        [("purchase", 4.0), ("error", 1.0), ("purchase", 2.0)]
    ):
        rows.append((eid, base + dt.timedelta(weeks=wk), 2, etype, val, "{}")); eid += 1
    # noise rows that must be ignored (other types, other users)
    rows.append((eid, base, 1, "view", 99.0, "{}")); eid += 1
    rows.append((eid, base, 99, "purchase", 99.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r.user_id: r for r in QUERIES["q_sql_recursive_drawdown"](spark, str(tmp_path)).collect()}
    assert out[1].n_periods == 3
    assert out[1].final_bal_milli == 3000   # clamped: NOT -2000
    assert out[1].peak_bal_milli == 5000
    assert out[2].final_bal_milli == 5000   # 4000 -> 3000 -> 5000
    assert out[2].peak_bal_milli == 5000


def test_recursive_bfs_hop_histogram_on_planted_path(spark, tmp_path):
    """Plant a 4-node path 0-1-2-3 (cos >= 0.4 only between neighbors):
    BFS from node 0 gives one node per hop 0..3."""
    # chain construction: v_i = a*e_i + b*e_{i+1} with a=0.5, b=sqrt(0.75)
    # -> cos(v_i, v_{i+1}) = a*b ~ 0.433 >= 0.4, cos(v_i, v_{i+2}) = 0
    a, b = 0.5, math.sqrt(0.75)
    d = 64
    rows = []
    for i in range(4):
        v = [0.0] * d
        v[2 * i] = a
        v[2 * i + 1] = b
        if i > 0:
            v[2 * i] = 0.0
            v[2 * i - 1] = a  # overlap with previous node's b-dim
            v[2 * i + 1] = b
        rows.append((i, v))
    _write(spark, tmp_path, "embeddings", rows, "vec_id long, embedding array<double>")
    out = {r.hop: r.n_nodes for r in QUERIES["q_sql_recursive_bfs"](spark, str(tmp_path)).collect()}
    assert out == {0: 1, 1: 1, 2: 1, 3: 1}


# ------------------------------------------------------- holt


def test_holt_recurrence_matches_reference(spark, tmp_path):
    """Weekly series 10,20,30,40 with clean +10 trend: Holt locks on
    (level=x, trend=10, forecast=x+10); check every step against the
    pure-Python recurrence."""
    weekly = [10, 20, 30, 40]
    rows = []
    eid = 0
    base = dt.datetime(2024, 4, 1)  # Monday
    for wk, cnt in enumerate(weekly):
        for j in range(cnt):
            rows.append((eid, base + dt.timedelta(weeks=wk, minutes=j), 1, "click", 1.0, "{}"))
            eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = sorted(QUERIES["q_ts_holt"](spark, str(tmp_path)).collect(), key=lambda r: r.week)
    l, b = float(weekly[0]), float(weekly[1] - weekly[0])
    ref = [(l, b)]
    for x in weekly[1:]:
        nl = 0.2 * x + 0.8 * (l + b)
        b = 0.1 * (nl - l) + 0.9 * b
        l = nl
        ref.append((l, b))
    assert len(out) == 4
    for row, (rl, rb) in zip(out, ref):
        assert abs(row.level - round(rl, 6)) < 1e-9
        assert abs(row.trend - round(rb, 6)) < 1e-9
        assert abs(row.forecast_next - round(rl + rb, 6)) < 1e-9
    # a perfectly linear series is tracked exactly by the init state
    assert out[0].trend == 10.0 and out[-1].forecast_next == 50.0


# ------------------------------------------------------- fifo allocation


def test_fifo_allocation_one_partial_per_customer(spark, tmp_path):
    """Customer 1: orders 100, 200, 300 (by date); budget = 480 (80% of
    600): order1 full, order2 full, order3 partial 180. Conservation:
    paid total == budget."""
    base = dt.date(2024, 1, 1)
    orders = [
        (10, 1, 100.0, "O", base),
        (11, 1, 200.0, "O", base + dt.timedelta(days=1)),
        (12, 1, 300.0, "O", base + dt.timedelta(days=2)),
    ]
    _write(spark, tmp_path, "orders", orders,
           "o_orderkey long, o_custkey long, o_totalprice double, "
           "o_orderstatus string, o_orderdate date")
    rows = {r.status: r for r in QUERIES["q_fifo_allocation"](spark, str(tmp_path)).collect()}
    assert rows["full"].n_orders == 2
    assert rows["full"].paid_cents == 30000
    assert rows["partial"].n_orders == 1
    assert rows["partial"].paid_cents == 18000  # 48000 budget - 30000
    assert "unpaid" not in rows
    assert sum(r.paid_cents for r in rows.values()) == 48000


# ------------------------------------------------------- max drawdown


def test_max_drawdown_peak_to_trough(spark, tmp_path):
    """Equity path +10, -4, -3, +20 -> peak 10, trough 3 => dd 7000
    milli; a monotonic user has zero drawdown and is filtered out."""
    rows = []
    eid = 0
    base = dt.datetime(2024, 4, 1)
    path = [("purchase", 10.0), ("error", 4.0), ("error", 3.0), ("purchase", 20.0)]
    for day, (etype, v) in enumerate(path):
        rows.append((eid, base + dt.timedelta(days=day), 1, etype, v, "{}")); eid += 1
    for day in range(3):
        rows.append((eid, base + dt.timedelta(days=day), 2, "purchase", 5.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r.user_id: r for r in QUERIES["q_max_drawdown"](spark, str(tmp_path)).collect()}
    assert out[1].max_drawdown_milli == 7000
    assert 2 not in out  # monotonic equity: no drawdown


# ------------------------------------------------------- batch 7


def test_attribution_position_credits_sum_to_10000_per_user(spark, tmp_path):
    """k=5 touches: first/last 4000 each, three middles get 666/667/667
    by the earliest-remainder rule -> per-user total exactly 10000."""
    rows = []
    eid = 0
    base = dt.datetime(2024, 4, 1)
    # user 1: five pre-purchase touches of distinct types, then purchase
    for i, etype in enumerate(["view", "click", "view", "signup", "error"]):
        rows.append((eid, base + dt.timedelta(minutes=i), 1, etype, 1.0, "{}")); eid += 1
    rows.append((eid, base + dt.timedelta(minutes=9), 1, "purchase", 1.0, "{}")); eid += 1
    # user 2: single touch -> full 10000
    rows.append((eid, base, 2, "click", 1.0, "{}")); eid += 1
    rows.append((eid, base + dt.timedelta(minutes=1), 2, "purchase", 1.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r.event_type: r for r in QUERIES["q_attribution_position"](spark, str(tmp_path)).collect()}
    total = sum(r.credit_bp for r in out.values())
    assert total == 20000  # two converting users x 10000
    # user1 middles i=2,3,4 get 2000 div 3 = 666, remainder 2000%3=2
    # goes to the EARLIEST middles i=2 (click) and i=3 (view)
    assert out["view"].credit_bp == 4000 + 667
    assert out["click"].credit_bp == 667 + 10000  # user1 middle + user2 single
    assert out["signup"].credit_bp == 666
    assert out["error"].credit_bp == 4000  # last touch
    assert "purchase" not in out  # conversions are not touches


def test_jaccard_neighbors_planted_twins(spark, tmp_path):
    """Nodes 1 and 2 are both linked to hub 0 only (no 1-2 edge):
    neighbor sets identical -> jaccard 1.0 and is_edge 0."""
    d = 64
    a, b = 0.5, math.sqrt(0.75)

    def vec(pairs_):
        v = [0.0] * d
        for i, x in pairs_:
            v[i] = x
        return v

    rows = [
        (0, vec([(0, 1.0)])),
        (1, vec([(0, a), (1, b)])),
        (2, vec([(0, a), (2, b)])),
    ]
    # cos(1,2) = 0.25 < 0.4 (no edge); cos(0,1) = cos(0,2) = 0.5
    _write(spark, tmp_path, "embeddings", rows, "vec_id long, embedding array<double>")
    out = QUERIES["q_graph_jaccard_neighbors"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.a, r.b) == (1, 2)
    assert r.jaccard == 1.0 and r.is_edge == 0 and r.common == 1


def test_activity_heatmap_iso_dow_and_shares(spark, tmp_path):
    """2024-04-01 is a Monday -> dow 1; shares sum to 1."""
    rows = []
    eid = 0
    mon = dt.datetime(2024, 4, 1, 10)   # Monday 10:00
    sun = dt.datetime(2024, 4, 7, 23)   # Sunday 23:00
    for _ in range(3):
        rows.append((eid, mon, 1, "view", 1.0, "{}")); eid += 1
    rows.append((eid, sun, 1, "view", 1.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = QUERIES["q_activity_heatmap"](spark, str(tmp_path)).collect()
    cells = {(r.dow, r.hour): r for r in out}
    assert cells[(1, 10)].n_events == 3
    assert cells[(7, 23)].n_events == 1
    assert cells[(1, 10)].share == 0.75
    assert abs(sum(r.share for r in out) - 1.0) < 1e-9


# ------------------------------------------------------- batch 8


def test_ts_decompose_planted_weekly_pattern(spark, tmp_path):
    """21 days: x = 10 except Mondays x = 17. CMA-7 trend is constant 11,
    so the seasonal index must be +6 on Monday and -1 elsewhere."""
    rows = []
    eid = 0
    base = dt.datetime(2024, 4, 1)  # a Monday
    for day in range(21):
        cnt = 17 if day % 7 == 0 else 10
        for j in range(cnt):
            rows.append((eid, base + dt.timedelta(days=day, minutes=j), 1, "view", 1.0, "{}"))
            eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r.dow: r for r in QUERIES["q_ts_decompose"](spark, str(tmp_path)).collect()}
    assert out[1].seasonal == 6.0
    for dow in range(2, 8):
        assert out[dow].seasonal == -1.0
    # edge days (first/last 3) excluded -> interior count per dow
    assert sum(r.n_days for r in out.values()) == 15


def test_share_of_parent_two_level(spark, tmp_path):
    regions = [(1, "EU"), (2, "US")]
    nations = [(1, "DE", 1), (2, "FR", 1), (3, "NY", 2)]
    custs = [(1, 1), (2, 2), (3, 3)]
    orders = [(1, 1, 100.0), (2, 2, 300.0), (3, 3, 600.0)]
    _write(spark, tmp_path, "region", regions, "r_regionkey long, r_name string")
    _write(spark, tmp_path, "nation", nations,
           "n_nationkey long, n_name string, n_regionkey long")
    _write(spark, tmp_path, "customer", custs, "c_custkey long, c_nationkey long")
    _write(spark, tmp_path, "orders", orders,
           "o_orderkey long, o_custkey long, o_totalprice double")
    out = {(r.region, r.nation): r for r in QUERIES["q_share_of_parent"](spark, str(tmp_path)).collect()}
    assert out[("EU", "DE")].share_of_region == 0.25
    assert out[("EU", "FR")].share_of_region == 0.75
    assert out[("US", "NY")].share_of_region == 1.0
    assert out[("US", "NY")].share_of_total == 0.6
    assert out[("EU", "DE")].share_of_total == 0.1


# ------------------------------------------------------- batch 9


def test_tokenizer_fertility_counts_punct_as_tokens(spark, tmp_path):
    """'hi, there!' = 2 whitespace words but 4 regex tokens (hi , there !)
    -> fertility 2.0; a punct-free doc has fertility 1.0."""
    docs = [
        (1, "hi, there!", "en", "s", 10),
        (2, "one two three", "de", "s", 13),
    ]
    _write(spark, tmp_path, "documents", docs, _DOC_SCHEMA)
    out = {r.lang: r for r in QUERIES["q_tokenizer_fertility"](spark, str(tmp_path)).collect()}
    assert (out["en"].n_words, out["en"].n_tokens) == (2, 4)
    assert out["en"].fertility == 2.0
    assert out["de"].fertility == 1.0


def test_embedding_centroid_dist_planted_offset(spark, tmp_path):
    """Source A vectors average to the origin, source B to (3,4,0,...):
    centroid L2 must be exactly 5."""
    d = 64

    def vec(x, y):
        v = [0.0] * d
        v[0], v[1] = x, y
        return v

    embs = [
        (1, vec(1.0, 0.0)), (2, vec(-1.0, 0.0)),      # A centroid (0,0)
        (3, vec(3.0, 4.0)), (4, vec(3.0, 4.0)),       # B centroid (3,4)
    ]
    docs = [(1, "x", "en", "A", 1), (2, "x", "en", "A", 1),
            (3, "x", "en", "B", 1), (4, "x", "en", "B", 1)]
    _write(spark, tmp_path, "embeddings", embs, "vec_id long, embedding array<double>")
    _write(spark, tmp_path, "documents", docs, _DOC_SCHEMA)
    out = QUERIES["q_embedding_centroid_dist"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert (out[0].src_a, out[0].src_b) == ("A", "B")
    assert out[0].centroid_l2 == 5.0


# ------------------------------------------------------- batch 10


def test_cuped_reduces_to_plain_mean_when_uncorrelated_and_balanced(spark, tmp_path):
    """When every user has identical pre (var>0 needed, so use two pre
    levels distributed identically across arms), the arm adjustment
    shifts by theta*(pre_arm - pre_all) = 0 -> cuped mean == plain mean."""
    rows = []
    eid = 0
    base = dt.datetime(2024, 4, 1)
    # users chosen so md5 assigns some to each arm; give every user
    # pre=10.0 on day 1 and post=their user-specific value on day 20
    posts = {1: 4.0, 2: 8.0, 3: 6.0, 4: 2.0, 5: 10.0, 6: 12.0}
    for u, pv in posts.items():
        rows.append((eid, base + dt.timedelta(days=1), u, "purchase", 10.0, "{}")); eid += 1
        rows.append((eid, base + dt.timedelta(days=20), u, "purchase", pv, "{}")); eid += 1
    # stretch the span to 30 days so the 15-day cutoff splits pre/post
    rows.append((eid, base + dt.timedelta(days=29), 999, "view", 1.0, "{}")); eid += 1
    rows.append((eid, base, 998, "view", 1.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = QUERIES["q_ab_cuped"](spark, str(tmp_path)).collect()
    assert {r.arm for r in out} == {"A", "B"}
    for r in out:
        # identical pre for all purchasers; viewers have pre=post=0, so
        # theta*(pre_arm - pre_all) = 0 exactly within each arm only if
        # arm pre-mix equals global pre-mix -- not guaranteed; instead
        # assert the identity mean_cuped = mean_post - theta*(pre_arm-pre_all)
        assert r.mean_post_cuped is not None
    total_users = sum(r.n_users for r in out)
    assert total_users == 8  # 6 purchasers + 2 viewers


def test_forecast_backtest_exact_on_planted_series(spark, tmp_path):
    """Daily counts 1..10: naive MAE = 1 exactly (constant +1 trend);
    seasonal-naive over a 7-day lag has 3 evals with error 7."""
    rows = []
    eid = 0
    base = dt.datetime(2024, 4, 1)
    for day in range(10):
        for j in range(day + 1):
            rows.append((eid, base + dt.timedelta(days=day, minutes=j), 1, "view", 1.0, "{}"))
            eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r.model: r for r in QUERIES["q_forecast_backtest"](spark, str(tmp_path)).collect()}
    assert out["naive"].n_evals == 9 and out["naive"].mae == 1.0
    assert out["seasonal_naive"].n_evals == 3 and out["seasonal_naive"].mae == 7.0


def test_powerlaw_alpha_exact_on_planted_zipf(spark, tmp_path):
    """freq(rank) = round(1000 / rank) for 5 words: the log-log OLS
    slope must match a quantized pure-Python reference exactly."""
    freqs = [round(1000 / r) for r in range(1, 6)]
    text = " ".join(
        " ".join([f"w{r}"] * f) for r, f in enumerate(freqs, start=1)
    )
    _write(spark, tmp_path, "documents", [(1, text, "en", "s", len(text))], _DOC_SCHEMA)
    out = QUERIES["q_text_powerlaw_fit"](spark, str(tmp_path)).collect()[0]
    pts = [(round(math.log(r) * 1e6), round(math.log(f) * 1e6))
           for r, f in enumerate(freqs, start=1)]
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert out.n_points == 5
    assert abs(out.zipf_alpha - round(-slope, 6)) < 1e-9
    assert 0.9 < out.zipf_alpha < 1.1  # planted 1/rank law


def test_pipe_syntax_equals_classic_formulation(spark, tmp_path):
    """The |> pipeline must produce byte-identical results to the
    classic GROUP BY + HAVING statement of the same query."""
    rows = [(float(q), 0.1, 0.0, 100.0 * q, "N" if q % 2 else "R")
            for q in range(1, 41)]
    _write(spark, tmp_path, "lineitem",
           [(q, d, t, p, rf, "O") for q, d, t, p, rf in rows],
           "l_quantity double, l_discount double, l_tax double, "
           "l_extendedprice double, l_returnflag string, l_linestatus string")
    got = QUERIES["q_sql_pipe_syntax"](spark, str(tmp_path)).collect()
    # register our own view rather than piggybacking on the query's
    # internal (sf-digest-suffixed) registration — the side-effect name
    # is an implementation detail
    spark.read.parquet(f"{tmp_path}/lineitem.parquet").createOrReplaceTempView(
        "__pipe_ref_lineitem"
    )
    ref = spark.sql("""
        SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM __pipe_ref_lineitem WHERE l_quantity >= 10
        GROUP BY l_returnflag, l_linestatus HAVING count(*) >= 10
        ORDER BY l_returnflag, l_linestatus
    """).collect()
    spark.catalog.dropTempView("__pipe_ref_lineitem")
    assert got == ref and len(got) >= 1


# ------------------------------------------------------- batch 11


_LI_FULL_SCHEMA = (
    "l_partkey long, l_quantity double, l_discount double, l_tax double, "
    "l_extendedprice double, l_returnflag string, l_linestatus string, "
    "l_shipdate timestamp"
)


def test_price_index_pure_inflation(spark, tmp_path):
    """Every basket part's unit price doubles at equal quantities ->
    Laspeyres = Paasche = Fisher = 2. A part present only in one
    period must be excluded from the basket."""
    rows = []
    d95 = dt.datetime(1995, 6, 1)
    d00 = dt.datetime(2000, 6, 1)
    for pk in (1, 2, 3):
        rows.append((pk, 10.0, 0.0, 0.0, 100.0 * pk, "N", "O", d95))
        rows.append((pk, 10.0, 0.0, 0.0, 200.0 * pk, "N", "O", d00))
    rows.append((99, 5.0, 0.0, 0.0, 500.0, "N", "O", d95))  # base-only part
    _write(spark, tmp_path, "lineitem", rows, _LI_FULL_SCHEMA)
    out = QUERIES["q_price_index"](spark, str(tmp_path)).collect()[0]
    assert out.n_basket_parts == 3
    assert out.laspeyres == 2.0 and out.paasche == 2.0 and out.fisher == 2.0


def test_hhi_monopoly_and_uniform(spark, tmp_path):
    """Segment M: one customer -> HHI 1, n_eff 1. Segment U: four equal
    customers -> HHI 0.25, n_eff 4."""
    custs = [(1, "M"), (2, "U"), (3, "U"), (4, "U"), (5, "U")]
    orders = [(1, 1, 500.0)] + [(k, k, 100.0) for k in (2, 3, 4, 5)]
    _write(spark, tmp_path, "customer", custs, _CUST_SCHEMA)
    _write(spark, tmp_path, "orders", orders, _ORD_SCHEMA)
    out = {r.segment: r for r in QUERIES["q_concentration_hhi"](spark, str(tmp_path)).collect()}
    assert out["M"].hhi == 1.0 and out["M"].n_effective == 1.0
    assert out["U"].hhi == 0.25 and out["U"].n_effective == 4.0


def test_psi_identical_distributions_is_zero(spark, tmp_path):
    """Same value mix in both periods -> every psi term 0."""
    rows = []
    ok = 0
    for year in (1996, 1999):
        for v in (100.0, 200.0, 300.0, 400.0):
            for _ in range(5):
                ok += 1
                rows.append((ok, 1, v, "O", dt.date(year, 3, 1)))
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey long, o_custkey long, o_totalprice double, "
           "o_orderstatus string, o_orderdate date")
    out = QUERIES["q_psi_stability"](spark, str(tmp_path)).collect()
    assert sum(abs(r.psi_term) for r in out) == 0.0
    assert sum(r.n_base for r in out) == 20 and sum(r.n_curr for r in out) == 20


def test_psi_detects_shift(spark, tmp_path):
    """Values move from the low bucket to the high bucket across
    periods -> positive PSI mass in both moved buckets."""
    rows = []
    ok = 0
    for _ in range(20):
        ok += 1; rows.append((ok, 1, 100.0, "O", dt.date(1996, 3, 1)))
    for _ in range(20):
        ok += 1; rows.append((ok, 1, 1000.0, "O", dt.date(1999, 3, 1)))
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey long, o_custkey long, o_totalprice double, "
           "o_orderstatus string, o_orderdate date")
    out = QUERIES["q_psi_stability"](spark, str(tmp_path)).collect()
    total = sum(r.psi_term for r in out)
    assert total > 1.0  # massive shift


def test_bootstrap_se_sanity_and_determinism(spark, tmp_path):
    """SE of the mean from the Poisson bootstrap must sit near
    sigma/sqrt(n) for an iid sample, and rerunning must be bit-identical
    (content-addressed weights, no RNG)."""
    import statistics
    vals = [100.0 + (i % 10) * 50.0 for i in range(200)]
    rows = [(i, 1, v) for i, v in enumerate(vals)]
    _write(spark, tmp_path, "orders", rows, _ORD_SCHEMA)
    out1 = QUERIES["q_sample_bootstrap_se"](spark, str(tmp_path)).collect()[0]
    out2 = QUERIES["q_sample_bootstrap_se"](spark, str(tmp_path)).collect()[0]
    assert out1 == out2  # deterministic
    assert out1.n_orders == 200 and out1.n_replicates == 20
    assert out1.mean_price == round(sum(vals) / len(vals), 4)
    analytic = statistics.pstdev(vals) / math.sqrt(len(vals))
    # 20 replicates is noisy: allow a factor-2 band around sigma/sqrt(n)
    assert analytic / 2 < out1.boot_se_price < analytic * 2


def test_jackknife_matches_reference(spark, tmp_path):
    """Exact delete-one-group jackknife on a tiny fixture vs pure
    Python with the same micro-cent quantization."""
    vals = [(i, 1, float(100 + 7 * (i % 13))) for i in range(60)]
    _write(spark, tmp_path, "orders", vals, _ORD_SCHEMA)
    out = QUERIES["q_jackknife_groups"](spark, str(tmp_path)).collect()[0]
    cents = {i: round(v * 100) for i, _, v in vals}
    S = sum(cents.values()); N = len(cents)
    groups = {}
    for i, c in cents.items():
        groups.setdefault(i % 20, []).append(c)
    e6 = [round((S - sum(cs)) * 1e6 / (N - len(cs))) for cs in groups.values()]
    G = len(e6)
    mean_e6 = sum(e6) / G
    se = math.sqrt((G - 1) / G * sum((x - mean_e6) ** 2 for x in e6)) / 1e6 / 100
    assert out.n_groups == G and out.n_orders == 60
    assert abs(out.jk_se_price - round(se, 4)) < 1e-9


def test_mann_kendall_monotone_series(spark, tmp_path):
    """Strictly increasing daily counts -> S = n(n-1)/2, verdict
    'increasing'; a constant series -> S = 0, 'no_trend'."""
    rows = []
    eid = 0
    base = dt.datetime(2024, 4, 1)
    for day in range(10):
        for j in range(day + 1):
            rows.append((eid, base + dt.timedelta(days=day, minutes=j), 1, "view", 1.0, "{}"))
            eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = QUERIES["q_stat_mann_kendall"](spark, str(tmp_path)).collect()[0]
    assert out.s_stat == 45  # all 45 pairs concordant
    assert out.verdict == "increasing"
    rows2 = []
    eid = 0
    for day in range(10):
        for j in range(3):
            rows2.append((eid, base + dt.timedelta(days=day, minutes=j), 1, "view", 1.0, "{}"))
            eid += 1
    _write(spark, tmp_path, "events", rows2, _EV_SCHEMA)
    out2 = QUERIES["q_stat_mann_kendall"](spark, str(tmp_path)).collect()[0]
    assert out2.s_stat == 0 and out2.verdict == "no_trend" and out2.z == 0.0


# ------------------------------------------------------- batch 13


def test_bayes_shrinkage_pulls_small_samples_to_prior(spark, tmp_path):
    """Small sample at an extreme rate shrinks strongly toward the
    prior mean; a large sample barely moves."""
    parts = [(i, f"p{i}", f"Brand#{i}", "t", 1, 1.0) for i in range(1, 7)]
    _write(spark, tmp_path, "part", parts,
           "p_partkey long, p_name string, p_brand string, p_type string, "
           "p_size int, p_retailprice double")
    li = []
    # four medium brands around 20-30% set the prior
    for pk, (k, n) in {1: (20, 100), 2: (30, 100), 3: (25, 100), 4: (25, 100)}.items():
        li += [(pk, "R" if j < k else "N") for j in range(n)]
    li += [(5, "R"), (5, "R")]                      # tiny brand, raw rate 1.0
    li += [(6, "R" if j < 500 else "N") for j in range(1000)]  # big, rate 0.5
    _write(spark, tmp_path, "lineitem",
           [(pk, 1.0, 0.0, 0.0, 100.0, rf) for pk, rf in li],
           "l_partkey long, l_quantity double, l_discount double, l_tax double, "
           "l_extendedprice double, l_returnflag string")
    rows = {r.brand: r for r in QUERIES["q_bayes_shrunk_rates"](spark, str(tmp_path)).collect()}
    tiny, big = rows["Brand#5"], rows["Brand#6"]
    assert tiny.raw_rate == 1.0
    assert tiny.shrunk_rate < 0.9           # pulled toward the prior
    assert tiny.raw_rate - tiny.shrunk_rate > 5 * (big.raw_rate - big.shrunk_rate)
    assert abs(big.shrunk_rate - big.raw_rate) < 0.05  # big sample holds


def test_durbin_watson_alternating_vs_trend(spark, tmp_path):
    """Residuals of a pure linear series are ~0 -> skip; instead: an
    alternating series around a flat trend has DW near 4 (negative
    autocorrelation), a slow sine-like drift has DW near 0."""
    rows = []
    eid = 0
    base = dt.datetime(2024, 4, 1)
    alt = [10, 20] * 7  # alternating, flat trend
    for day, cnt in enumerate(alt):
        for j in range(cnt):
            rows.append((eid, base + dt.timedelta(days=day, minutes=j), 1, "view", 1.0, "{}"))
            eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = QUERIES["q_stat_durbin_watson"](spark, str(tmp_path)).collect()[0]
    assert out.n_days == 14
    assert out.dw > 3.0  # alternating residuals -> DW -> 4
    rows2 = []
    eid = 0
    drift = [10] * 7 + [30] * 7  # level shift: positively autocorrelated residuals
    for day, cnt in enumerate(drift):
        for j in range(cnt):
            rows2.append((eid, base + dt.timedelta(days=day, minutes=j), 1, "view", 1.0, "{}"))
            eid += 1
    _write(spark, tmp_path, "events", rows2, _EV_SCHEMA)
    out2 = QUERIES["q_stat_durbin_watson"](spark, str(tmp_path)).collect()[0]
    assert out2.dw < 1.5  # positive residual autocorrelation


# ------------------------------------------------------- batch 14


def test_growth_accounting_identity_and_classes(spark, tmp_path):
    """Three months, four customers exercising every class; the
    ending = starting + sum(components) identity must hold exactly."""
    d = dt.date
    orders = [
        # cust 1: new in Jan (100), expands in Feb (150), churns in Mar
        (1, 1, 100.0, d(2024, 1, 5)), (2, 1, 150.0, d(2024, 2, 5)),
        # cust 2: new in Jan (200), contracts in Feb (80), holds in Mar (80)
        (3, 2, 200.0, d(2024, 1, 6)), (4, 2, 80.0, d(2024, 2, 6)),
        (5, 2, 80.0, d(2024, 3, 6)),
        # cust 3: new in Feb (50)
        (6, 3, 50.0, d(2024, 2, 7)),
        # cust 4: new in Jan (30), absent Feb, resurrects in Mar (40)
        (7, 4, 30.0, d(2024, 1, 8)), (8, 4, 40.0, d(2024, 3, 8)),
    ]
    _write(spark, tmp_path, "orders", orders,
           "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate date")
    out = {r.month.isoformat(): r for r in QUERIES["q_growth_accounting"](spark, str(tmp_path)).collect()}
    jan, feb, mar = out["2024-01-01"], out["2024-02-01"], out["2024-03-01"]
    assert jan.new_cents == 33000 and jan.starting_cents == 0
    assert feb.new_cents == 5000          # cust 3
    assert feb.expansion_cents == 5000    # cust 1: 100 -> 150
    assert feb.contraction_cents == -12000  # cust 2: 200 -> 80
    assert feb.churned_cents == -3000     # cust 4 absent
    assert mar.resurrected_cents == 4000  # cust 4 returns
    assert mar.churned_cents == -20000    # cust 1 (150) and cust 3 (50) gone
    for r in (jan, feb, mar):
        assert r.ending_cents == (r.starting_cents + r.new_cents
                                  + r.resurrected_cents + r.expansion_cents
                                  + r.contraction_cents + r.churned_cents)


def test_delta_method_zero_variance_ratio(spark, tmp_path):
    """Every customer has identical (x, y) -> residuals x*D - N*y = 0
    -> SE exactly 0; heterogeneous customers -> SE > 0."""
    orders = [(i, i // 2, 100.0) for i in range(2, 12)]  # 5 custs x 2 orders
    _write(spark, tmp_path, "orders", orders, _ORD_SCHEMA)
    out = QUERIES["q_delta_method_ratio"](spark, str(tmp_path)).collect()[0]
    assert out.rev_per_order == 100.0 and out.se_delta == 0.0
    orders2 = [(1, 1, 100.0), (2, 2, 100.0), (3, 2, 500.0)]
    _write(spark, tmp_path, "orders", orders2, _ORD_SCHEMA)
    out2 = QUERIES["q_delta_method_ratio"](spark, str(tmp_path)).collect()[0]
    assert out2.se_delta > 0


# ------------------------------------------------------- batch 15


def test_grouped_regression_exact_lines(spark, tmp_path):
    """Brand A: y = 200x exactly (slope 2 dollars, R2 = 1); brand B:
    y constant (slope 0, R2 = 0)."""
    parts = [(1, "p1", "Brand#A", "t", 1, 1.0), (2, "p2", "Brand#B", "t", 1, 1.0)]
    _write(spark, tmp_path, "part", parts,
           "p_partkey long, p_name string, p_brand string, p_type string, "
           "p_size int, p_retailprice double")
    li = [(1, float(x), 0.0, 0.0, 2.0 * x, "N") for x in range(1, 11)]
    li += [(2, float(x), 0.0, 0.0, 500.0, "N") for x in range(1, 11)]
    _write(spark, tmp_path, "lineitem", li,
           "l_partkey long, l_quantity double, l_discount double, l_tax double, "
           "l_extendedprice double, l_returnflag string")
    out = {r.brand: r for r in QUERIES["q_grouped_regression"](spark, str(tmp_path)).collect()}
    assert out["Brand#A"].slope_dollars == 2.0
    assert out["Brand#A"].intercept_dollars == 0.0
    assert out["Brand#A"].r2 == 1.0
    assert out["Brand#B"].slope_dollars == 0.0 and out["Brand#B"].r2 == 0.0


def test_target_encoding_loo_excludes_own_label(spark, tmp_path):
    """Brand with labels [1, 0, 0, 1]: the y=1 rows encode (2-1)/3 and
    the y=0 rows (2-0)/3 — never the naive 0.5."""
    parts = [(1, "p1", "Brand#A", "t", 1, 1.0)]
    _write(spark, tmp_path, "part", parts,
           "p_partkey long, p_name string, p_brand string, p_type string, "
           "p_size int, p_retailprice double")
    flags = ["R", "N", "N", "R"]
    li = [(ok, 1, 1, float(ok), 0.0, 0.0, 100.0, rf)
          for ok, rf in enumerate(flags, start=1)]
    _write(spark, tmp_path, "lineitem", li,
           "l_orderkey long, l_partkey long, l_linenumber long, l_quantity double, "
           "l_discount double, l_tax double, l_extendedprice double, "
           "l_returnflag string")
    out = QUERIES["q_target_encoding_loo"](spark, str(tmp_path)).collect()
    enc = {r.l_orderkey: r.te_loo for r in out}
    assert enc[1] == round(1 / 3, 6) and enc[4] == round(1 / 3, 6)   # y=1 rows
    assert enc[2] == round(2 / 3, 6) and enc[3] == round(2 / 3, 6)   # y=0 rows


def test_cluster_update_step_planted_means(spark, tmp_path):
    """Two tight planted clusters: the update step must produce each
    cluster's exact mean vector (checked via the L1-norm summary)."""
    d = 64

    def vec(v0, v1):
        v = [0.0] * d
        v[0], v[1] = v0, v1
        return v

    rows = [
        (0, vec(1.0, 0.0)), (1, vec(0.0, 1.0)),       # seed centroids 0,1
        (4, vec(1.2, 0.0)), (5, vec(0.8, 0.0)),       # near centroid 0
        (6, vec(0.0, 1.4)), (7, vec(0.0, 0.6)),       # near centroid 1
    ]
    _write(spark, tmp_path, "embeddings", rows, "vec_id long, embedding array<double>")
    out = {r.centroid_id: r for r in QUERIES["q_cluster_update_step"](spark, str(tmp_path)).collect()}
    # cluster 0 members: {0, 4, 5} -> mean (1.0, 0, ...) ; L1 = 1.0
    assert out[0].n_members == 3 and out[0].l1_norm_e6 == 1000000
    assert out[0].head4_coord_sum == 1.0
    # cluster 1 members: {1, 6, 7} -> mean (0, 1.0, ...) ; L1 = 1.0
    assert out[1].n_members == 3 and out[1].l1_norm_e6 == 1000000


# ------------------------------------------------------- batch 16


def test_calendar_dim_flags(spark, tmp_path):
    orders = [(1, 1, 100.0, "O", dt.date(2024, 2, 10)),
              (2, 1, 100.0, "O", dt.date(2024, 3, 20))]
    _write(spark, tmp_path, "orders", orders,
           "o_orderkey long, o_custkey long, o_totalprice double, "
           "o_orderstatus string, o_orderdate date")
    rows = {r.cal_date.isoformat(): r for r in QUERIES["q_calendar_dim"](spark, str(tmp_path)).collect()}
    assert "2024-02-01" in rows and "2024-03-31" in rows  # month-aligned span
    assert len(rows) == 29 + 31
    leap = rows["2024-02-29"]
    assert leap.is_month_end == 1 and leap.dow_iso == 4  # Thursday
    sat = rows["2024-03-02"]
    assert sat.is_weekend == 1 and sat.quarter == 1


def test_ship_latency_exact_percentiles(spark, tmp_path):
    """Ten lines with latencies 1..10 days: lower-discrete p25/p50/p75/
    p95 = 3/5/8/10."""
    orders = [(k, 1, 100.0, "O", dt.date(2024, 1, 1), "1-URGENT") for k in range(1, 11)]
    _write(spark, tmp_path, "orders", orders,
           "o_orderkey long, o_custkey long, o_totalprice double, "
           "o_orderstatus string, o_orderdate date, o_orderpriority string")
    li = [(k, 1, 1.0, 0.0, 0.0, 100.0, "N",
           dt.datetime(2024, 1, 1) + dt.timedelta(days=k)) for k in range(1, 11)]
    _write(spark, tmp_path, "lineitem", li,
           "l_orderkey long, l_partkey long, l_quantity double, l_discount double, "
           "l_tax double, l_extendedprice double, l_returnflag string, "
           "l_shipdate timestamp")
    out = QUERIES["q_ship_latency"](spark, str(tmp_path)).collect()[0]
    assert (out.p25_days, out.p50_days, out.p75_days, out.p95_days) == (3, 5, 8, 10)


def test_code_detect_separates_code_from_prose(spark, tmp_path):
    code = "def f(x):\n    return {x: [1, 2]} if x else None\nimport os\nclass A: pass"
    prose = "The quick brown fox jumps over the lazy dog near the river bank today"
    docs = [(1, code, "en", "github", len(code)),
            (2, prose, "en", "web", len(prose)),
            (3, prose, "en", "github", len(prose))]
    _write(spark, tmp_path, "documents", docs, _DOC_SCHEMA)
    out = {r.source: r for r in QUERIES["q_text_code_detect"](spark, str(tmp_path)).collect()}
    assert out["github"].n_codey == 1 and out["github"].codey_share == 0.5
    assert out["web"].n_codey == 0


# ------------------------------------------------------- batch 17


def test_cumulative_uniques_counts_first_seen_only(spark, tmp_path):
    """Users returning on later days must not inflate the cumulative
    curve; DAU still counts them."""
    rows = []
    eid = 0
    base = dt.datetime(2024, 4, 1)
    plan = {0: [1, 2], 1: [1, 3], 2: [1, 2, 3]}  # day -> active users
    for day, users in plan.items():
        for u in users:
            rows.append((eid, base + dt.timedelta(days=day), u, "view", 1.0, "{}"))
            eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = sorted(QUERIES["q_cumulative_uniques"](spark, str(tmp_path)).collect(),
                 key=lambda r: r.day)
    assert [(r.dau, r.new_users, r.cumulative_uniques) for r in out] == [
        (2, 2, 2), (2, 1, 3), (3, 0, 3)]


def test_power_mde_closed_form(spark, tmp_path):
    """Per-user values alternate 0/2000 milli-units -> known mean and
    sample variance; MDE must equal the closed form exactly."""
    rows = []
    eid = 0
    base = dt.datetime(2024, 4, 1)
    for u in range(1, 41):
        v = 2.0 if u % 2 == 0 else 0.001  # 2000 or 1 milli-unit
        rows.append((eid, base, u, "purchase", v, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = QUERIES["q_power_mde"](spark, str(tmp_path)).collect()[0]
    xs = [2000 if u % 2 == 0 else 1 for u in range(1, 41)]
    n = len(xs)
    mean = sum(xs) / n
    var = (n * sum(x * x for x in xs) - sum(xs) ** 2) / (n * (n - 1))
    mde = (1.96 + 0.8416) * math.sqrt(2 * var / (n / 2))
    assert out.n_users == 40
    assert abs(out.mde_abs - round(mde / 1000, 4)) < 1e-9
    assert abs(out.mde_rel - round(mde / mean, 6)) < 1e-9


# ------------------------------------------------------- batch 18


def test_windowed_funnel_enforces_order_and_window(spark, tmp_path):
    """User 1: clean view->click->purchase inside 24h (counts fully).
    User 2: purchase BEFORE click (stops at click). User 3: click
    25h after view (stops at view)."""
    rows = []
    eid = 0
    t0 = dt.datetime(2024, 4, 1, 10)
    h = dt.timedelta(hours=1)
    rows += [(1, t0, 1, "view"), (2, t0 + h, 1, "click"), (3, t0 + 2 * h, 1, "purchase")]
    rows += [(4, t0, 2, "view"), (5, t0 + 2 * h, 2, "purchase"), (6, t0 + 3 * h, 2, "click")]
    rows += [(7, t0, 3, "view"), (8, t0 + 25 * h, 3, "click")]
    evs = [(i, ts, u, et, 1.0, "{}") for i, ts, u, et in rows]
    _write(spark, tmp_path, "events", evs, _EV_SCHEMA)
    out = QUERIES["q_funnel_windowed"](spark, str(tmp_path)).collect()[0]
    assert out.reached_view == 3
    assert out.reached_click == 2      # users 1, 2 (user 3 outside 24h)
    assert out.reached_purchase == 1   # only user 1 (user 2's purchase preceded click)
    assert out.p_purchase_given_click == 0.5


def test_l28_histogram_counts_and_window(spark, tmp_path):
    """User 1 active 3 days, user 2 active 1 day, user 3 active only
    OUTSIDE the trailing 28 days (excluded)."""
    rows = []
    eid = 0
    anchor = dt.datetime(2024, 4, 30)
    for d in (0, 5, 10):
        rows.append((eid, anchor - dt.timedelta(days=d), 1, "view", 1.0, "{}")); eid += 1
    rows.append((eid, anchor - dt.timedelta(days=2), 2, "view", 1.0, "{}")); eid += 1
    rows.append((eid, anchor - dt.timedelta(days=40), 3, "view", 1.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r.active_days: r for r in QUERIES["q_engagement_l28"](spark, str(tmp_path)).collect()}
    assert out[3].n_users == 1 and out[1].n_users == 1
    assert sum(r.n_users for r in out.values()) == 2  # user 3 excluded
    assert out[1].user_share == 0.5


def test_corpus_diversity_extremes(spark, tmp_path):
    """Single-source language -> Simpson 0, H 0, effective 1; uniform
    two-source language -> Simpson and entropy at their closed forms."""
    docs = []
    did = 0
    for _ in range(6):
        docs.append((did, "x", "de", "only", 1)); did += 1
    for src in ("a", "b"):
        for _ in range(3):
            docs.append((did, "x", "en", src, 1)); did += 1
    _write(spark, tmp_path, "documents", docs, _DOC_SCHEMA)
    out = {r.lang: r for r in QUERIES["q_corpus_diversity"](spark, str(tmp_path)).collect()}
    de, en = out["de"], out["en"]
    assert de.simpson_d == 0.0 and de.shannon_nats == 0.0 and de.effective_sources == 1.0
    # en: n=6 in two cells of 3 -> D = 1 - 2*3*2/(6*5) = 0.6; H = ln 2
    assert en.simpson_d == 0.6
    assert abs(en.shannon_nats - round(math.log(2), 6)) < 2e-9
    assert abs(en.effective_sources - 2.0) < 1e-3


# ------------------------------------------------------- batch 20


def test_pvm_bridge_sums_to_delta(spark, tmp_path):
    """Pure price doubling at constant volume: all delta lands in the
    price effect, volume and cross are 0; the bridge identity holds."""
    rows = []
    d95, d00 = dt.datetime(1995, 6, 1), dt.datetime(2000, 6, 1)
    for pk in (1, 2):
        rows.append((pk, 10.0, 0.0, 0.0, 100.0 * pk, "N", "O", d95))
        rows.append((pk, 10.0, 0.0, 0.0, 200.0 * pk, "N", "O", d00))
    _write(spark, tmp_path, "lineitem", rows, _LI_FULL_SCHEMA)
    out = QUERIES["q_price_volume_mix"](spark, str(tmp_path)).collect()[0]
    assert out.delta_rev_cents == 30000
    assert out.price_effect_cents == 30000
    assert out.volume_effect_cents == 0 and out.cross_effect_cents == 0
    assert (out.price_effect_cents + out.volume_effect_cents
            + out.cross_effect_cents) == out.delta_rev_cents


def test_pvm_pure_volume(spark, tmp_path):
    """Quantity doubles at constant unit price: all delta is volume."""
    rows = [
        (1, 10.0, 0.0, 0.0, 100.0, "N", "O", dt.datetime(1995, 6, 1)),
        (1, 20.0, 0.0, 0.0, 200.0, "N", "O", dt.datetime(2000, 6, 1)),
    ]
    _write(spark, tmp_path, "lineitem", rows, _LI_FULL_SCHEMA)
    out = QUERIES["q_price_volume_mix"](spark, str(tmp_path)).collect()[0]
    assert out.volume_effect_cents == 10000
    assert out.price_effect_cents == 0 and out.cross_effect_cents == 0


def test_lorenz_curve_shape(spark, tmp_path):
    """20 customers, one whale with half the revenue: top decile share
    jumps; cumulative shares are monotone and end at 1."""
    orders = [(i, i, 100.0) for i in range(1, 20)] + [(20, 20, 1900.0)]
    _write(spark, tmp_path, "orders", orders, _ORD_SCHEMA)
    out = sorted(QUERIES["q_lorenz_curve"](spark, str(tmp_path)).collect(),
                 key=lambda r: r.decile)
    assert len(out) == 10 and all(r.n_customers == 2 for r in out)
    shares = [r.cum_rev_share for r in out]
    assert shares == sorted(shares) and shares[-1] == 1.0
    assert out[9].rev_cents == 10000 + 190000  # cust 19 + whale
    assert shares[8] == round((18 * 100) / 3800, 6)  # bottom 9 deciles


def test_lsh_threshold_sweep_monotonic(spark, sf_dir):
    """On the real corpus slice: truth counts shrink as the threshold
    rises, recall is non-decreasing (tighter pairs are easier for the
    sketch), and every count is internally consistent."""
    rows = sorted(QUERIES["q_audit_lsh_threshold_sweep"](spark, sf_dir).collect(),
                  key=lambda r: r.threshold)
    assert [r.threshold for r in rows] == [0.3, 0.4, 0.5, 0.6]
    truths = [r.n_truth for r in rows]
    assert truths == sorted(truths, reverse=True)
    for r in rows:
        assert 0 <= r.n_hits <= r.n_truth
        assert 0.0 <= r.recall <= 1.0
    recalls = [r.recall for r in rows if r.n_truth > 0]
    assert recalls == sorted(recalls)


def test_time_decay_favors_recent_touches(spark, tmp_path):
    """Touch 12h before conversion gets exactly half the weight of one
    at conversion-instant-minus-epsilon; per-user credits sum to 1."""
    rows = []
    t0 = dt.datetime(2024, 4, 2, 12)
    rows.append((1, t0 - dt.timedelta(hours=12), 1, "view", 1.0, "{}"))
    rows.append((2, t0 - dt.timedelta(microseconds=1), 1, "click", 1.0, "{}"))
    rows.append((3, t0, 1, "purchase", 1.0, "{}"))
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r.event_type: r for r in QUERIES["q_attribution_time_decay"](spark, str(tmp_path)).collect()}
    assert "purchase" not in out
    total = out["view"].credit + out["click"].credit
    assert abs(total - 1.0) < 2e-9
    # weights 0.5 vs ~1.0 -> click share 2/3, view 1/3
    assert abs(out["click"].credit - round(2 / 3, 6)) < 1e-6
    assert abs(out["view"].credit - round(1 / 3, 6)) < 1e-6
    assert out["click"].credit > out["view"].credit  # recency wins


def test_observe_metrics_match_direct_aggregates(spark, tmp_path):
    orders = [(1, 1, 100.0, "O"), (2, 1, 400000.0, "F"), (3, 1, 50.0, "X")]
    _write(spark, tmp_path, "orders", orders,
           "o_orderkey long, o_custkey long, o_totalprice double, "
           "o_orderstatus string")
    out = QUERIES["q_observe_inline_metrics"](spark, str(tmp_path)).collect()[0]
    assert out.n_rows == 3 and out.n_large == 1 and out.n_bad_status == 1
    assert out.total_cents == 10000 + 40000000 + 5000


def test_rolling_mad_flags_spike_not_level_shift_baseline(spark, tmp_path):
    """A single 10x spike against a stable baseline is flagged; the
    stable days are not; the spike cannot inflate its own window
    (frame excludes current day)."""
    rows = []
    eid = 0
    base = dt.datetime(2024, 4, 1)
    vals = [10.0] * 8 + [100.0] + [10.0] * 4  # spike on day 8
    # distinct per-day jitter so the rolling MAD is strictly positive
    # (an all-equal window has MAD 0 and is excluded by design)
    for day, v in enumerate(vals):
        vv = v + day * 0.01
        rows.append((eid, base + dt.timedelta(days=day), 1, "view", vv, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = QUERIES["q_anomaly_rolling_mad"](spark, str(tmp_path)).collect()
    days = {r.day for r in out}
    assert "2024-04-09" in days  # the spike (day index 8)
    assert all(r.daily_total > 50 for r in out if r.day == "2024-04-09")
    # no stable day before the spike is flagged
    assert not any(r.day < "2024-04-09" for r in out)


def test_cluster_labels_planted_topics(spark, tmp_path):
    """Two tight clusters whose documents use disjoint vocabularies:
    each cluster's top terms must come from its own vocabulary."""
    d = 64

    def vec(i, x=1.0):
        v = [0.0] * d
        v[i] = x
        return v

    embs = [(0, vec(0)), (1, vec(1)),             # seed centroids
            (4, vec(0, 0.9)), (5, vec(0, 1.1)),   # cluster 0
            (6, vec(1, 0.9)), (7, vec(1, 1.1))]   # cluster 1
    docs = [
        (0, "alpha beta alpha", "en", "s", 1), (1, "gamma delta gamma", "en", "s", 1),
        (4, "alpha beta beta", "en", "s", 1), (5, "alpha alpha beta", "en", "s", 1),
        (6, "gamma delta delta", "en", "s", 1), (7, "gamma gamma delta", "en", "s", 1),
    ]
    _write(spark, tmp_path, "embeddings", embs, "vec_id long, embedding array<double>")
    _write(spark, tmp_path, "documents", docs, _DOC_SCHEMA)
    out = QUERIES["q_cluster_labels"](spark, str(tmp_path)).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.centroid_id, []).append(r.term)
    assert set(by_cluster[0]) <= {"alpha", "beta"}
    assert set(by_cluster[1]) <= {"gamma", "delta"}


def test_sql_named_params_equals_literal_form(spark, tmp_path):
    rows = [(float(q), 0.01 * (q % 8), 0.0, 100.0 * q, "N" if q % 2 else "R", "O")
            for q in range(1, 61)]
    _write(spark, tmp_path, "lineitem", rows,
           "l_quantity double, l_discount double, l_tax double, "
           "l_extendedprice double, l_returnflag string, l_linestatus string")
    got = QUERIES["q_sql_named_params"](spark, str(tmp_path)).collect()
    spark.read.parquet(f"{tmp_path}/lineitem.parquet").createOrReplaceTempView(
        "__params_ref_lineitem"
    )
    ref = spark.sql("""
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS rev_cents
        FROM __params_ref_lineitem
        WHERE l_quantity >= 30 AND l_discount <= 0.05
        GROUP BY l_returnflag ORDER BY l_returnflag
    """).collect()
    spark.catalog.dropTempView("__params_ref_lineitem")
    assert got == ref and len(got) == 2


# --------------------------------------------- closed-form hardening


def test_cuped_theta_and_adjustment_match_reference(spark, tmp_path):
    """Exact CUPED reference: theta = cov/var over per-user (pre, post)
    milli-units, arm means adjusted by theta*(pre_arm - pre_all).
    md5 arms (precomputed): users 2,3,5,12 -> A; 1,4,6..11 -> B."""
    pre_post = {
        1: (10.0, 4.0), 2: (20.0, 9.0), 3: (30.0, 13.0), 4: (40.0, 18.0),
        5: (15.0, 8.0), 6: (25.0, 10.0), 7: (35.0, 16.0), 8: (5.0, 2.0),
        9: (12.0, 6.0), 10: (22.0, 11.0), 11: (32.0, 15.0), 12: (8.0, 3.0),
    }
    rows = []
    eid = 0
    base = dt.datetime(2024, 4, 1)
    for u, (pre, post) in pre_post.items():
        rows.append((eid, base + dt.timedelta(days=2), u, "purchase", pre, "{}")); eid += 1
        rows.append((eid, base + dt.timedelta(days=20), u, "purchase", post, "{}")); eid += 1
    # span anchors so the 15-day cutoff splits the two purchases
    rows.append((eid, base, 998, "view", 1.0, "{}")); eid += 1
    rows.append((eid, base + dt.timedelta(days=29), 999, "view", 1.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r.arm: r for r in QUERIES["q_ab_cuped"](spark, str(tmp_path)).collect()}

    import hashlib

    def arm_of(u):
        return "A" if hashlib.md5(f"ab:{u}".encode()).hexdigest()[0] < "8" else "B"

    arms = {u: arm_of(u) for u in list(pre_post) + [998, 999]}
    xs = {u: (round(p * 1000), round(q * 1000)) for u, (p, q) in pre_post.items()}
    xs[998] = (0, 0); xs[999] = (0, 0)
    n = len(xs)
    sx = sum(p for p, _ in xs.values()); sy = sum(q for _, q in xs.values())
    sxy = sum(p * q for p, q in xs.values()); sxx = sum(p * p for p, _ in xs.values())
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    mean_pre_all = sx / n
    for arm_name in ("A", "B"):
        users = [u for u in xs if arms[u] == arm_name]
        m_pre = sum(xs[u][0] for u in users) / len(users)
        m_post = sum(xs[u][1] for u in users) / len(users)
        want = (m_post - theta * (m_pre - mean_pre_all)) / 1000
        got = out[arm_name]
        assert got.n_users == len(users)
        assert abs(got.mean_post_cuped - round(want, 6)) < 1e-9


def test_durbin_watson_exact_reference(spark, tmp_path):
    """DW computed by the engine must equal the pure-Python value on a
    planted daily series (OLS residuals, scale-invariant ratio)."""
    ys = [10, 14, 9, 20, 13, 18, 11, 25, 16, 22, 12, 28]
    rows = []
    eid = 0
    base = dt.datetime(2024, 4, 1)
    for day, cnt in enumerate(ys):
        for j in range(cnt):
            rows.append((eid, base + dt.timedelta(days=day, minutes=j), 1, "view", 1.0, "{}"))
            eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = QUERIES["q_stat_durbin_watson"](spark, str(tmp_path)).collect()[0]
    n = len(ys)
    ts = list(range(n))
    sx = sum(ts); sy = sum(ys)
    sxy = sum(t * y for t, y in zip(ts, ys)); sxx = sum(t * t for t in ts)
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    e = [y - a - b * t for t, y in zip(ts, ys)]
    dw = sum((e[i] - e[i - 1]) ** 2 for i in range(1, n)) / sum(x * x for x in e)
    assert out.n_days == n
    assert abs(out.dw - round(dw, 6)) < 1e-6


def test_bayes_shrinkage_exact_reference(spark, tmp_path):
    """Exact method-of-moments Beta-Binomial reference with the same
    nano-quantization as the engine."""
    data = {1: (20, 100), 2: (30, 100), 3: (10, 50), 4: (1, 4)}
    parts = [(pk, f"p{pk}", f"Brand#{pk}", "t", 1, 1.0) for pk in data]
    _write(spark, tmp_path, "part", parts,
           "p_partkey long, p_name string, p_brand string, p_type string, "
           "p_size int, p_retailprice double")
    li = []
    for pk, (k, n) in data.items():
        li += [(pk, "R" if j < k else "N") for j in range(n)]
    _write(spark, tmp_path, "lineitem",
           [(pk, 1.0, 0.0, 0.0, 100.0, rf) for pk, rf in li],
           "l_partkey long, l_quantity double, l_discount double, l_tax double, "
           "l_extendedprice double, l_returnflag string")
    out = {r.brand: r for r in QUERIES["q_bayes_shrunk_rates"](spark, str(tmp_path)).collect()}
    r9 = {pk: round(k * 1e9 / n) for pk, (k, n) in data.items()}
    g = len(r9)
    sr = sum(r9.values()); srr = sum(v * v for v in r9.values())
    mu = sr / g / 1e9
    varr = (g * srr - sr * sr) / (g * g) / 1e18
    kappa = mu * (1 - mu) / varr - 1
    alpha, beta = mu * kappa, (1 - mu) * kappa
    for pk, (k, n) in data.items():
        want = (k + alpha) / (n + alpha + beta)
        assert abs(out[f"Brand#{pk}"].shrunk_rate - round(want, 6)) < 1e-9


def test_bootstrap_se_exact_reference(spark, tmp_path):
    """The Poisson bootstrap is fully reproducible outside the engine:
    recompute every replicate weight from md5 and match the SE
    EXACTLY."""
    import hashlib
    T = [1580030168, 3160060337, 3950075421, 4213413783, 4279248373, 4292415291]
    vals = {i: 100.0 + (i % 7) * 33.0 for i in range(1, 81)}
    _write(spark, tmp_path, "orders",
           [(i, 1, v) for i, v in vals.items()], _ORD_SCHEMA)
    out = QUERIES["q_sample_bootstrap_se"](spark, str(tmp_path)).collect()[0]

    def wt(r, ok):
        u = int(hashlib.md5(f"boot:{r}:{ok}".encode()).hexdigest()[:8], 16)
        for k, t in enumerate(T):
            if u < t:
                return k
        return 6

    m6 = []
    for r in range(20):
        sw = sum(wt(r, ok) * round(v * 100) for ok, v in vals.items())
        nw = sum(wt(r, ok) for ok in vals)
        m6.append(round(sw * 1e6 / nw))
    rn = len(m6)
    sm = sum(m6); smm = sum(x * x for x in m6)
    se = math.sqrt((rn * smm - sm * sm) / (rn * (rn - 1))) / 1e6 / 100
    assert out.n_replicates == 20
    assert abs(out.boot_se_price - round(se, 4)) < 1e-9


def test_shard_dup_leakage_counts(spark, tmp_path):
    """Three copies of one text (3 pairs) plus unique docs: pair count
    is exact; leakage equals the cross-shard fraction derivable from
    the md5 shard function."""
    import hashlib

    def shard(doc_id):
        return int(hashlib.md5(f"{doc_id}:shard:42".encode()).hexdigest()[:6], 16) % 16

    docs = [(i, "same text here", "en", "s", 14) for i in (1, 2, 3)]
    docs += [(i, f"unique {i}", "en", "s", 8) for i in (10, 11)]
    _write(spark, tmp_path, "documents", docs, _DOC_SCHEMA)
    out = QUERIES["q_shard_dup_leakage"](spark, str(tmp_path)).collect()[0]
    assert out.n_dup_pairs == 3
    want_cross = sum(
        1 for a, b in [(1, 2), (1, 3), (2, 3)] if shard(a) != shard(b)
    )
    assert out.n_cross_shard == want_cross
    assert out.leakage_share == round(want_cross / 3, 6)


# ------------------------------------------------------- cross-correlation


def test_cross_corr_planted_lagged_series(spark, tmp_path):
    """Purchases are planted as the click series shifted +2 days, so the
    lagged cross-correlation must read EXACTLY 1.0 at lag +2 (x(t) pairs
    with y(t+2) = x(t)), and every other lag must match a pure-Python
    Pearson over the zero-filled daily series — a first-principles
    reference independent of both engines' moment-sum formulation
    (SURVEY §5.2 non-mirrored-reference rule)."""
    clicks = [5, 1, 4, 2, 6, 3, 7, 2, 5, 1]
    base = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    for d, c in enumerate(clicks):
        for j in range(c):
            rows.append((eid, base + dt.timedelta(days=d, minutes=j), 1, "click", 1.0, "{}"))
            eid += 1
        for j in range(c):  # same count, two days later
            rows.append(
                (eid, base + dt.timedelta(days=d + 2, minutes=30 + j), 1, "purchase", 1.0, "{}")
            )
            eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)

    # zero-filled daily series over the full span (day 0 .. day 11)
    x = clicks + [0, 0]
    y = [0, 0] + clicks

    def ref_corr(lag):
        pairs = [
            (x[t], y[t + lag]) for t in range(len(x)) if 0 <= t + lag < len(y)
        ]
        n = len(pairs)
        sx = sum(a for a, _ in pairs)
        sy = sum(b for _, b in pairs)
        sxy = sum(a * b for a, b in pairs)
        sxx = sum(a * a for a, _ in pairs)
        syy = sum(b * b for _, b in pairs)
        return n, round(
            (n * sxy - sx * sy)
            / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)),
            6,
        )

    out = {r.lag_days: r for r in QUERIES["q_ts_cross_corr"](spark, str(tmp_path)).collect()}
    assert sorted(out) == list(range(-3, 4))
    for lag in range(-3, 4):
        n_ref, r_ref = ref_corr(lag)
        assert out[lag].n_days == n_ref, f"lag {lag}: n {out[lag].n_days} != {n_ref}"
        assert abs(out[lag].xcorr - r_ref) < 1e-9, f"lag {lag}: {out[lag].xcorr} != {r_ref}"
    assert out[2].xcorr == 1.0  # the planted shift


# ------------------------------------------------------- tf-idf


def test_tfidf_planted_exact_scores(spark, tmp_path):
    """Hand-computable corpus (4 docs, 2 sources): every top-3 score is
    tf * ln(N/df) of exact integers, so the output must match the
    pure-Python values to the 6-dp rounding exactly — the non-mirrored
    reference for the one formula-heavy webtext statistic that had only
    a plan-shape test."""
    docs = [
        (1, "apple apple banana", "en", "a", 18),
        (2, "apple cherry", "en", "a", 12),
        (3, "dog dog dog banana", "en", "b", 18),
        (4, "egg", "en", "b", 3),
    ]
    _write(spark, tmp_path, "documents", docs, _DOC_SCHEMA)
    out = [
        (r.source, r.rn, r.term, r.tfidf)
        for r in QUERIES["q_text_tfidf"](spark, str(tmp_path)).collect()
    ]
    ln = math.log
    want = [
        ("a", 1, "apple", round(3 * ln(4 / 2), 6)),
        ("a", 2, "cherry", round(1 * ln(4 / 1), 6)),
        ("a", 3, "banana", round(1 * ln(4 / 2), 6)),
        ("b", 1, "dog", round(3 * ln(4 / 1), 6)),
        ("b", 2, "egg", round(1 * ln(4 / 1), 6)),
        ("b", 3, "banana", round(1 * ln(4 / 2), 6)),
    ]
    assert out == want
