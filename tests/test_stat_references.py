"""Independent (non-mirrored) references for statistics whose DuckDB
oracle is a SQL transliteration of the same formula — VERDICT r5 item 4.

Mirrored oracles are AGREEMENT checks: a shared formula bug (the
jackknife √G factor, the time-decay sign — BASELINE.md) sails through
hash-green. Every test here recomputes the statistic from first
principles in plain Python on PLANTED data and compares against the
query's output, so a formula error on both engine sides cannot hide.

Complements the existing closed-form suites (test_metrics_ops.py,
test_round5b_ops.py); together they give every q_stat_* / q_eval_* /
screening statistic a non-mirrored reference — the full query→test map
lives in SURVEY.md §5."""

from __future__ import annotations

import datetime
import math

import pyspark.sql.functions as F  # noqa: F401

from etl4s_spark.queries import QUERIES, load_all


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")


def _write_documents(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")


def test_chisq_planted_2x4_exact_value(spark, tmp_path):
    """q_stat_chisq on a crafted (event_type × cohort) table vs a plain
    Python Σ(O−E)²/E — a NONZERO dependence value, not just the
    independence→0 case test_round5b covers. Cohort is user_id % 4, so
    user ids are chosen per cell."""
    load_all()
    counts = {
        ("A", 0): 30, ("A", 1): 10, ("A", 2): 20, ("A", 3): 40,
        ("B", 0): 5, ("B", 1): 45, ("B", 2): 25, ("B", 3): 25,
    }
    rows, eid = [], 0
    t0 = datetime.datetime(2024, 3, 1)
    for (etype, cohort), c in counts.items():
        for i in range(c):
            rows.append((eid, t0, cohort + 4 * i, etype, 1.0, "{}"))
            eid += 1
    _write_events(spark, tmp_path, rows)

    # independent replica
    row_n = {t: sum(v for (tt, _), v in counts.items() if tt == t) for t in "AB"}
    col_n = {k: sum(v for (_, kk), v in counts.items() if kk == k) for k in range(4)}
    total = sum(counts.values())
    chi = 0.0
    for (t, k), o in counts.items():
        e = row_n[t] * col_n[k] / total
        chi += (o - e) ** 2 / e
    out = QUERIES["q_stat_chisq"](spark, str(tmp_path)).collect()[0]
    assert out.n_cells == 8
    assert abs(out.chi_sq - round(chi, 4)) < 2e-4
    # the query hardcodes min(r-1,c-1)=3 for the production 5×4 table;
    # replicate that same normalizer here (shape-independent agreement
    # on V is NOT the point — the chi-sq value is)
    assert abs(out.cramers_v - round(math.sqrt(chi / (total * 3)), 4)) < 2e-4


def test_feature_woe_planted_exact_bins(spark, tmp_path):
    """q_feature_woe on 40 crafted orders (prices 1..40, outcome = the
    16 highest-priced orders are 'F') vs plain-Python deciling + WoE.
    With n=40 each decile holds exactly 4 consecutive prices, so bin
    membership is unambiguous and every WoE value has a closed form."""
    load_all()
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, i, "F" if i > 24 else "O", float(i), t0, "1-URGENT")
        for i in range(1, 41)
    ]
    _write_orders(spark, tmp_path, rows)

    # replica: deciles of prices 1..40 ascending → bin b covers prices
    # 4b-3..4b; events y=1 for price > 24 → bins 7..10 are all-event
    te = 16  # total events
    tn = 24  # total non-events
    want = {}
    for b in range(1, 11):
        n_event = sum(1 for p in range(4 * b - 3, 4 * b + 1) if p > 24)
        n_nonevent = 4 - n_event
        woe = (
            round(math.log((n_event * tn) / (n_nonevent * te)), 6)
            if n_event and n_nonevent
            else None  # ln(0) → NULL on both sides
        )
        want[b] = (4, n_event, woe)
    out = {r.bin: (r.n, r.n_event, r.woe) for r in
           QUERIES["q_feature_woe"](spark, str(tmp_path)).collect()}
    assert set(out) == set(want)
    for b in want:
        assert out[b][0] == want[b][0] and out[b][1] == want[b][1]
        if want[b][2] is None:
            assert out[b][2] is None or math.isinf(out[b][2])
        else:
            assert abs(out[b][2] - want[b][2]) < 1e-6, (b, out[b], want[b])


def test_eval_calibration_planted_reliability_table(spark, tmp_path):
    """q_eval_calibration on 21 crafted documents vs a plain-Python
    reliability table: pr_i = i/20 for n_chars = 100·(i+1) (total order,
    no ties), y = 1 for the 7 'en' docs planted at known positions."""
    load_all()
    en_at = {0, 3, 6, 9, 12, 15, 18}
    rows = [
        (i, "x", "en" if i in en_at else "fr", "s", 100 * (i + 1))
        for i in range(21)
    ]
    _write_documents(spark, tmp_path, rows)

    from collections import defaultdict

    bins = defaultdict(list)
    for i in range(21):
        pr = i / 20.0
        b = min(9, int(pr * 10))
        y = 1 if i in en_at else 0
        bins[b].append((pr, y))
    out = {r.bin: r for r in
           QUERIES["q_eval_calibration"](spark, str(tmp_path)).collect()}
    assert set(out) == set(bins)
    for b, pairs in bins.items():
        n = len(pairs)
        mean_pred = round(sum(p for p, _ in pairs) / n, 6)
        frac_pos = round(sum(y for _, y in pairs) / n, 6)
        brier = round(sum((p - y) ** 2 for p, y in pairs) / n, 6)
        assert out[b].n == n
        assert abs(out[b].mean_pred - mean_pred) < 1e-6
        assert abs(out[b].frac_positive - frac_pos) < 1e-6
        assert abs(out[b].brier - brier) < 1e-5, (b, out[b].brier, brier)


def test_eval_ndcg_planted_nontrivial_value(spark, tmp_path):
    """q_eval_ndcg on crafted embeddings where the cosine ranking and
    the relevance pattern are fully determined, vs a plain-Python
    DCG/IDCG — a value strictly between 0 and 1, unlike the
    perfect-retrieval=1 case test_round5b covers.

    One query (vec_id 0, label 1) on the x-axis; candidates at angles
    θ_j with cos = cos(θ_j) strictly decreasing for vec_id 20+j.
    Labels alternate 1,0,1,0,... so rel = [1,0,1,0,1] at ranks 1..5."""
    load_all()
    rows = [(0, [1.0, 0.0], 1)]
    for j in range(5):
        ang = 0.1 + 0.2 * j
        rows.append((20 + j, [math.cos(ang), math.sin(ang)], 1 if j % 2 == 0 else 0))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")

    rel = [1, 0, 1, 0, 1]
    dcg = sum(r / math.log(i + 2) for i, r in enumerate(rel))
    idcg = sum(1 / math.log(i + 2) for i in range(3))
    out = QUERIES["q_eval_ndcg"](spark, str(tmp_path)).collect()[0]
    assert out.n_queries == 1
    assert 0 < out.mean_ndcg10 < 1
    assert abs(out.mean_ndcg10 - round(dcg / idcg, 6)) < 1e-5


def test_eval_split_srm_planted_goodness_of_fit(spark, tmp_path):
    """q_eval_split_srm vs a plain-Python chi-squared GOF: the split is
    content-addressed (md5), so the replica recomputes each doc's split
    with hashlib and then the GOF statistic from first principles."""
    import hashlib

    load_all()
    n = 400
    _write_documents(
        spark, tmp_path, [(i, "x", "en", "s", 100) for i in range(n)]
    )
    obs = {"train": 0, "val": 0, "test": 0}
    for i in range(n):
        h = hashlib.md5(f"42:{i}".encode()).hexdigest()[:8]
        obs["val" if h < "0ccccccc" else "test" if h < "19999999" else "train"] += 1
    chi = sum(
        (obs[s] - e) ** 2 / e
        for s, e in (("train", 0.9 * n), ("val", 0.05 * n), ("test", 0.05 * n))
        if obs[s] or e
    )
    beyond = sum(
        1
        for s, e in (("train", 0.9 * n), ("val", 0.05 * n), ("test", 0.05 * n))
        if abs(obs[s] - e) > 3 * math.sqrt(e)
    )
    out = QUERIES["q_eval_split_srm"](spark, str(tmp_path)).collect()[0]
    assert out.n_rows == n
    assert abs(out.chi_sq_gof - round(chi, 4)) < 1e-3
    assert out.n_buckets_beyond_3sigma == beyond


def test_eval_precision_recall_at_k_planted_closed_form(spark, tmp_path):
    """q_eval_precision_recall_at_k on the same crafted cosine geometry
    as the NDCG reference (one query on the x-axis, candidates at
    strictly increasing angles, alternating labels) vs plain-Python
    hit counting: rel at ranks 1..5 = [1,0,1,0,1] → hits@10 = 3,
    n_rel = 3, micro precision@10 = 3/10, macro recall@10 = 1."""
    load_all()
    rows = [(0, [1.0, 0.0], 1)]
    for j in range(5):
        ang = 0.1 + 0.2 * j
        rows.append((20 + j, [math.cos(ang), math.sin(ang)], 1 if j % 2 == 0 else 0))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")

    out = QUERIES["q_eval_precision_recall_at_k"](spark, str(tmp_path)).collect()[0]
    assert out.n_queries == 1
    assert out.total_hits_at_10 == 3
    assert abs(out.micro_precision_at_10 - 0.3) < 1e-9
    assert abs(out.macro_recall_at_10 - 1.0) < 1e-9


def test_eval_langid_confusion_planted_matrix(spark, tmp_path):
    """q_eval_langid_confusion on crafted documents whose stopword
    content forces every cell of a known confusion matrix: 3 true-en
    docs predicted en, 2 true-fr docs predicted fr, 1 true-fr doc
    written with ENGLISH stopwords (predicted en — a planted confusion),
    and 1 true-zh doc with no latin stopwords (predicted und)."""
    load_all()
    en = "the cat and the dog of the house is here"
    fr = "le chat et les chiens des villes est la"
    zh = "山 水 风 月"
    docs = [
        (0, en, "en", "s", len(en)),
        (1, en, "en", "s", len(en)),
        (2, en, "en", "s", len(en)),
        (3, fr, "fr", "s", len(fr)),
        (4, fr, "fr", "s", len(fr)),
        (5, en, "fr", "s", len(en)),  # planted confusion: fr doc, en words
        (6, zh, "zh", "s", len(zh)),
    ]
    _write_documents(spark, tmp_path, docs)
    out = {
        (r.actual_lang, r.pred_lang): r.n
        for r in QUERIES["q_eval_langid_confusion"](spark, str(tmp_path)).collect()
    }
    assert out == {
        ("en", "en"): 3,
        ("fr", "fr"): 2,
        ("fr", "en"): 1,
        ("zh", "und"): 1,
    }
