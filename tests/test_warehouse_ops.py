"""Property-style tests for warehouse operators: upsert reconciliation
semantics and SCD2 interval invariants over randomized inputs (expected
results computed independently in Python)."""

from __future__ import annotations

import random

from etl4s_spark.operators.warehouse import scd2_intervals, upsert


def test_upsert_is_dict_merge(spark):
    """upsert(base, updates, k) ≡ {**base, **updates} keyed by k, for
    random overlapping key sets — updates win wholesale, unmatched base
    rows survive, new keys insert."""
    for seed in (1, 2, 3):
        rnd = random.Random(seed)
        base = {k: (rnd.randrange(100), rnd.choice("abc")) for k in rnd.sample(range(50), 30)}
        upd = {k: (rnd.randrange(100), "U") for k in rnd.sample(range(60), 20)}
        base_df = spark.createDataFrame(
            [(k, v, s) for k, (v, s) in base.items()], "k long, v long, s string"
        )
        upd_df = spark.createDataFrame(
            [(k, v, s) for k, (v, s) in upd.items()], "k long, v long, s string"
        )
        got = {r.k: (r.v, r.s) for r in upsert(base_df, upd_df, ["k"]).collect()}
        assert got == {**base, **upd}, seed


def test_scd2_intervals_tile_the_timeline(spark):
    """Per key: versions sorted by valid_from are contiguous
    (valid_to[i] == valid_from[i+1]), exactly the last one is open-ended
    and flagged current, and every change row appears exactly once —
    including ties on the change timestamp (broken by the tiebreak
    column)."""
    rnd = random.Random(7)
    rows = []
    for key in range(8):
        for i in range(rnd.randrange(1, 6)):
            # deliberate timestamp collisions: ts drawn from a small set
            rows.append((key, rnd.randrange(3), key * 100 + i))
    df = spark.createDataFrame(rows, "k long, ts long, change_id long")
    out = scd2_intervals(df, key="k", change_ts="ts", order_tiebreak="change_id")
    by_key: dict[int, list] = {}
    for r in out.collect():
        by_key.setdefault(r.k, []).append(r)
    n_out = 0
    for key, versions in by_key.items():
        versions.sort(key=lambda r: (r.valid_from, r.change_id))
        n_out += len(versions)
        for a, b in zip(versions, versions[1:]):
            assert a.valid_to == b.valid_from, (key, a, b)
            assert not a.is_current
        assert versions[-1].valid_to is None and versions[-1].is_current
    assert n_out == len(rows)
