"""Property tests pinning the auto-sized hyperplane-LSH operating point.

VERDICT r11 item 4: the recall closure of the shipped embedding-LSH
defaults (auto_planes + auto_tables holding the historical 8-plane/
4-table propose probability ≈0.89 for a cosine-0.95 pair) currently
lives in EMB_DEFAULT_SCALING.json — a measurement artifact. These pure-
function tests make the operating point a REGRESSION GATE: a future
knob change that silently re-opens the closed weak mark (propose
probability decaying with corpus size, as the retired fixed-4 schedule
did: 0.90 → 0.82 → 0.72 at 50k/200k/2M) fails pytest without needing a
65k-vector corpus or a Spark session.

No Spark fixtures on purpose — auto_planes / auto_tables /
propose_probability are driver-side model-parameter functions.
"""

from __future__ import annotations

import pytest

from etl4s_spark.operators.similarity import (
    auto_planes,
    auto_tables,
    propose_probability,
)

# corpus sizes spanning 2k .. 10^9 — below, at, and far above the 65k
# auto-plane boundary (256·2^8), including the EMB_DEFAULT_SCALING lanes
_SIZES = [
    2_000,
    50_000,
    65_536,
    100_000,
    200_000,
    2_000_000,
    50_000_000,
    1_000_000_000,
]


def test_design_point_holds_at_every_corpus_size():
    """P(propose | cosine 0.95) ≥ 0.88 under the shipped auto schedule
    for n across 2k..10^9 — the closed r10 weak mark, now pinned."""
    for n in _SIZES:
        planes = auto_planes(n)
        tables = auto_tables(planes)
        p = propose_probability(0.95, planes, tables)
        assert p >= 0.88, (
            f"n={n}: auto schedule ({planes} planes, {tables} tables) "
            f"proposes cosine-0.95 pairs at {p:.3f} < 0.88 — the "
            "fixed-table recall decay auto_tables exists to prevent"
        )


def test_fixed_four_tables_would_fail_the_gate():
    """The gate is discriminating: the RETIRED fixed-4-table schedule
    (the r10 weak mark) violates it at the 2M lane."""
    planes = auto_planes(2_000_000)
    assert propose_probability(0.95, planes, 4) < 0.88


def test_table_growth_is_monotone_and_anchored():
    """auto_tables never shrinks as planes grow (more resolution never
    buys fewer recall tables) and the ≤8-plane regime keeps the
    historical 4 tables byte-for-byte."""
    prev = 0
    for planes in range(1, 33):
        t = auto_tables(planes)
        if planes <= 8:
            assert t == 4, f"{planes} planes: small-corpus behavior changed"
        assert t >= prev, f"{planes} planes: table count shrank {prev}→{t}"
        prev = t


def test_auto_planes_monotone_with_floor():
    """auto_planes is monotone in n with the documented floor of 8
    (small corpora keep the historical fixed-8 behavior)."""
    prev = 0
    for n in _SIZES:
        p = auto_planes(n)
        assert p >= 8
        assert p >= prev
        prev = p
    assert auto_planes(2_000) == 8


@pytest.mark.parametrize("n", [200_000, 2_000_000])
def test_schedule_matches_measured_lanes(n):
    """The schedule that EMB_DEFAULT_SCALING measured (200k → 10 planes/
    6 tables, 2M → 13/8) is the one the code still computes — the
    artifact's lanes stay attached to the shipped defaults."""
    expected = {200_000: (10, 6), 2_000_000: (13, 8)}[n]
    planes = auto_planes(n)
    assert (planes, auto_tables(planes)) == expected
