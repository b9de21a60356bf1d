"""Property-based tests (hypothesis) for the sampling layer — the laws
that make content-addressed sampling safe to run on a 100 TB corpus:
threshold monotonicity (a bigger fraction keeps a superset), split
disjointness/coverage, and dedup idempotence. Pure-Python properties run
hypothesis' full case generation; Spark-backed laws use fixed seeds (a
Spark job per hypothesis example would take minutes)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from etl4s_spark.operators.sampling import _threshold_hex


@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_threshold_hex_is_8_hex_or_sentinel(fraction):
    t = _threshold_hex(fraction)
    if fraction >= 1.0:
        assert t == "g"
    else:
        assert len(t) == 8 and int(t, 16) == int(fraction * 16**8)


@given(
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_threshold_hex_monotone(a, b):
    """fraction a <= b ⇒ threshold(a) <= threshold(b) as strings — the
    property that makes a larger sample a SUPERSET of a smaller one
    (string compare because the filter compares hex prefixes)."""
    lo, hi = sorted((a, b))
    assert _threshold_hex(lo) <= _threshold_hex(hi)


@settings(deadline=None, max_examples=20)
@given(st.integers(min_value=0, max_value=2**63 - 1))
def test_sample_membership_is_pure_function_of_id(ident):
    """Membership at fraction f is (hash < threshold) of the id alone —
    recomputable anywhere, which is the retry-stability argument. Verify
    the python-side reimplementation agrees with itself across fractions
    (monotone nesting: kept at f ⇒ kept at every f' >= f)."""
    import hashlib

    h = hashlib.md5(f"42:{ident}".encode()).hexdigest()[:8]
    kept_at = [f for f in (0.1, 0.3, 0.5, 0.9, 1.0) if h < _threshold_hex(f)]
    # nesting: once kept, kept at every larger fraction
    assert kept_at == [f for f in (0.1, 0.3, 0.5, 0.9, 1.0) if f >= (kept_at[0] if kept_at else 2)]


def test_split_partitions_every_row_exactly_once(spark):
    """train/val/test is a PARTITION: every row gets exactly one label,
    and the val/test hash ranges are disjoint by construction."""
    from pyspark.sql import functions as F

    from etl4s_spark.operators.sampling import train_val_test_split

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    out = train_val_test_split(df, "doc_id", val_fraction=0.1, test_fraction=0.2)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert set(counts) <= {"train", "val", "test"}
    # fractions land near targets (binomial tolerance)
    assert 0.05 < counts.get("val", 0) / 2000 < 0.16
    assert 0.13 < counts.get("test", 0) / 2000 < 0.28


def test_deterministic_sample_is_nested_and_idempotent(spark):
    """Superset law on real data: sample(0.2) ⊆ sample(0.6); applying
    the same sample twice changes nothing (filter idempotence)."""
    from etl4s_spark.operators.sampling import deterministic_sample

    df = spark.range(3000).withColumnRenamed("id", "doc_id")
    small = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.2).collect()}
    large = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.6).collect()}
    assert small <= large
    twice = deterministic_sample(deterministic_sample(df, "doc_id", 0.6), "doc_id", 0.6)
    assert {r.doc_id for r in twice.collect()} == large


def test_exact_dedup_idempotent(spark):
    """dedup(dedup(x)) == dedup(x) — the law that makes re-running a
    dedup stage on partially-deduped data safe."""
    from etl4s_spark.operators.dedup import exact_dedup

    rows = [(i, f"text {i % 7}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = exact_dedup(df, "doc_id", "text")
    twice = exact_dedup(once, "doc_id", "text")
    assert sorted(r.doc_id for r in once.collect()) == sorted(
        r.doc_id for r in twice.collect()
    ) == list(range(7))
