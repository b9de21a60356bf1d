"""Unit tests for round-4 operators: semantics the oracle proves only on
the synthetic corpus get exercised here on adversarial inputs."""

from __future__ import annotations

from pyspark.sql import functions as F


def _morton_py(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_bit_interleave(spark):
    """zorder_key == the textbook Morton interleave for random and
    boundary values (0, max, single bits), and is monotone in each
    coordinate when the other is fixed at 0."""
    import random

    from etl4s_spark.operators.warehouse import zorder_key

    rnd = random.Random(7)
    vals = [0, 1, 2, 3, 65535, 32768] + [rnd.randrange(65536) for _ in range(40)]
    rows = [(x, y) for x in vals[:8] for y in vals[:8]] + list(
        zip(vals, reversed(vals))
    )
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    for r in got:
        assert r.z == _morton_py(r.x, r.y), (r.x, r.y)
    # axis monotonicity: y=0 ⇒ z is the bit-spread of x, increasing in x
    xs = sorted(vals)
    zs = [_morton_py(x, 0) for x in xs]
    assert zs == sorted(zs)


def test_per_group_cap_semantics(spark):
    """Cap respected per group, small groups kept whole, selection is
    deterministic and nested (cap 3 ⊆ cap 5 per group)."""
    from etl4s_spark.operators.sampling import per_group_cap

    rows = [(i, "big") for i in range(50)] + [(100 + i, "small") for i in range(2)]
    df = spark.createDataFrame(rows, "id long, g string")
    c3 = per_group_cap(df, "id", "g", cap=3).collect()
    by_g: dict = {}
    for r in c3:
        by_g.setdefault(r.g, set()).add(r.id)
    assert len(by_g["big"]) == 3
    assert by_g["small"] == {100, 101}  # under cap → kept whole
    c5 = per_group_cap(df, "id", "g", cap=5).collect()
    big5 = {r.id for r in c5 if r.g == "big"}
    assert by_g["big"] <= big5 and len(big5) == 5  # nested + deterministic


def test_asof_forward_prefers_equal_ts_then_next(spark):
    """Forward as-of: an equal-timestamp right row matches (inclusive);
    otherwise the nearest LATER one; never an earlier one."""
    from etl4s_spark.operators.joins import asof_join

    left = spark.createDataFrame([("k", 10, 1), ("k", 11, 2)], "k string, ts long, lid long")
    right = spark.createDataFrame(
        [("k", 5, 50), ("k", 10, 100), ("k", 20, 200)], "k string, ts long, v long"
    )
    out = {
        r.lid: (r.matched_ts, r.matched_v)
        for r in asof_join(
            left, right, keys=["k"], left_ts="ts", right_ts="ts",
            right_values=["v"], direction="forward",
        ).collect()
    }
    assert out[1] == (10, 100)  # equal ts matches inclusively
    assert out[2] == (20, 200)  # next later, never ts=10 (earlier)


def test_winsorize_bounds_behavior(spark):
    """least/greatest clipping: values inside [p05,p95] unchanged,
    outliers clipped to the boundary — checked against numpy on a known
    distribution via the same exact percentile definition."""
    import numpy as np

    data = [(float(v),) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame(data, "x double")
    p05, p95 = (
        df.agg(
            F.percentile("x", F.lit(0.05)).alias("a"),
            F.percentile("x", F.lit(0.95)).alias("b"),
        ).collect()[0]
    )
    np05, np95 = np.percentile([v for (v,) in data], [5, 95], method="linear")
    assert abs(p05 - np05) < 1e-9 and abs(p95 - np95) < 1e-9
    clipped = df.select(
        F.least(F.greatest(F.col("x"), F.lit(p05)), F.lit(p95)).alias("w")
    ).collect()
    ws = sorted(r.w for r in clipped)
    assert ws[0] == p05 and ws[-1] == p95
    assert all(p05 <= w <= p95 for w in ws)


def test_ts_pattern_topk_shape_invariance(spark):
    """z-normalized distance matches SHAPE: a planted ramp scaled x100
    and offset +1000 scores (near-)zero distance and ranks first; a
    constant stretch is excluded (no shape); reversed ramps score far."""
    from etl4s_spark.operators.timeseries import ts_pattern_topk

    noise = [3.0, 7.0, 2.0, 9.0, 4.0, 8.0, 1.0, 6.0, 5.0, 7.5]
    ramp = [1000.0 + 100.0 * i for i in range(1, 9)]      # shape == query
    flat = [5.0] * 8
    series = noise + ramp + flat + list(reversed(ramp))
    rows = [(1, i, v) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    out = ts_pattern_topk(
        df, key_col="k", ts_col="t", value_col="v",
        pattern=[float(i) for i in range(1, 9)], k=3,
    ).collect()
    # the planted ramp starts at position 11 (row_number is 1-based)
    assert out[0].start_pos == 11 and out[0].dist == 0.0
    # no window fully inside the flat stretch appears (std=0 excluded)
    flat_only = set(range(19, 20))  # start covering indices 18..25 → all 5.0
    assert all(r.start_pos not in flat_only for r in out)
    # reversed ramp is the anti-shape: max distance among aligned windows
    rev = [r for r in out if r.start_pos == 27]
    assert not rev  # nowhere near the top


def test_csv_quarantine_routes_not_fails(spark, tmp_path):
    """PERMISSIVE csv read keeps parseable fields of malformed rows and
    captures the raw line; FAILFAST on the same file raises."""
    import pytest
    from py4j.protocol import Py4JJavaError

    p = str(tmp_path / "rows")
    spark.createDataFrame(
        [("1,10.5",), ("2,oops",), ("3,30.25",)], "value string"
    ).coalesce(1).write.mode("overwrite").text(p)
    schema = "id BIGINT, price DOUBLE, _corrupt_record STRING"
    ok = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(p)
    ).collect()
    by_id = {r.id: r for r in ok}
    assert by_id[2].price is None and by_id[2]._corrupt_record == "2,oops"
    assert by_id[1].price == 10.5 and by_id[1]._corrupt_record is None
    with pytest.raises(Exception):
        spark.read.schema("id BIGINT, price DOUBLE").option("mode", "FAILFAST").csv(p).collect()


def test_containment_catches_inclusion_jaccard_misses(spark):
    """A short doc quoted verbatim inside a long one: containment
    (short→long) is 1.0 while Jaccard stays low — the directed
    relationship decontamination needs."""
    from etl4s_spark.operators.dedup import ngram_jaccard_pairs
    from etl4s_spark.operators.text import normalize_text, shingles_from_words
    from pyspark.sql import functions as F

    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"word{i} filler{i} text{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote + " " + filler)],
        "doc_id long, text string",
    )
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                shingles_from_words(
                    F.split(normalize_text(F.col("text")), " "),
                    normalize_text(F.col("text")),
                    k=3,
                )
            )
        ).alias("s"),
    )
    sizes = {r.doc_id: r.n for r in sh.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .count()
    )
    containment_short_in_long = inter / sizes[1]
    jaccard = inter / (sizes[1] + sizes[2] - inter)
    assert containment_short_in_long == 1.0  # every shingle of the quote appears
    assert jaccard < 0.1  # symmetric similarity misses the inclusion
    # and the symmetric operator agrees with the jaccard computed here
    jp = ngram_jaccard_pairs(docs, "doc_id", "text").collect()
    assert jp and abs(jp[0].jaccard - round(jaccard, 6)) < 1e-9
