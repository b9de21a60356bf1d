"""UDF-surface and source/sink round-trip tests (SURVEY.md §2.B scans +
UDF/UDAF/UDTF rows)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl4s_spark.functions import (
    grouped_weighted_avg,
    normalize_group_pandas,
    py_classify_price,
    sentence_split_udtf,
    vec_l2_normalize,
)
from etl4s_spark.sources.batch import (
    scan_csv,
    scan_json,
    scan_orc,
    scan_text,
    write_csv,
    write_orc,
    write_partitioned,
    write_text,
)
from etl4s_spark.sources.tables import load_table


def test_pandas_udf_l2_normalize(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").limit(20)
    out = e.select("vec_id", vec_l2_normalize("embedding").alias("unit")).collect()
    for r in out:
        norm = math.sqrt(sum(x * x for x in r.unit))
        assert abs(norm - 1.0) < 1e-9


def test_grouped_agg_pandas_udf_matches_builtin(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    udaf = (
        li.groupBy("l_returnflag")
        .agg(grouped_weighted_avg("l_extendedprice", "l_quantity").alias("wavg"))
        .collect()
    )
    builtin = (
        li.groupBy("l_returnflag")
        .agg(
            (F.sum(F.col("l_extendedprice") * F.col("l_quantity")) / F.sum("l_quantity")).alias(
                "wavg"
            )
        )
        .collect()
    )
    a = {r.l_returnflag: r.wavg for r in udaf}
    b = {r.l_returnflag: r.wavg for r in builtin}
    assert a.keys() == b.keys()
    for k in a:
        assert abs(a[k] - b[k]) < 1e-6


def test_grouped_map_zscore(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    out = normalize_group_pandas(c, "c_mktsegment", "c_acctbal")
    stats = (
        out.groupBy("c_mktsegment")
        .agg(F.avg("c_acctbal_z").alias("m"), F.stddev_samp("c_acctbal_z").alias("s"))
        .collect()
    )
    for r in stats:
        assert abs(r.m) < 1e-9  # centered
        assert abs(r.s - 1.0) < 1e-6  # unit variance


def test_row_udf_matches_when_expression(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").limit(500)
    udf_out = o.select("o_orderkey", py_classify_price()(F.col("o_totalprice")).alias("c"))
    builtin = o.select(
        "o_orderkey", F.when(F.col("o_totalprice") > 200000, "high").otherwise("low").alias("c")
    )
    assert sorted(map(tuple, udf_out.collect())) == sorted(map(tuple, builtin.collect()))


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    path = str(tmp_path / "region_csv")
    write_csv(src, path)
    back = scan_csv(spark, path, schema=src.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_json_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_json")
    src.write.mode("overwrite").json(path)
    back = scan_json(spark, path, schema=src.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "customer")
    path = str(tmp_path / "customer_orc")
    write_orc(src, path)
    back = scan_orc(spark, path, columns=["c_custkey", "c_name"])
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.select("c_custkey", "c_name").collect())
    )
    from etl4s_spark.plans import explain_str

    plan = explain_str(scan_orc(spark, path).filter(F.col("c_custkey") < 100), "formatted")
    assert "PushedFilters" in plan and "c_custkey" in plan.split("PushedFilters")[1].splitlines()[0]


def test_text_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "documents").select(
        F.regexp_replace("text", "[\\r\\n]+", " ").alias("value")
    ).limit(50)
    path = str(tmp_path / "docs_text")
    write_text(src, path)
    back = scan_text(spark, path)
    assert back.columns == ["value"]
    assert sorted(r.value for r in back.collect()) == sorted(r.value for r in src.collect())


def test_python_udtf_sentence_split(spark):
    tf = sentence_split_udtf()
    spark.udtf.register("sentences", tf)
    df = spark.createDataFrame(
        [(1, "One. Two two! Three?"), (2, ""), (3, "Solo")], "doc_id int, text string"
    )
    df.createOrReplaceTempView("udtf_docs")
    out = spark.sql(
        "SELECT d.doc_id, s.sent_idx, s.sentence, s.n_chars "
        "FROM udtf_docs d, LATERAL sentences(d.text) s ORDER BY d.doc_id, s.sent_idx"
    ).collect()
    got = [(r.doc_id, r.sent_idx, r.sentence, r.n_chars) for r in out]
    assert got == [
        (1, 0, "One", 3),
        (1, 1, "Two two", 7),
        (1, 2, "Three", 5),
        (3, 0, "Solo", 4),
    ]


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part")
    write_partitioned(src, path, partition_by=["o_orderstatus"])
    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "O")
    from etl4s_spark.plans import explain_str

    plan = explain_str(back, "formatted")
    # partition filter must prune at planning time, not scan-and-filter
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1].splitlines()[0]
    n_o = src.filter(F.col("o_orderstatus") == "O").count()
    assert back.count() == n_o

def test_jdbc_option_contract():
    """Construct-only JDBC coverage (no database in this container): the
    partitioned-read quad is all-or-nothing and lands as the exact Spark
    option names; extra driver options stringify."""
    import pytest

    from etl4s_spark.sources.batch import _jdbc_options

    opts = _jdbc_options(
        "jdbc:postgresql://db/warehouse",
        "public.orders",
        partition_column="o_orderkey",
        lower_bound=1,
        upper_bound=6_000_000,
        num_partitions=64,
        fetch_size=5_000,
        sessionInitSQL="SET statement_timeout=0",
    )
    assert opts["partitionColumn"] == "o_orderkey"
    assert (opts["lowerBound"], opts["upperBound"], opts["numPartitions"]) == (
        "1",
        "6000000",
        "64",
    )
    assert opts["fetchsize"] == "5000"
    assert opts["dbtable"] == "public.orders"
    assert opts["sessionInitSQL"] == "SET statement_timeout=0"
    # a subset of the quad is a silent single-task scan — must raise
    with pytest.raises(ValueError, match="ALL of"):
        _jdbc_options("jdbc:h2:mem:x", "t", partition_column="id")


def test_compact_files_reduces_file_count(spark, sf_dir, tmp_path):
    from etl4s_spark.sources.batch import compact_files

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compacted")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(16).write.parquet(src)
    import glob

    assert len(glob.glob(f"{src}/part-*.parquet")) == 16
    # total size is well under 8 MB → everything compacts to ONE file
    compact_files(spark, src, dst, target_file_mb=8)
    assert len(glob.glob(f"{dst}/part-*.parquet")) == 1
    back = spark.read.parquet(dst)
    assert back.count() == docs.count()
    assert sorted(back.columns) == sorted(docs.columns)


def test_python_datasource_partition_invariant_and_deterministic(spark):
    """The synthdocs Python data source must yield IDENTICAL rows
    regardless of partition count (rows are pure functions of row id,
    never of split boundaries) and match the driver-side closed form."""
    from etl4s_spark.sources.pyds import register_synthdocs, synth_row

    register_synthdocs(spark)

    def rows(parts):
        df = (
            spark.read.format("synthdocs")
            .option("n", 200)
            .option("parts", parts)
            .load()
        )
        return sorted(tuple(r) for r in df.collect())

    one, eight, thirteen = rows(1), rows(8), rows(13)
    assert one == eight == thirteen
    assert len(one) == 200
    assert one == sorted(synth_row(i) for i in range(200))
    langs = {r[1] for r in one}
    assert langs == {"en", "de", "fr", "es", "pt"}  # LCG mixes all classes


def test_python_stream_datasource_offsets_and_replay(spark):
    """The streaming face of synthdocs (simpleStreamReader): offsets
    advance by `batch` rows until `n` then freeze (so
    processAllAvailable drains), read() returns a COPYABLE iterator
    (Spark's prefetch cache copy.copy()s it), and readBetweenOffsets —
    the restart-recovery path — regenerates the exact same rows from
    the closed form."""
    import copy

    from etl4s_spark.sources.pyds import SynthDocsStreamReader, synth_row

    r = SynthDocsStreamReader({"n": "10", "batch": "4"})
    off = r.initialOffset()
    assert off == {"offset": 0}
    seen = []
    for want_hi in (4, 8, 10, 10):
        it, nxt = r.read(off)
        copy.copy(it)  # must not raise (generator objects would)
        rows = list(it)
        seen.extend(rows)
        assert nxt == {"offset": want_hi}
        off = nxt
    assert seen == [synth_row(i) for i in range(10)]
    # recovery replay is bit-identical to the original batch
    assert list(r.readBetweenOffsets({"offset": 4}, {"offset": 8})) == [
        synth_row(i) for i in range(4, 8)
    ]
