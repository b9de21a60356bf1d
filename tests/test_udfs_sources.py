"""UDF-surface and source/sink round-trip tests (SURVEY.md §2.B scans +
UDF/UDAF/UDTF rows)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl4s_spark.functions import (
    grouped_weighted_avg,
    normalize_group_pandas,
    py_classify_price,
    vec_l2_normalize,
)
from etl4s_spark.sources.batch import scan_csv, scan_json, write_csv, write_partitioned
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