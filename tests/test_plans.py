"""Physical-plan assertions — the scale contract (SURVEY.md §4.2).

Correctness tests say WHAT comes out; these say HOW: filters must reach
the parquet scan, projections must prune ReadSchema, small-dim joins must
broadcast. At 100 TB these properties are the difference between touching
terabytes and touching everything.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl4s_spark.sources.tables import load_table


def plan_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    plan = plan_str(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]" in plan, plan


def test_projection_prunes_read_schema(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.select("l_orderkey", "l_extendedprice")
    plan = plan_str(df)
    # ReadSchema carries ONLY the projected columns — not all 11
    assert "struct<l_orderkey:bigint,l_extendedprice:double>" in plan, plan
    assert "l_shipdate" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_flagship_plan_has_partial_aggregate_and_one_shuffle(spark, sf_dir):
    from etl4s_spark.queries import QUERIES, load_all

    load_all()
    df = QUERIES["q_agg_groupby"](spark, sf_dir)
    plan = plan_str(df)
    tree = plan.split("\n\n")[0]  # the numbered operator tree
    # partial + final HashAggregate; exactly 2 exchanges (1 key shuffle for
    # the agg + 1 range shuffle for the final sort)
    assert tree.count("HashAggregate") == 2, tree
    assert tree.count("Exchange") == 2, tree
    assert "hashpartitioning(l_returnflag" in plan, plan


def test_small_dim_join_broadcasts(spark, sf_dir):
    nat = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    df = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
    plan = plan_str(df)
    assert "BroadcastHashJoin" in plan, plan


def test_whole_stage_codegen_covers_project(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.select((F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"))
    plan = plan_str(df)
    # '*' prefix in the formatted tree marks whole-stage-codegen'd operators
    assert "* Project" in plan, plan
