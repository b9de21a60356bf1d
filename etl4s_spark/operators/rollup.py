"""Hypertable-style multi-resolution time rollups (continuous-aggregate
hierarchy): raw events → minute → hour → day summaries in one pass.

The scale-correct formulation: aggregate the RAW table once at the finest
resolution, then derive every coarser level by re-aggregating the next
finer level — each step shrinks the data by the bucket ratio, so the raw
table is scanned exactly once regardless of how many levels exist. That
requires decomposable aggregates: sum/count/min/max re-aggregate
directly; avg is carried as (sum, count) and finalized per level.

Output is one stacked DataFrame with a ``resolution`` tag column — the
shape a downstream "query the right resolution" router expects.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: resolution name → truncation understood by F.date_trunc
TRUNC_UNITS = {"minute": "minute", "hour": "hour", "day": "day", "week": "week", "month": "month"}


def rollup_hierarchy(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: Sequence[str] = (),
    resolutions: Sequence[str] = ("minute", "hour", "day"),
) -> DataFrame:
    """Stacked multi-resolution rollup of ``value_col`` grouped by
    ``keys`` (+ time bucket), finest-to-coarsest.

    Returns columns: resolution, bucket_start (timestamp), *keys,
    n_events, total_value, min_value, max_value, avg_value — avg derived
    from the carried (sum, count) so every level is exact.

    One shuffle per level, each on strictly smaller data. The finest
    level's subtree appears under every union branch in the STATIC plan,
    but AQE's exchange reuse executes it once at runtime (the executed
    plan shows ReusedExchange for the coarser branches — asserted in
    tests/test_plans.py), so the raw table is scanned and shuffled
    exactly once."""
    if not resolutions:
        raise ValueError("need at least one resolution")
    for r in resolutions:
        if r not in TRUNC_UNITS:
            raise ValueError(f"unknown resolution {r!r}; pick from {sorted(TRUNC_UNITS)}")

    keys = list(keys)
    finest = resolutions[0]
    level = (
        df.groupBy(
            F.date_trunc(TRUNC_UNITS[finest], F.col(ts_col)).alias("bucket_start"), *keys
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("total_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )
    levels = [level.select(F.lit(finest).alias("resolution"), "*")]
    for res in resolutions[1:]:
        level = (
            level.groupBy(
                F.date_trunc(TRUNC_UNITS[res], F.col("bucket_start")).alias("bucket_start"),
                *keys,
            )
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("total_value").alias("total_value"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
        )
        levels.append(level.select(F.lit(res).alias("resolution"), "*"))
    out = levels[0]
    for more in levels[1:]:
        out = out.unionByName(more)
    return out.withColumn(
        "avg_value", F.col("total_value") / F.col("n_events")
    )
