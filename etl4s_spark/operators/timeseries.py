"""Distributed time-series similarity search (PAPERS.md: EDBT'19
streaming similarity search, ICDE'21 distributed top-k trajectory
search — re-expressed Spark-first).

The core operation: find the k subsequences of a keyed event stream
closest to a QUERY PATTERN under z-normalized Euclidean distance — the
UCR-suite / matrix-profile distance that matches SHAPE, not level or
amplitude (a sales ramp matches a ramp whether it runs 10→80 or
1000→8000).

Spark formulation, built-ins end to end:
- sliding windows come from ``collect_list`` over an ORDERED window
  frame (ROWS BETWEEN CURRENT AND L-1 FOLLOWING) — one shuffle on the
  series key, each subsequence materialized as a length-L array;
- per-window mean/std and the distance are higher-order array
  expressions (aggregate / zip_with) — scalar codegen, no UDF;
- the query pattern is z-normalized DRIVER-side and embedded as an
  array literal (L floats of model parameters — the centroid-as-data
  posture);
- global top-k is a TakeOrdered over (distance, key, position) — total
  order, deterministic under ties.

Scale: windows fan out L× the input in ARRAY CELLS but rows stay 1:1
with events; the one shuffle partitions on the series key; top-k never
materializes a sorted whole. For matrix-profile-at-scale (all-pairs),
the same window relation self-joins through an LSH/PAA bucket — this
operator is the query-pattern primitive those pipelines share."""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def znormalize(pattern: Sequence[float]) -> list[float]:
    """Driver-side z-normalization of the query pattern (L floats of
    model parameters). Raises on constant patterns — shape search is
    undefined for them."""
    n = len(pattern)
    m = sum(pattern) / n
    var = sum((x - m) ** 2 for x in pattern) / n
    if var <= 0:
        raise ValueError("query pattern is constant; z-normalized distance undefined")
    s = math.sqrt(var)
    return [(x - m) / s for x in pattern]


def _arr_mean(vals: Column, n: int) -> Column:
    return F.aggregate(vals, F.lit(0.0), lambda a, x: a + x) / n


def ts_pattern_topk(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    pattern: Sequence[float],
    k: int = 20,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Top-k subsequences of each key's ordered value stream closest to
    ``pattern`` under z-normalized Euclidean distance. Returns
    (key, start_pos, dist) with ``dist`` rounded to 6 (the cross-engine
    float rule). Constant subsequences (std = 0) are excluded — they
    have no shape to match."""
    length = len(pattern)
    zq = znormalize(pattern)
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    frame = w.rowsBetween(Window.currentRow, length - 1)
    qlit = F.array(*[F.lit(float(v)) for v in zq])
    windows = (
        df.select(
            F.col(key_col).alias("key"),
            F.row_number().over(w).alias("start_pos"),
            F.collect_list(F.col(value_col).cast("double")).over(frame).alias("vals"),
        )
        .filter(F.size("vals") == length)
    )
    with_stats = windows.select(
        "key",
        "start_pos",
        "vals",
        _arr_mean(F.col("vals"), length).alias("m"),
    ).select(
        "key",
        "start_pos",
        "vals",
        "m",
        F.sqrt(
            F.aggregate(
                F.col("vals"),
                F.lit(0.0),
                lambda a, x: a + (x - F.col("m")) * (x - F.col("m")),
            )
            / length
        ).alias("s"),
    )
    scored = with_stats.filter(F.col("s") > 0).select(
        "key",
        "start_pos",
        F.round(
            F.sqrt(
                F.aggregate(
                    F.zip_with(
                        F.col("vals"),
                        qlit,
                        lambda x, q: ((x - F.col("m")) / F.col("s") - q)
                        * ((x - F.col("m")) / F.col("s") - q),
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            ),
            6,
        ).alias("dist"),
    )
    return scored.orderBy("dist", "key", "start_pos").limit(k)
