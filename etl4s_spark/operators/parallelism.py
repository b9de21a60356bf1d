"""Scan-width guard for explode-heavy operators.

Several operators here (PQ/IVF element dataflows, hyperplane-LSH
projections, MinHash shingling) fan one input row out into dim × K (or
shingles × num_perm) derived rows *inside the scan stage* — the explode
and the downstream broadcast-join/projection pipeline into the same
whole-stage-codegen span, so the parallelism of the entire expansion is
the parallelism of the scan. That is exactly what you want on a real
cluster reading a wide table (thousands of input splits), but a small
parquet input arrives as ONE split and the whole expansion runs on one
core: at sf0.1 this was 4 s of a 9 s PQ query.

``widen`` hash-repartitions the *row-grain* frame (rows, not the
exploded elements — the cheap side of the fan-out) up to
``spark.sql.shuffle.partitions`` when the scan is narrower than that.
At scale the scan is already wider and this is a no-op; the check costs
one plan-to-RDD conversion, no job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def widen(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition ``df`` to the shuffle.partitions target on
    ``key_cols`` (hash — deterministic under task retries, unlike
    round-robin) iff it currently has fewer partitions. No-op on
    already-wide inputs."""
    target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *[F.col(c) for c in key_cols])
