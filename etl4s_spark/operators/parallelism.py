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

# Logical-plan node names that put at least one exchange (query stage)
# below the frame. Their presence means the .rdd partition probe would
# EXECUTE those stages under AQE (see widen's docstring); it also means
# the frame is shuffle.partitions-wide at scale already. Matched against
# the analyzed plan's toString() — node names appear at line starts like
# "Aggregate [...]", "+- Join Inner", "Window [...]".
_SHUFFLE_NODES = (
    "Aggregate [",
    "Join ",
    "Window [",
    "Sort [",
    "Deduplicate [",
    "Distinct",
    "RepartitionByExpression",
    "Repartition ",
    "GlobalLimit",
    "Intersect",
    "Except",
    "CoGroup",
    "FlatMapGroups",
)


def widen(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition ``df`` to the shuffle.partitions target on
    ``key_cols`` (hash — deterministic under task retries, unlike
    round-robin) iff it currently has fewer partitions. No-op on
    already-wide inputs.

    SELF-GUARD for post-shuffle frames: the partition probe converts the
    plan to an RDD, and under AQE that finalizes the adaptive plan —
    which EXECUTES every query stage (shuffle) below the frame before
    the real job runs them again (measured: q_anomaly_mad's second
    quartile pass re-ran the first median's whole pipeline inside the
    probe). If the analyzed plan contains any shuffle-inducing node the
    frame is returned UNCHANGED: no probe, no repartition — post-shuffle
    output is shuffle.partitions-wide at scale by construction (AQE may
    coalesce it locally, but re-exchanging raw rows to undo that would
    cost a real shuffle at scale). Callers that need a guaranteed-wide
    post-shuffle stage use an unconditional
    ``df.repartition(target, keys)`` placed where the next operator
    needs that exact partitioning anyway — see embedding_neardup_lsh's
    candidate verify stage for the worked example."""
    target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    plan = df._jdf.queryExecution().analyzed().toString()
    if any(f"{node}" in plan for node in _SHUFFLE_NODES):
        return df
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *[F.col(c) for c in key_cols])
