"""Similarity search over embedding columns (array<float>).

Two tiers:

- ``cosine_topk``: exact brute-force top-k — query side broadcast, dot
  products as higher-order expressions (JVM-side), per-query top-k via
  WindowGroupLimit. Cost O(|queries| × |corpus|); right whenever the
  query set is broadcast-small (the common "find neighbors for this
  batch" shape). The corpus is NEVER shuffled — at 100 TB the scan is
  the only pass.

- ``lsh_bucketed_topk``: approximate — random-hyperplane signatures
  (deterministic, seed-derived, no stored model) bucket both sides; only
  same-bucket pairs are scored. Sub-linear candidate count; recall tuned
  by n_planes/n_tables. The scale path when queries are too many to
  broadcast.

All vector math widens float→double BEFORE arithmetic (bit-stable vs
DuckDB's list_cosine_similarity, which computes in double).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(vec: Column) -> Column:
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan: broadcast(queries) nested-loop join against the corpus scan →
    cosine as a codegen'd expression → row_number window partitioned by
    query → filter rn<=k (WindowGroupLimit pushes the top-k below the
    shuffle). Self-matches (same id) are excluded.
    """
    query_id_col = query_id_col or id_col
    q = queries.select(
        F.col(query_id_col).alias("query_id"), as_double(F.col(vec_col)).alias("__qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("__cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


def _dot_sql(vec_name: str, const: list[float]) -> str:
    """SQL text for the dot product of a vector column with a constant
    vector, unrolled as element_at terms — plain codegen'd arithmetic.

    Built as ONE expression string parsed JVM-side: constructing the
    same tree through Column operators costs a py4j round trip per
    operator (~1,500 for 8 cells × 64 dims ≈ seconds of pure plan-build
    latency). float repr round-trips exactly to double."""
    return " + ".join(
        f"element_at({vec_name}, {i + 1}) * {float(x)!r}" for i, x in enumerate(const)
    )


def ivf_centroids(df: DataFrame, id_col: str, vec_col: str, n_cells: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic IVF coarse centroids: the n_cells vectors with the
    smallest xxhash64(id, seed) — a seeded pseudo-random sample, so any
    run (or executor) derives the same cells with no stored model.

    This is the one intentional driver-side collect in the similarity
    stack: n_cells × dim floats — model parameters, not data. (A Lloyd
    refinement sweep would be the same broadcast-assign + groupBy-avg
    pattern; the sample quantizer keeps the operator deterministic.)"""
    rows = (
        df.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v"))
        .withColumn("__h", F.xxhash64(F.col("id"), F.lit(seed)))
        .orderBy("__h", "id")
        .limit(n_cells)
        .collect()
    )
    return [list(r["v"]) for r in rows]


def ivf_refine_centroids(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    sweeps: int = 1,
) -> list[list[float]]:
    """Lloyd refinement of IVF coarse centroids: assign every vector to
    its nearest centroid (codegen'd ranking projection), average each
    cell element-wise (one groupBy over ≤n_cells groups — the avg
    aggregates are dim unrolled columns, map-side combined), collect the
    n_cells × dim result. Cells that lose all members keep their old
    centroid. Each sweep costs one scan + one tiny shuffle; recall
    typically saturates after 1-2 sweeps for coarse quantizers."""
    dim = len(centroids[0])
    cents = [list(c) for c in centroids]
    for _ in range(sweeps):
        assigned = df.select(as_double(F.col(vec_col)).alias("__v")).withColumn(
            "__cell", ivf_cell_ranking("__v", cents)[0]
        )
        rows = assigned.groupBy("__cell").agg(
            *[F.expr(f"avg(element_at(__v, {i + 1})) AS c{i}") for i in range(dim)]
        ).collect()
        for r in rows:
            cents[r["__cell"]] = [float(r[f"c{i}"]) for i in range(dim)]
    return cents


def ivf_cell_ranking(vec_name: str, centroids: list[list[float]]) -> Column:
    """Array of cell ids ordered by descending <vec, centroid> — element
    1 is the home cell; the first n_probe entries are the probe set.
    ``vec_name`` is the (materialized) vector column's name — the whole
    ranking is one F.expr string (see _dot_sql for why)."""
    cells = ", ".join(
        f"named_struct('neg_sim', -({_dot_sql(vec_name, cv)}), 'cell', {ci})"
        for ci, cv in enumerate(centroids)
    )
    return F.expr(f"transform(array_sort(array({cells})), s -> s.cell)")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    refine_sweeps: int = 0,
    query_id_col: str | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF(-FLAT) index expressed as dataflow:
    corpus vectors are assigned to their nearest coarse centroid (one
    codegen'd projection — the 'index build'), queries probe their
    n_probe nearest cells, and only same-cell pairs are scored.

    One shuffle on the cell id; candidate count ≈ |corpus| × n_probe /
    n_cells. The corpus is scanned once and never broadcast — the scale
    path when both sides are large. Recall is tuned by n_probe/n_cells;
    misses happen only when a true neighbor lives in an unprobed cell."""
    query_id_col = query_id_col or id_col
    cents = ivf_centroids(corpus, id_col, vec_col, n_cells=n_cells, seed=seed)
    if refine_sweeps:
        cents = ivf_refine_centroids(corpus, vec_col, cents, sweeps=refine_sweeps)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("__cv")
    ).withColumn("__cell", ivf_cell_ranking("__cv", cents)[0])
    q = (
        queries.select(
            F.col(query_id_col).alias("query_id"), as_double(F.col(vec_col)).alias("__qv")
        )
        .withColumn(
            "__cell",
            F.explode(F.slice(ivf_cell_ranking("__qv", cents), 1, n_probe)),
        )
    )
    scored = (
        c.join(q, "__cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    broadcast_right: bool = True,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: (id_a, id_b, cos_sim)
    with id_a < id_b and cosine ≥ threshold.

    O(n²/2) all-pairs — the verification tier of the dedup funnel. Use
    directly only on broadcast-small inputs (one side is broadcast, the
    other streamed, so the big side is never shuffled); at corpus scale
    feed it LSH bucket candidates (hyperplane_signature) instead of the
    raw table, exactly like ngram_jaccard_pairs vs minhash_lsh_candidates.
    """
    # Norms are computed once per ROW before the join (n of them), so the
    # O(n²) pair stage only pays for the dot product.
    a = df.select(
        F.col(id_col).alias("id_a"), as_double(F.col(vec_col)).alias("__va")
    ).withColumn("__na", l2_norm(F.col("__va")))
    b = df.select(
        F.col(id_col).alias("id_b"), as_double(F.col(vec_col)).alias("__vb")
    ).withColumn("__nb", l2_norm(F.col("__vb")))
    right = F.broadcast(b) if broadcast_right else b
    return (
        a.join(right, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def hyperplane_signature(vec: Column, dim: int, n_planes: int = 16, seed: int = 42) -> Column:
    """Random-hyperplane LSH signature (bigint bucket id).

    Plane p's components are derived deterministically from
    xxhash64(p, component_index, seed) mapped to ±1 — a Rademacher
    hyperplane; no stored model, any executor regenerates it. Sign of
    <v, plane_p> contributes bit p."""
    def plane_component(p: int, i: Column) -> Column:
        h = F.xxhash64(F.lit(p), i, F.lit(seed))
        return F.when(h.bitwiseAND(F.lit(1)) == 1, F.lit(1.0)).otherwise(F.lit(-1.0))

    def plane_mult(p: int):
        # closure factory — a default-arg lambda would be read as a
        # 3-param lambda and break the 2-arg zip_with contract
        return lambda x, i: x * plane_component(p, i)

    idx = F.sequence(F.lit(1), F.lit(dim))
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(vec, idx, plane_mult(p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("bigint"), p)).otherwise(F.lit(0).cast("bigint"))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    query_id_col: str | None = None,
) -> DataFrame:
    """Approximate top-k: hyperplane-bucket both sides, equi-join on the
    bucket, score only collisions. One shuffle on the bucket id; recall
    rises with fewer planes (bigger buckets) or multiple tables
    (union of several signatures)."""
    query_id_col = query_id_col or id_col
    sig = lambda v: hyperplane_signature(v, dim=dim, n_planes=n_planes)  # noqa: E731
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("__qv"),
    ).withColumn("__bucket", sig(F.col("__qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("__cv"),
    ).withColumn("__bucket", sig(F.col("__cv")))
    scored = (
        c.join(q, "__bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )
