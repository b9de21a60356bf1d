"""Empty-input robustness: at scale a filtered slice of the corpus is
routinely EMPTY (a new partition, a quiet tenant, a predicate that
matches nothing), and every declared query must flow empty-in ->
empty-out (or a well-formed scalar row) instead of raising.

A full-surface empty sweep found exactly 12 crashers (round-6
continuation); each is pinned here against a zero-row dataset carrying
the REAL table schemas. The failure classes and fixes:

- ANSI DIVIDE_BY_ZERO on count-based ratios (funnel, corpus report) ->
  nullif guards;
- driver-side scalar collects returning None (balanced-sample floor,
  watermark sentinel bases) -> explicit defaults;
- theta sketch aggs throwing when evaluated over ZERO sketches ->
  groupBy a constant so zero groups means the agg never runs;
- schema inference failing on empty written directories (partitioned
  read-backs) and empty pandas frames (stream replay finals) ->
  explicit schemas / Arrow-table createDataFrame;
- PQ training on an empty corpus -> degenerate single-zero-codeword
  book keeps the query path well-formed.
"""

from __future__ import annotations

import pytest

from etl4s_spark.queries import QUERIES, load_all

load_all()

FORMER_CRASHERS = [
    "q_funnel_windowed",
    "q_sample_balanced",
    "q_pipeline_corpus_report",
    "q_agg_theta_intersection",
    "q_join_dynamic_partition_prune",
    "q_sink_partitioned_prune",
    "q_stream_bitmap_distinct_replay",
    "q_stream_upsert_replay",
    "q_stream_watermark_replay",
    "q_stream_session_replay",
    "q_time_travel",
    "q_sim_ann_pq",
]

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory, sf_dir):
    base = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        (
            spark.read.parquet(f"{sf_dir}/{t}.parquet")
            .limit(0)
            .write.mode("overwrite")
            .parquet(f"{base}/{t}.parquet")
        )
    return str(base)


@pytest.mark.parametrize("name", FORMER_CRASHERS)
def test_query_survives_empty_corpus(spark, empty_sf_dir, name):
    df = QUERIES[name](spark, empty_sf_dir)
    rows = df.collect()
    # empty-in -> empty-out, or a well-formed scalar/flag row (global
    # aggregates legitimately emit one row of zeros/NULLs)
    assert len(rows) <= 5, (name, rows[:5])


def test_null_vector_rows_survive_model_seeding(spark):
    """ADVERSARIAL_r07 nulls sweep: a corpus with NULL embedding arrays
    crashed the model-parameter collects (IVF centroids, PQ codebook
    seeds, semdedup cents: list(None)) and the vectorized L2-normalize
    UDF. NULL vectors must be excluded from seeding (they cannot define
    a centroid/codeword) and must pass through value UDFs as NULL."""
    from pyspark.sql import functions as F

    from etl4s_spark.functions.udfs import vec_l2_normalize
    from etl4s_spark.operators.similarity import ivf_centroids, pq_train

    rows = [
        (i, None if i % 4 == 0 else [float(i + j) for j in range(8)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = ivf_centroids(df, "vec_id", "embedding", n_cells=4)
    assert len(cents) == 4 and all(c is not None and len(c) == 8 for c in cents)

    books = pq_train(df, "vec_id", "embedding", dim=8, m_subspaces=2, n_codes=4)
    assert len(books) == 2 and all(len(b[0]) == 4 for b in books)

    out = df.select(
        "vec_id", vec_l2_normalize(F.col("embedding")).alias("nv")
    ).collect()
    assert len(out) == 40
    by_id = {r.vec_id: r.nv for r in out}
    assert by_id[0] is None  # NULL in -> NULL out
    assert by_id[1] is not None and abs(sum(x * x for x in by_id[1]) - 1.0) < 1e-9
