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
