"""Loaders for the driver-generated TPC-H-ish tables (TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``. Loading is a
pure plan operation — Catalyst prunes columns and pushes predicates into
the parquet scan, so callers should select/filter on the returned frame
rather than pre-materializing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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

# Bounded dimension tables that are always safe to broadcast in joins:
# region is 5 rows, nation 25 at every scale factor (TPC-H invariant).
BROADCAST_SAFE = frozenset({"region", "nation"})


# Catalyst's InferFiltersFromGenerate adds `size(e) > 0 AND isnotnull(e)`
# below every non-outer Generate. For the computed shingle/token arrays
# this engine explodes everywhere, that filter RE-EVALUATES the full
# array expression twice more per input row (regexp + transform +
# array_distinct), and predicate pushdown then moves it below the widen
# exchange onto the raw scan — at sf0.1 q_decontaminate's 5-gram explode
# measured 8.8 s fused vs 0.43 s without the rule (20×); at cluster
# scale the double evaluation alone doubles the most expensive map
# stage. The rows the rule would prune (empty arrays) are pruned by the
# Generate itself one operator later, so excluding it never changes any
# result. Applied per-session here (not only in session.get_spark) so
# the engine behaves identically in ANY caller-provided session — the
# driver's correctness harness builds its own.
_GENERATE_FILTER_RULE = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
)

# Schema memo per parquet path: schema inference costs a driver-side
# listing + footer read per spark.read.parquet call (~65 ms measured
# warm) and every query pays it 1-3× per run. Metadata only — no rows,
# no results are cached; the scan itself is unchanged. Keyed by path:
# the testdata files are immutable within a process lifetime.
_SCHEMA_CACHE: dict = {}


def _session_tuning(spark: SparkSession) -> None:
    # Queries must behave identically in ANY caller-provided session (the
    # driver builds its own): timestamp formatting/bucketing is only
    # deterministic vs the DuckDB oracle under UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        cur = spark.conf.get("spark.sql.optimizer.excludedRules", None)
    except Exception:  # noqa: BLE001 — conf surface differences
        cur = None
    if not cur:
        spark.conf.set("spark.sql.optimizer.excludedRules", _GENERATE_FILTER_RULE)
    elif _GENERATE_FILTER_RULE not in cur:
        spark.conf.set(
            "spark.sql.optimizer.excludedRules", cur + "," + _GENERATE_FILTER_RULE
        )


def _read_parquet_cached_schema(spark: SparkSession, path: str) -> DataFrame:
    sch = _SCHEMA_CACHE.get(path)
    if sch is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
        return df
    return spark.read.schema(sch).parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _session_tuning(spark)
    if name == "events":
        return _load_events(spark, sf_dir)
    return _read_parquet_cached_schema(spark, f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt events.ts to a plain session-local TIMESTAMP regardless of how
    the generator stored it. Two physical encodings exist across testdata
    generations: parquet TIMESTAMP(NANOS) (Spark 4 rejects it by default, so
    we read nanos-as-long and floor-truncate to µs, matching DuckDB's ns→µs
    truncation) and plain TIMESTAMP(MICROS) (read through as-is, cast
    NTZ→TIMESTAMP — identity under the UTC session zone forced above)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = _read_parquet_cached_schema(spark, f"{sf_dir}/events.parquet")
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # integral `div`, NOT `/`: float division of ~1.7e18 nanos loses the
        # last microsecond digit (double ulp > 0.5 at that magnitude)
        ts_col = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        ts_col = F.col("ts").cast(T.TimestampType())
    return df.select(
        "event_id",
        ts_col.alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in (names or TABLES))
