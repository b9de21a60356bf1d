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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Queries must behave identically in ANY caller-provided session (the
    # driver builds its own): timestamp formatting/bucketing is only
    # deterministic vs the DuckDB oracle under UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
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
