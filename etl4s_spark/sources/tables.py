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
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in (names or TABLES))
