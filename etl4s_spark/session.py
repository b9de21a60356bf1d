"""SparkSession factory with scale-aware defaults.

Defaults follow the 100 TB design posture from SURVEY.md §4.2: AQE on
(runtime join re-planning, partition coalescing, skew-join splitting),
Arrow enabled for the Pandas-UDF slow path, UTC session timezone for
deterministic timestamp semantics, and shuffle partitions sized to the
local core count (on a real cluster this is overridden to ~2-3× total
cores / targeted at ~128 MB post-shuffle partitions — AQE coalescing
makes the exact number forgiving).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "etl4s_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or f"local[{DEFAULT_CPUS}]"
    shuffle = shuffle_partitions or int(DEFAULT_CPUS)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
