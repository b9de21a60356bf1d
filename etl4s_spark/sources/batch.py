"""Batch source/sink node factories (SURVEY.md §2.B scans/sources/sinks).

The reference wraps these exact calls in Extract/Load nodes
(/root/reference/docs/examples-spark.md:19-41); here they are first-class
factories returning either DataFrames (given a SparkSession) or Layer-A
``Node``s for pipeline composition.

Scale notes: readers are declarative — column pruning and predicate
pushdown reach the parquet scan (verify with ``explain_str``); writers
support ``partition_by`` so downstream reads get partition pruning, and
``max_records_per_file`` to bound output file sizes at large SF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from etl4s_spark.core.node import Node


def scan_parquet(spark: SparkSession, path: str, columns: Sequence[str] | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def scan_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    header: bool = True,
    **options,
) -> DataFrame:
    reader = spark.read.options(header=str(header).lower(), **{k: str(v) for k, v in options.items()})
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def scan_json(spark: SparkSession, path: str, schema=None, **options) -> DataFrame:
    reader = spark.read.options(**{k: str(v) for k, v in options.items()})
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def scan_orc(spark: SparkSession, path: str, columns: Sequence[str] | None = None) -> DataFrame:
    """ORC scan — same pushdown/pruning properties as parquet (columnar,
    predicate pushdown reaches the reader; Spark ships the ORC datasource
    built in)."""
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def scan_text(spark: SparkSession, path: str, whole_text: bool = False) -> DataFrame:
    """Line-oriented (or whole-file) text scan → single ``value`` string
    column — the raw-corpus entry point for the text operators
    (operators/text.py)."""
    return spark.read.option("wholetext", str(whole_text).lower()).text(path)


def _jdbc_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    **options,
) -> dict[str, str]:
    """Build the option map for a JDBC scan (split out so the
    partitioned-read contract is testable without a database on the
    classpath)."""
    opts: dict[str, str] = {"url": url, "dbtable": table, "fetchsize": str(fetch_size)}
    partition_opts = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(o is not None for o in partition_opts):
        if any(o is None for o in partition_opts):
            raise ValueError(
                "partitioned JDBC read needs ALL of partition_column/"
                "lower_bound/upper_bound/num_partitions (got a subset) — "
                "otherwise Spark silently reads on ONE task"
            )
        opts.update(
            partitionColumn=str(partition_column),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    opts.update({k: str(v) for k, v in options.items()})
    return opts


def scan_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    **options,
) -> DataFrame:
    """JDBC scan (SURVEY.md §1.4 Extract parity — the reference maps
    Extract onto ``spark.read.jdbc`` alongside parquet/csv/json).

    Scale notes — a JDBC source is the ONE reader here with no parallel
    scan by default (one executor, one connection, one cursor):

    - ALWAYS pass the partition quad (``partition_column`` — an indexed
      numeric/date column, ``lower_bound``/``upper_bound`` — its real
      min/max, ``num_partitions``) for tables beyond toy size: Spark
      issues one range-predicate query per partition, in parallel.
      Bounds don't filter — rows outside land in the edge partitions —
      they only set stride, so a stale upper bound skews the last task.
    - ``dbtable`` accepts a subquery alias ``"(SELECT ...) t"`` to push
      projection/filter INTO the database; Catalyst additionally pushes
      simple predicates down to the source.
    - ``fetch_size`` overrides driver-default row batching (some
      drivers default to streaming row-at-a-time).
    - size ``num_partitions`` to what the database tolerates —
      1000 executors opening 1000 connections is a DDoS, not a scan;
      cap it and repartition Spark-side afterwards if needed.
    """
    return (
        spark.read.format("jdbc")
        .options(
            **_jdbc_options(
                url,
                table,
                partition_column,
                lower_bound,
                upper_bound,
                num_partitions,
                fetch_size,
                **options,
            )
        )
        .load()
    )


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    df.write.mode(mode).parquet(path)
    return path


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    df.write.mode(mode).orc(path)
    return path


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    """Text sink: requires a single string column (Spark contract)."""
    df.write.mode(mode).text(path)
    return path


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> str:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)
    return path


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> str:
    """Partitioned parquet write → downstream partition pruning.

    At 100 TB, choose low-cardinality partition columns (date, region) and
    bound file counts; high-cardinality partitioning creates a small-files
    problem.
    """
    writer = df.write.mode(mode).partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)
    return path


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> str:
    """Bucketed managed-table write (bucketBy requires saveAsTable).

    Two tables bucketed by the same keys into the same bucket count join
    WITHOUT a shuffle — each task reads matching bucket files from both
    sides (the plan shows SortMergeJoin with no Exchange under it;
    asserted in tests/test_plans.py). This is THE pattern for a fact
    table joined repeatedly on the same key at 100 TB: pay the shuffle
    once at write time, never again. ``sort_by`` additionally skips the
    per-task sort."""
    writer = df.write.mode(mode).format(format).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)
    return table


def compact_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 512,
    fmt: str = "parquet",
) -> str:
    """Small-files compaction: rewrite a directory of many small files
    into ~``target_file_mb``-sized ones. THE standing maintenance job of
    any long-lived table — streaming sinks and over-partitioned writes
    otherwise accumulate thousands of KB-sized files whose per-file
    open/footer/listing costs dominate scan time at 100 TB.

    File count = ceil(on-disk bytes / target). Uses coalesce (narrow, no
    shuffle — each output task concatenates input splits); prefer
    ``repartition`` instead when the input is also SKEWED, paying one
    shuffle to rebalance. Reads go through the normal scan path, so
    compaction composes with partition-directory layouts (compact each
    partition directory separately to keep pruning)."""
    import math

    sc = spark.sparkContext
    fs_path = sc._jvm.org.apache.hadoop.fs.Path(src_path)
    fs = fs_path.getFileSystem(sc._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(fs_path).getLength()
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(src_path)
    df.coalesce(n_files).write.mode("overwrite").format(fmt).save(dst_path)
    return dst_path


# Layer-A node factories -----------------------------------------------------

def extract_parquet(spark: SparkSession, path: str, columns: Sequence[str] | None = None) -> Node:
    """Extract node: ignores input, emits the scanned DataFrame (lazy plan)."""
    return Node(lambda _=None: scan_parquet(spark, path, columns), name=f"scan_parquet({path})")


def load_parquet(path: str, mode: str = "overwrite") -> Node:
    """Load node: writes its input DataFrame, passes the path through."""
    return Node(lambda df: write_parquet(df, path, mode), name=f"write_parquet({path})")
