"""Source/sink round-trip queries (SURVEY.md §2.B "Scans / sources / sinks").

The engine-API write paths (csv/json/orc, partitioned, bucketed, file
compaction — sources/batch.py) were pytest-proven only; VERDICT r3 item 8
asked for driver-visible rows. These go further than the suggested
rows-only entries: each query writes with the API under test, reads the
artifact back, and aggregates the READ-BACK data, so the DuckDB oracle
(same aggregate over the original parquet) proves the round-trip preserved
values — a write bug (lost rows, mangled encodings, dropped partitions)
hash-mismatches instead of passing a row count.

Artifacts land under /tmp/etl4s_spark_sinks/<sf>/<query> with overwrite
mode — reruns are idempotent; no state leaks between rounds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl4s_spark.queries import query
from etl4s_spark.sources.batch import (
    compact_files,
    scan_csv,
    scan_json,
    scan_orc,
    write_bucketed,
    write_csv,
    write_partitioned,
)
from etl4s_spark.sources.tables import load_table


# Root for the sink round-trips' transient output files. Prefer tmpfs
# over disk-backed /tmp: the files are bounded (each sink writes a test-SF
# slice), rewritten every run, and the round-trip READ is part of the
# timed query — RAM-backed scratch removes the fsync/page-cache tax
# without changing a byte of what is written or read back.
# SPARK_GRAFT_SINK_TMP points a cluster at its real scratch mount.
_SINK_ROOT = os.environ.get("SPARK_GRAFT_SINK_TMP") or (
    "/dev/shm/etl4s_spark_sinks"
    if os.path.isdir("/dev/shm")
    else "/tmp/etl4s_spark_sinks"
)


def _sink_dir(sf_dir: str, name: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return f"{_SINK_ROOT}/{tag}/{name}"


def _drop_table_fully(spark: SparkSession, table: str) -> None:
    """DROP TABLE IF EXISTS *and* clear its orphaned warehouse directory.

    The catalog is per-session (in-memory by default) but the warehouse
    directory is on disk: a table written by a PREVIOUS session isn't in
    this session's catalog, so saveAsTable sees only the leftover
    location and fails with LOCATION_ALREADY_EXISTS. Every fresh driver
    run hits this on its second round — so clear both layers."""
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    loc = os.path.join(wh.path or wh.netloc or "spark-warehouse", table.lower())
    shutil.rmtree(loc, ignore_errors=True)


@query(
    "q_sink_csv_roundtrip",
    oracle="""
    SELECT l_returnflag,
           count(*)                        AS n,
           round(sum(l_quantity), 4)       AS sum_qty,
           CAST(max(l_shipdate) AS DATE)   AS max_ship
    FROM lineitem
    WHERE l_orderkey % 7 = 0
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink/source round-trip: write a typed projection with
    write_csv, re-read it with an EXPLICIT schema (the production csv
    posture — inference is a second full scan and guesses), aggregate
    the read-back rows. The oracle aggregates the original parquet, so
    any value lost to text serialization fails the hash, not just a
    row count. Dates travel as ISO strings; doubles as shortest
    round-trip repr (both lossless)."""
    path = _sink_dir(sf_dir, "csv_roundtrip")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 7 == 0)
    write_csv(
        li.select(
            "l_orderkey",
            "l_quantity",
            "l_returnflag",
            F.col("l_shipdate").cast("date").alias("ship_date"),
        ),
        path,
    )
    back = scan_csv(
        spark,
        path,
        schema="l_orderkey BIGINT, l_quantity DOUBLE, l_returnflag STRING, ship_date DATE",
        header=True,
    )
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.max("ship_date").alias("max_ship"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_sink_json_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           count(*)                      AS n,
           round(sum(o_totalprice), 4)   AS sum_price
    FROM orders
    WHERE o_orderkey % 5 = 0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink/source round-trip with an explicit read schema;
    doubles serialize as shortest round-trip repr so the re-read
    aggregate is bit-identical to aggregating the source."""
    path = _sink_dir(sf_dir, "json_roundtrip")
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 5 == 0)
    od.select("o_orderkey", "o_orderpriority", "o_totalprice").write.mode(
        "overwrite"
    ).json(path)
    back = scan_json(
        spark, path, schema="o_orderkey BIGINT, o_orderpriority STRING, o_totalprice DOUBLE"
    )
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_sink_orc_roundtrip",
    oracle="""
    SELECT p_brand,
           count(*)                        AS n,
           round(avg(p_retailprice), 4)    AS avg_price
    FROM part
    WHERE p_size > 25
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def q_sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink/source round-trip; the read-back filter (p_size > 25)
    reaches the ORC reader as a pushed predicate (asserted in
    tests/test_udfs_sources.py), so this also keeps the ORC pushdown
    path driver-visible."""
    path = _sink_dir(sf_dir, "orc_roundtrip")
    part = load_table(spark, sf_dir, "part")
    part.select("p_partkey", "p_brand", "p_size", "p_retailprice").write.mode(
        "overwrite"
    ).orc(path)
    back = scan_orc(spark, path).filter(F.col("p_size") > 25)
    return (
        back.groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
        .orderBy("p_brand")
    )


@query(
    "q_sink_partitioned_prune",
    oracle="""
    SELECT count(*)                       AS n,
           round(sum(o_totalprice), 4)    AS sum_price,
           count(DISTINCT o_custkey)      AS n_cust
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
    """,
)
def q_sink_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet write + partition-PRUNED read-back: the
    o_orderpriority predicate prunes to one partition directory (the
    scan's PartitionFilters — the layout that lets a 100 TB table serve
    a single-partition query by listing one directory). The oracle
    re-derives the same aggregate from the unpartitioned source."""
    path = _sink_dir(sf_dir, "partitioned_prune")
    od = load_table(spark, sf_dir, "orders")
    frame = od.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    write_partitioned(frame, path, partition_by=["o_orderpriority"])
    # explicit schema: no inference listing, and a zero-row write leaves
    # an empty directory that schema inference cannot read at all
    back = (
        spark.read.schema(frame.schema).parquet(path)
        .filter(F.col("o_orderpriority") == "1-URGENT")
    )
    return back.agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        F.countDistinct("o_custkey").alias("n_cust"),
    )


@query(
    "q_sink_bucketed_join",
    oracle="""
    SELECT c.c_mktsegment,
           count(*)                      AS n,
           round(sum(o.o_totalprice), 4) AS sum_price
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def q_sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table write + Exchange-free co-bucketed join: both sides
    bucketed by the join key into the same bucket count, so the join
    reads matching bucket files with NO shuffle (the pay-the-shuffle-
    once-at-write-time pattern for a fact table joined repeatedly on one
    key at 100 TB; plan asserted Exchange-free in tests). The oracle is
    the plain join on the original parquet."""
    tag = (os.path.basename(sf_dir.rstrip("/")) or "sf").replace(".", "_")
    cust_t, ord_t = f"etl4s_bkt_cust_{tag}", f"etl4s_bkt_ord_{tag}"
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    od = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    _drop_table_fully(spark, cust_t)
    _drop_table_fully(spark, ord_t)
    write_bucketed(cust, cust_t, ["c_custkey"], 8, sort_by=["c_custkey"])
    write_bucketed(od, ord_t, ["o_custkey"], 8, sort_by=["o_custkey"])
    c, o = spark.table(cust_t), spark.table(ord_t)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_maintenance_compact",
    oracle="""
    SELECT source,
           count(*)                        AS n,
           CAST(sum(n_chars) AS BIGINT)    AS total_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def q_maintenance_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction round-trip: deliberately shatter documents
    into 64 tiny files (what a streaming sink or over-partitioned write
    leaves behind), compact_files them back to byte-budgeted files, and
    aggregate the COMPACTED copy — the oracle proves the maintenance
    job is row- and value-preserving, the property that lets it run
    against a live 100 TB table."""
    shattered = _sink_dir(sf_dir, "compact_src")
    compacted = _sink_dir(sf_dir, "compact_dst")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(64).write.mode("overwrite").parquet(shattered)
    compact_files(spark, shattered, compacted, target_file_mb=512)
    back = spark.read.parquet(compacted)
    return (
        back.groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("total_chars"))
        .orderBy("source")
    )


@query(
    "q_scan_schema_evolution",
    oracle="""
    SELECT o_orderpriority,
           count(*)                                   AS n,
           count(o_totalprice)                        AS n_with_price,
           round(sum(coalesce(o_totalprice, 0)), 4)   AS sum_price
    FROM orders
    WHERE o_orderkey % 4 = 0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: generation 1 of a table is written WITHOUT
    a column (o_totalprice), generation 2 adds it; mergeSchema unions
    the file schemas on read and back-fills nulls for gen-1 rows — how
    a long-lived parquet table absorbs additive schema change without
    rewriting history. The oracle recreates the same visibility rule
    (price present only for even orderkeys = gen 2) from the original
    table. Count/sum over the merged read prove null back-fill exactly.

    Scale note: mergeSchema footer-merges EVERY file's schema — fine
    per-partition-directory, expensive corpus-wide; production pins the
    merged schema in a catalog and reads with an explicit schema, which
    is why the explicit-schema path (scan_csv/scan_json) is the default
    everywhere else in this repo."""
    path = _sink_dir(sf_dir, "schema_evolution")
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 4 == 0)
    gen1 = od.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderpriority"
    )
    gen2 = od.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    gen1.write.mode("overwrite").parquet(path)
    gen2.write.mode("append").parquet(path)
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.count("o_totalprice").alias("n_with_price"),
            F.round(F.sum(F.coalesce("o_totalprice", F.lit(0.0))), 4).alias(
                "sum_price"
            ),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_csv_quarantine",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 9 = 0 THEN 'quarantine' ELSE 'main' END AS route,
           CASE WHEN o_orderkey % 9 <> 0 THEN round(o_totalprice, 4) END  AS price
    FROM orders
    WHERE o_orderkey < 5000
    ORDER BY o_orderkey
    """,
)
def q_csv_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV dead-letter routing — the csv twin of q_json_quarantine:
    malformed rows (every 9th orderkey's price replaced with a
    non-numeric token before writing) read back under PERMISSIVE mode
    with columnNameOfCorruptRecord, which keeps the parseable fields,
    nulls the broken one, and captures the raw line — so bad rows ROUTE
    instead of failing the scan (FAILFAST) or vanishing (DROPMALFORMED).
    The oracle re-derives the corrupt set from the injection rule; the
    Spark side decides by its parser — they must agree exactly."""
    path = _sink_dir(sf_dir, "csv_quarantine")
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    line = F.concat_ws(
        ",",
        F.col("o_orderkey").cast("string"),
        F.when(F.col("o_orderkey") % 9 == 0, F.lit("NOT_A_NUMBER")).otherwise(
            F.col("o_totalprice").cast("string")
        ),
    )
    od.select(line.alias("value")).write.mode("overwrite").text(path)
    back = (
        spark.read.schema(
            "o_orderkey BIGINT, o_totalprice DOUBLE, _corrupt_record STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    bad = F.col("_corrupt_record").isNotNull()
    return back.select(
        "o_orderkey",
        F.when(bad, F.lit("quarantine")).otherwise(F.lit("main")).alias("route"),
        F.when(~bad, F.round("o_totalprice", 4)).alias("price"),
    ).orderBy("o_orderkey")


@query(
    "q_maintenance_delete",
    oracle="""
    SELECT o_orderpriority,
           count(*)                     AS n,
           round(sum(o_totalprice), 4)  AS sum_price
    FROM orders
    WHERE o_custkey % 13 <> 0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_maintenance_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Targeted deletion (right-to-be-forgotten) on an immutable-format
    table: the delete set (every 13th customer's orders) anti-joins out
    and the table REWRITES — parquet has no row deletes, so deletion IS
    a rewrite job (a lakehouse format narrows the rewrite to affected
    files; the dataflow is identical). The aggregate over the READ-BACK
    rewritten table must equal filtering the source — proving both that
    the victims are gone and that nothing else was touched. At scale,
    partition/z-order layout bounds the rewrite to files whose min/max
    overlap the delete keys."""
    path = _sink_dir(sf_dir, "maintenance_delete")
    od = load_table(spark, sf_dir, "orders")
    victims = od.filter(F.col("o_custkey") % 13 == 0).select("o_orderkey")
    od.join(victims, "o_orderkey", "left_anti").write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_scan_python_datasource",
    oracle="""
    WITH ids AS (SELECT unnest(generate_series(0, 999)) AS i),
    hs AS (
      SELECT i, (22695477 * i + 1) % 2147483647 AS h FROM ids
    ), rows_ AS (
      SELECT i AS doc_id,
             ['en','de','fr','es','pt'][CAST(h % 5 AS INT) + 1] AS lang,
             array_to_string(
               list_transform(
                 generate_series(0, CAST(3 + h % 6 AS INT) - 1),
                 k -> ['alpha','beta','gamma','delta','epsilon','zeta','eta','theta']
                        [CAST((h + 7 * k) % 8 AS INT) + 1]),
               ' ')                       AS text,
             CAST(3 + h % 6 AS BIGINT)    AS n_words
      FROM hs
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_words,
           min(text) AS first_text,
           CAST(min(doc_id) AS BIGINT) AS min_doc
    FROM rows_ GROUP BY lang ORDER BY lang
    """,
)
def q_scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom PYTHON DATA SOURCE (Spark 4 pyspark.sql.datasource) — the
    connector seam for sources Spark can't read natively, consumed
    through the ordinary spark.read.format() front door. The registered
    'synthdocs' source (sources/pyds.py) declares 8 independent
    partitions whose rows are PURE FUNCTIONS of the row id (LCG
    arithmetic, no RNG state), so the scan parallelizes like a parquet
    read, survives task retries bit-identically, and — the point of this
    entry — a DuckDB oracle can recompute the entire result from the
    same closed form. Partition planning, Python↔JVM Arrow transfer,
    and the aggregate all ride the normal DataFrame path."""
    from etl4s_spark.sources.pyds import register_synthdocs

    register_synthdocs(spark)
    docs = (
        spark.read.format("synthdocs")
        .option("n", 1000)
        .option("parts", 8)
        .load()
    )
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("total_words"),
            F.min("text").alias("first_text"),
            F.min("doc_id").cast("long").alias("min_doc"),
        )
        .orderBy("lang")
    )


@query(
    "q_sink_xml_roundtrip",
    oracle="""
    SELECT n_nationkey % 5                       AS region_bucket,
           CAST(count(*) AS BIGINT)              AS n,
           CAST(sum(length(n_name)) AS BIGINT)   AS name_chars
    FROM nation
    GROUP BY n_nationkey % 5
    ORDER BY region_bucket
    """,
)
def q_sink_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink/source round-trip — Spark 4.0's BUILT-IN xml format
    (the former spark-xml package, merged upstream: rowTag framing,
    schema-on-read). XML is the interchange format regulators and
    legacy ERP exports still speak; the queryable contract is that a
    write→read cycle preserves the relational content exactly, proven
    by aggregating the re-read frame against the source-table oracle.
    Integer-only aggregates (counts + name lengths) keep the hash
    immune to text-serialization float formatting."""
    path = _sink_dir(sf_dir, "xml_roundtrip")
    nat = load_table(spark, sf_dir, "nation")
    nat.select("n_nationkey", "n_name").write.mode("overwrite").format("xml").option(
        "rootTag", "nations"
    ).option("rowTag", "nation").save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .schema("n_nationkey BIGINT, n_name STRING")
        .load(path)
    )
    return (
        back.groupBy((F.col("n_nationkey") % 5).alias("region_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.length("n_name")).cast("long").alias("name_chars"),
        )
        .orderBy("region_bucket")
    )


@query(
    "q_join_dynamic_partition_prune",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT event_type FROM events
      WHERE event_type IN ('purchase', 'signup')
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT)                                AS n,
           CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def q_join_dynamic_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning: the fact table is laid out
    partitioned by event_type, and the pruning predicate arrives only
    at RUNTIME — through a join with a filtered dimension — not as a
    literal the planner can see. Spark broadcasts the dim side's keys
    into the fact SCAN as a dynamicpruning subquery, so only the 2
    matching partition directories are listed and read, exactly as if
    the filter had been static (tests/test_round5b_ops.py asserts the
    dynamicpruning expression in the executed plan). THE optimization
    that makes star-schema joins over a 100 TB date-partitioned fact
    viable; sums are exact cents."""
    path = _sink_dir(sf_dir, "dpp_fact")
    ev = load_table(spark, sf_dir, "events")
    frame = ev.select("event_id", "value", "event_type")
    write_partitioned(frame, path, partition_by=["event_type"])
    # explicit schema (see q_sink_partitioned_prune) — partition
    # discovery and dynamic pruning still come from the directory layout
    fact = spark.read.schema(frame.schema).parquet(path)
    dim = (
        ev.select("event_type")
        .distinct()
        .filter(F.col("event_type").isin("purchase", "signup"))
    )
    return (
        fact.join(dim, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("sum_cents"),
        )
        .orderBy("event_type")
    )


@query(
    "q_calendar_dim",
    oracle="""
    WITH span AS (
      SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS d0,
             CAST(last_day(max(o_orderdate)) AS DATE) AS d1
      FROM orders
    ), cal AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
      FROM span
    )
    SELECT d AS cal_date,
           CAST(isodow(d) AS INT) AS dow_iso,
           CAST(week(d) AS INT) AS iso_week,
           CAST(month(d) AS INT) AS month,
           CAST(quarter(d) AS INT) AS quarter,
           CAST(year(d) AS INT) AS year,
           CAST(CASE WHEN isodow(d) >= 6 THEN 1 ELSE 0 END AS INT) AS is_weekend,
           CAST(CASE WHEN d = last_day(d) THEN 1 ELSE 0 END AS INT) AS is_month_end
    FROM cal
    ORDER BY cal_date
    LIMIT 400
    """,
)
def q_calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated calendar DIMENSION over the fact span (first month
    start → last month end): ISO weekday/week, month, quarter, year,
    weekend and month-end flags — the conformed date dim every star
    schema joins instead of re-deriving date parts per query. Rows are
    BORN distributed from sequence+explode (never a driver loop); the
    only fact-table touch is the 1-row span aggregate. Numbering
    standardized on ISO (weekday()+1 ↔ isodow, weekofyear ↔ week —
    both ISO-8601 on both engines); bounded audit slice of 400 days
    with a total order."""
    o = load_table(spark, sf_dir, "orders")
    span = o.agg(
        F.trunc(F.min("o_orderdate"), "month").alias("d0"),
        F.last_day(F.max("o_orderdate")).alias("d1"),
    )
    cal = span.select(
        F.explode(F.sequence("d0", "d1")).alias("d")
    )
    return (
        cal.select(
            F.col("d").alias("cal_date"),
            (F.weekday("d") + 1).cast("int").alias("dow_iso"),
            F.weekofyear("d").cast("int").alias("iso_week"),
            F.month("d").cast("int").alias("month"),
            F.quarter("d").cast("int").alias("quarter"),
            F.year("d").cast("int").alias("year"),
            F.when(F.weekday("d") + 1 >= 6, 1).otherwise(0).cast("int").alias(
                "is_weekend"
            ),
            F.when(F.col("d") == F.last_day("d"), 1)
            .otherwise(0)
            .cast("int")
            .alias("is_month_end"),
        )
        .orderBy("cal_date")
        .limit(400)
    )


@query(
    "q_observe_inline_metrics",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_large,
           CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bad_status,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    """,
)
def q_observe_inline_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality metrics via the OBSERVATION API — the
    zero-extra-pass pattern (Spark's named-metric accumulators,
    Deequ's mechanism): counters ride the SAME job that consumes the
    data instead of separate validation scans. Here the consuming
    action is a count over the observed frame; the observed metrics
    (row count, large-order count, invalid-status count, exact cent
    mass) come back through the Observation handle and are returned as
    the 1-row result the oracle recomputes classically. This is the
    queries()-registered twin of the Layer-A ensure*/observe family
    (plans/observe.py): at 100 TB every pipeline stage carries these
    for free — the four aggregates here cost ZERO additional scans."""
    from pyspark.sql import Observation

    o = load_table(spark, sf_dir, "orders")
    obs = Observation("dq")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_totalprice") > 300000, 1).otherwise(0)).alias(
            "n_large"
        ),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("n_bad_status"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "total_cents"
        ),
    )
    observed.count()  # the consuming action; metrics ride along
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_large"], m["n_bad_status"], m["total_cents"])],
        "n_rows long, n_large long, n_bad_status long, total_cents long",
    )
