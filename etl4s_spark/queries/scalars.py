"""Scalar-function queries (SURVEY.md §2.B: string / date / math / array /
map / json / cast).

Everything here is a built-in ``pyspark.sql.functions`` expression —
JVM-side, inside whole-stage codegen, no Python in the row path. These
are the building blocks the LLM-data operators reuse (queries/llm.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl4s_spark.queries import query
from etl4s_spark.sources.tables import load_table


@query(
    "q_scalar_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                   AS name_upper,
           lower(p_brand)                                  AS brand_lower,
           trim(p_type)                                    AS type_trim,
           substring(p_name, 1, 5)                         AS name_prefix,
           p_brand || '/' || p_type                        AS brand_type,
           CAST(length(p_name) AS INTEGER)                 AS name_len,
           (p_name LIKE '%gold%')                          AS has_gold,
           regexp_extract(p_brand, '#([0-9]+)', 1)         AS brand_num,
           array_to_string(string_split(p_name, ' '), ',') AS name_words,
           replace(p_type, 'ECONOMY', 'ECO')               AS type_short,
           lpad(CAST(p_size AS VARCHAR), 4, '0')           AS size_padded
    FROM part
    ORDER BY p_partkey
    """,
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim("p_type").alias("type_trim"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.col("p_name").like("%gold%").alias("has_gold"),
        F.regexp_extract("p_brand", "#([0-9]+)", 1).alias("brand_num"),
        F.array_join(F.split("p_name", " "), ",").alias("name_words"),
        F.regexp_replace("p_type", "ECONOMY", "ECO").alias("type_short"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    ).orderBy("p_partkey")


@query(
    "q_scalar_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)                       AS order_year,
           CAST(month(o_orderdate) AS INTEGER)                      AS order_month,
           CAST(day(o_orderdate) AS INTEGER)                        AS order_day,
           CAST(dayofweek(o_orderdate) AS INTEGER) + 1              AS order_dow,
           CAST(quarter(o_orderdate) AS INTEGER)                    AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS DATE)           AS order_month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE)              AS due_date,
           date_diff('day', CAST(o_orderdate AS DATE),
                     DATE '2000-01-01')                             AS days_to_y2k,
           strftime(o_orderdate, '%Y-%m-%d')                        AS order_date_str
    FROM orders
    WHERE o_orderkey <= 1000
    ORDER BY o_orderkey
    """,
)
def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions. DuckDB dayofweek is 0=Sunday..6; Spark dayofweek
    is 1=Sunday..7 — the oracle adds 1 to align. Timestamp outputs are cast
    to DATE / string (FIXTURES.md §C tz rule)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") <= 1000)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            F.dayofweek("o_orderdate").alias("order_dow"),
            F.quarter("o_orderdate").alias("order_quarter"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("order_month_start"),
            F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
            F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
                "days_to_y2k"
            ),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q_scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / 7.0, 4)                 AS price_div_round,
           round(abs(l_discount - 0.05), 4)                AS disc_dev,
           CAST(ceil(l_quantity / 7.0) AS BIGINT)          AS qty_ceil,
           CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k_floor,
           round(power(l_quantity, 2), 4)                  AS qty_sq,
           round(sqrt(l_extendedprice), 4)                 AS price_sqrt,
           round(ln(l_extendedprice), 4)                   AS price_ln,
           round(log10(l_extendedprice), 4)                AS price_log10,
           CAST(l_quantity AS BIGINT) % 5                  AS qty_mod5,
           CAST(sign(l_discount - 0.05) AS DOUBLE)         AS disc_sign,
           round(exp(l_discount), 4)                       AS disc_exp,
           round(greatest(l_discount, l_tax), 4)           AS max_rate,
           round(least(l_discount, l_tax), 4)              AS min_rate
    FROM lineitem
    WHERE l_orderkey <= 300
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") <= 300)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") / 7.0, 4).alias("price_div_round"),
            F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
            F.ceil(F.col("l_quantity") / 7.0).alias("qty_ceil"),
            F.floor(F.col("l_extendedprice") / 1000.0).alias("price_k_floor"),
            F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
            F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
            F.round(F.log("l_extendedprice"), 4).alias("price_ln"),
            F.round(F.log10("l_extendedprice"), 4).alias("price_log10"),
            (F.col("l_quantity").cast("bigint") % 5).alias("qty_mod5"),
            F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
            F.round(F.exp("l_discount"), 4).alias("disc_exp"),
            F.round(F.greatest("l_discount", "l_tax"), 4).alias("max_rate"),
            F.round(F.least("l_discount", "l_tax"), 4).alias("min_rate"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q_scalar_array",
    oracle="""
    SELECT vec_id,
           len(embedding)                                          AS dim,
           array_to_string(list_transform(CAST(embedding[1:4] AS DOUBLE[]),
                               x -> printf('%.4f', round(x, 4) + 0.0)), ',') AS head4,
           list_contains(CAST(embedding AS DOUBLE[]),
                         CAST(embedding[1] AS DOUBLE))             AS contains_first,
           round(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 4) + 0.0 AS vec_sum,
           round(list_aggregate(CAST(embedding AS DOUBLE[]), 'max'), 4) AS vec_max,
           array_to_string(list_transform(CAST(embedding AS DOUBLE[]),
                               x -> printf('%.4f', round(x * 2.0, 4) + 0.0)), ',') AS doubled
    FROM embeddings
    WHERE vec_id < 50
    ORDER BY vec_id
    """,
)
def q_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops incl. higher-order transform/aggregate on the embedding
    column — the primitives behind cosine similarity (queries/llm.py).
    Floats are widened to double BEFORE arithmetic on both sides so the
    fold order produces bit-identical sums. Array outputs are emitted as
    comma-joined %.4f strings (round first, then fixed-format) because the
    driver canonicalizer cannot hash list cells and engine float→string
    repr differs (Spark 1.0E-4 vs DuckDB 0.0001)."""
    e = load_table(spark, sf_dir, "embeddings")
    dvec = F.transform(F.col("embedding"), lambda x: x.cast("double"))

    def _fmt4(x):
        # + 0.0 normalizes IEEE negative zero: DuckDB's round keeps -0.0
        # (printf -> "-0.0000") while Spark's BigDecimal round does not
        return F.format_string("%.4f", F.round(x, 4) + F.lit(0.0))

    return (
        e.filter(F.col("vec_id") < 50)
        .select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.array_join(
                F.transform(F.slice(dvec, 1, 4), lambda x: _fmt4(x)), ","
            ).alias("head4"),
            F.array_contains(dvec, F.element_at(dvec, 1)).alias("contains_first"),
            (
                F.round(F.aggregate(dvec, F.lit(0.0), lambda acc, x: acc + x), 4)
                + F.lit(0.0)
            ).alias("vec_sum"),
            F.round(F.array_max(dvec), 4).alias("vec_max"),
            F.array_join(
                F.transform(dvec, lambda x: _fmt4(x * 2.0)), ","
            ).alias("doubled"),
        )
        .orderBy("vec_id")
    )


@query(
    "q_scalar_map",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(CAST(json_keys(props) AS VARCHAR[])), ',')
                                                            AS prop_keys,
           CAST(json_extract(props, '$.k') AS INTEGER)      AS k_value,
           (CAST(json_extract(props, '$.k') AS INTEGER) IS NOT NULL) AS has_k
    FROM events
    WHERE event_id < 200
    ORDER BY event_id
    """,
)
def q_scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse the props JSON into map<string,int>, then
    map_keys / element_at — oracle expressed with DuckDB json functions."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), T.MapType(T.StringType(), T.IntegerType()))
    return (
        ev.filter(F.col("event_id") < 200)
        .select(
            "event_id",
            F.array_join(F.sort_array(F.map_keys(m)), ",").alias("prop_keys"),
            F.element_at(m, "k").alias("k_value"),
            F.element_at(m, "k").isNotNull().alias("has_k"),
        )
        .orderBy("event_id")
    )


@query(
    "q_scalar_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT)       AS k_int,
           CAST(json_extract(props, '$.k') AS BIGINT) * 10  AS k_scaled,
           json_valid(props)                                AS is_valid
    FROM events
    WHERE event_id < 200
    ORDER BY event_id
    """,
)
def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction: get_json_object (path-based, no schema) and
    from_json (schema-full) — both JVM-side."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), T.StructType([T.StructField("k", T.LongType())]))
    return (
        ev.filter(F.col("event_id") < 200)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            parsed.getField("k").alias("k_int"),
            (parsed.getField("k") * 10).alias("k_scaled"),
            F.when(F.from_json(F.col("props"), T.MapType(T.StringType(), T.StringType())).isNotNull(), True)
            .otherwise(False)
            .alias("is_valid"),
        )
        .orderBy("event_id")
    )


@query(
    "q_udtf_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text),
           '[^a-z0-9]+', ' ', 'g')), ' ')) AS word
    FROM documents
    WHERE doc_id < 50
    ORDER BY doc_id, word
    """,
)
def q_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral table function: explode the word array — one output row
    per (doc, word). The generator runs inside codegen; output cardinality
    (not input) drives downstream sizing at scale."""
    from etl4s_spark.operators.text import words as _words

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select("doc_id", F.explode(_words(F.col("text"))).alias("word")).orderBy(
        "doc_id", "word"
    )


@query(
    "q_scalar_cast",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec,
           CAST(l_quantity AS INTEGER)                     AS qty_int,
           CAST(l_quantity AS VARCHAR)                     AS qty_str,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR)       AS ship_date_str,
           CAST(l_linenumber AS DOUBLE)                    AS line_dbl,
           CAST(round(l_tax * 100, 0) AS SMALLINT)         AS tax_pct
    FROM lineitem
    WHERE l_orderkey <= 200
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q_scalar_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts incl. decimal(12,2) — decimal math avoids float drift in
    money columns; at scale prefer decimal for exact-sum requirements."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") <= 200)
        .select(
            "l_orderkey",
            "l_linenumber",
            # decimal→string on both sides: DuckDB's pandas path renders
            # DECIMAL as float64 ('35302.4') while Spark keeps Decimal
            # ('35302.40') — string-cast makes the formatting explicit
            F.col("l_extendedprice").cast("decimal(12,2)").cast("string").alias("price_dec"),
            F.col("l_quantity").cast("int").alias("qty_int"),
            F.col("l_quantity").cast("string").alias("qty_str"),
            F.col("l_shipdate").cast("date").cast("string").alias("ship_date_str"),
            F.col("l_linenumber").cast("double").alias("line_dbl"),
            F.round(F.col("l_tax") * 100, 0).cast("smallint").alias("tax_pct"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q_json_quarantine",
    oracle="""
    WITH fed AS (
      SELECT event_id,
             CASE WHEN event_id % 7 = 0 THEN '{' || props ELSE props END AS raw
      FROM events WHERE event_id < 5000
    )
    SELECT event_id,
           CASE WHEN json_valid(raw) THEN 'main' ELSE 'quarantine' END AS route,
           CASE WHEN json_valid(raw)
                THEN CAST(raw ->> 'k' AS BIGINT) END                   AS k
    FROM fed
    ORDER BY event_id
    """,
)
def q_json_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record quarantine (dead-letter routing) — the ingestion
    pattern every production feed needs: rows whose payload fails to
    parse are ROUTED, not dropped and not fatal. Corruption is injected
    deterministically (every 7th event gets a doubled brace) so both
    engines face identical bad records; parse success is decided by the
    engine's own JSON parser (from_json → null vs json_valid) and must
    agree. Zero shuffles — routing is a scan-stage expression; in
    production the quarantine branch fans out via partitioned write."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    raw = F.when(
        F.col("event_id") % 7 == 0, F.concat(F.lit("{"), F.col("props"))
    ).otherwise(F.col("props"))
    # try_parse_json → null VARIANT on malformed input (from_json's
    # PERMISSIVE mode would return a null-FIELDED struct instead, which
    # cannot distinguish corrupt payloads from valid-but-absent fields)
    parsed = F.try_parse_json(raw)
    valid = parsed.isNotNull()
    return (
        ev.select(
            "event_id",
            F.when(valid, F.lit("main")).otherwise(F.lit("quarantine")).alias("route"),
            F.when(valid, F.variant_get(parsed, "$.k", "bigint")).alias("k"),
        )
        .orderBy("event_id")
    )


@query(
    "q_scalar_variant",
    oracle="""
    WITH j AS (
      SELECT event_id,
             '{"user":{"id":' || CAST(user_id AS VARCHAR) || '},"tags":["t'
               || CAST(event_id % 3 AS VARCHAR) || '","x"]'
               || CASE WHEN event_id % 5 <> 0
                       THEN ',"depth":{"a":{"b":' || CAST(event_id % 7 AS VARCHAR) || '}}'
                       ELSE '' END
               || '}' AS js
      FROM events WHERE event_id < 1000
    )
    SELECT event_id,
           CAST(json_extract(js, '$.user.id') AS BIGINT)   AS uid,
           json_extract_string(js, '$.tags[0]')            AS tag0,
           CAST(json_extract(js, '$.depth.a.b') AS BIGINT) AS ab,
           CASE WHEN event_id % 5 <> 0
                THEN 'OBJECT<depth: OBJECT<a: OBJECT<b: BIGINT>>, tags: ARRAY<STRING>, user: OBJECT<id: BIGINT>>'
                ELSE 'OBJECT<tags: ARRAY<STRING>, user: OBJECT<id: BIGINT>>'
           END AS vschema
    FROM j ORDER BY event_id
    """,
)
def q_scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion of semi-structured JSON — the
    schema-on-read path for ragged event payloads: parse once into the
    binary VARIANT encoding, then typed point-extracts (variant_get
    with a JSON path + target type), absent-path tolerance
    (try_variant_get → NULL, no exception), and per-row shape discovery
    (schema_of_variant — proven against literal expected schemas, so
    the discovered shape is part of the oracle contract). VARIANT beats
    string get_json_object at scale because parsing happens ONCE and
    extracts navigate the binary encoding — re-parse per extract is the
    JSON hot-path tax (q_scalar_json measures that rung). JSON is
    synthesized deterministically per row (nested object, array, and a
    conditionally-absent branch) so both engines see identical
    documents."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    js = F.concat(
        F.lit('{"user":{"id":'),
        F.col("user_id").cast("string"),
        F.lit('},"tags":["t'),
        (F.col("event_id") % 3).cast("string"),
        F.lit('","x"]'),
        F.when(
            F.col("event_id") % 5 != 0,
            F.concat(
                F.lit(',"depth":{"a":{"b":'),
                (F.col("event_id") % 7).cast("string"),
                F.lit("}}"),
            ),
        ).otherwise(F.lit("")),
        F.lit("}"),
    )
    v = F.parse_json(js)
    return (
        ev.select("event_id", v.alias("v"))
        .select(
            "event_id",
            F.variant_get("v", "$.user.id", "bigint").alias("uid"),
            F.variant_get("v", "$.tags[0]", "string").alias("tag0"),
            F.try_variant_get("v", "$.depth.a.b", "bigint").alias("ab"),
            F.schema_of_variant("v").alias("vschema"),
        )
        .orderBy("event_id")
    )


@query(
    "q_scalar_try",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN (o_orderkey % 5) = 0 THEN NULL
                ELSE round(o_totalprice / (o_orderkey % 5), 4) END AS safe_div,
           TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN 'not a number'
                         ELSE CAST(o_orderkey AS VARCHAR) END AS BIGINT) AS safe_cast,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE o_orderkey * 1000000 END AS safe_mul
    FROM orders WHERE o_orderkey < 2000
    ORDER BY o_orderkey
    """,
)
def q_scalar_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe arithmetic: the try_* family (try_divide /
    try_cast / try_multiply) turns runtime errors — division by zero,
    malformed casts — into NULLs instead of failed jobs. Under ANSI SQL
    (Spark 4's default) a single bad row kills a 1000-executor stage at
    the last retry; try_* is the row-level quarantine that keeps the
    pipeline total, the scalar sibling of the PERMISSIVE-mode readers
    (q_csv_quarantine / q_json_quarantine). The oracle mirrors each
    error condition with explicit CASE guards (DuckDB's division
    semantics differ), making 'which rows were quarantined' part of the
    proven contract."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return (
        o.select(
            "o_orderkey",
            F.round(
                F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 5), 4
            ).alias("safe_div"),
            F.expr(
                "try_cast(CASE WHEN o_orderkey % 3 = 0 THEN 'not a number' "
                "ELSE CAST(o_orderkey AS STRING) END AS BIGINT)"
            ).alias("safe_cast"),
            F.when(F.col("o_orderkey") % 7 == 0, F.lit(None).cast("long"))
            .otherwise(F.try_multiply(F.col("o_orderkey"), F.lit(1000000)))
            .alias("safe_mul"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q_scalar_collation",
    oracle="""
    WITH names AS (
      SELECT c_custkey,
             CASE c_custkey % 4 WHEN 0 THEN upper(c_mktsegment)
                                WHEN 1 THEN lower(c_mktsegment)
                                WHEN 2 THEN c_mktsegment
                                ELSE concat(upper(substr(c_mktsegment, 1, 1)),
                                            lower(substr(c_mktsegment, 2)))
             END AS seg
      FROM customer
    )
    SELECT lower(seg) AS segment_ci,
           CAST(count(*) AS BIGINT)              AS n_customers,
           CAST(count(DISTINCT seg) AS BIGINT)   AS n_case_variants
    FROM names GROUP BY lower(seg) ORDER BY segment_ci
    """,
)
def q_scalar_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLATION-aware grouping (Spark 4.0 collations): mixed-case
    segment labels (deterministically scrambled per row so both engines
    see identical strings) group under UTF8_LCASE collation — equality,
    GROUP BY, and joins become case-insensitive WITHOUT rewriting every
    predicate through lower(), which is the migration story for
    case-insensitive legacy warehouses (SQL Server/MySQL defaults). The
    n_case_variants column counts the raw spellings each group
    absorbed, proving the collation actually collapsed them; output is
    normalized through lower() so the ORACLE (which groups by lower())
    hashes identically — DuckDB's NOCASE would pick a nondeterministic
    representative otherwise."""
    c = load_table(spark, sf_dir, "customer")
    seg = (
        F.when(F.col("c_custkey") % 4 == 0, F.upper("c_mktsegment"))
        .when(F.col("c_custkey") % 4 == 1, F.lower("c_mktsegment"))
        .when(F.col("c_custkey") % 4 == 2, F.col("c_mktsegment"))
        .otherwise(
            F.concat(
                F.upper(F.substring("c_mktsegment", 1, 1)),
                F.lower(F.expr("substring(c_mktsegment, 2)")),
            )
        )
    )
    names = c.select("c_custkey", seg.alias("seg"))
    return (
        names.groupBy(F.collate(F.col("seg"), "UTF8_LCASE").alias("seg_ci"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.count_distinct(F.collate(F.col("seg"), "UTF8_BINARY"))
            .cast("long")
            .alias("n_case_variants"),
        )
        .select(
            F.lower(F.col("seg_ci").cast("string")).alias("segment_ci"),
            "n_customers",
            "n_case_variants",
        )
        .orderBy("segment_ci")
    )


@query(
    "q_scalar_busdays",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderdate,
             isodow(o_orderdate) - 1 AS dow0
      FROM orders WHERE o_orderkey < 2000
    ), rolled AS (
      SELECT o_orderkey, o_orderdate, dow0,
             CASE WHEN dow0 = 5 THEN o_orderdate + INTERVAL 2 DAY
                  WHEN dow0 = 6 THEN o_orderdate + INTERVAL 1 DAY
                  ELSE o_orderdate END AS start_bd
      FROM base
    ), shifted AS (
      SELECT o_orderkey, o_orderdate, dow0, start_bd,
             isodow(start_bd) - 1 AS sd0
      FROM rolled
    )
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(dow0 AS INT)                 AS dow0,
           strftime(start_bd + (5 + 2 * ((sd0 + 5) // 5)) * INTERVAL 1 DAY,
                    '%Y-%m-%d')              AS ship_by,
           CAST(len(list_filter(generate_series(o_orderdate + INTERVAL 1 DAY,
                                                o_orderdate + INTERVAL 30 DAY,
                                                INTERVAL 1 DAY),
                                d -> isodow(d) <= 5)) AS INT) AS busdays_next30
    FROM shifted
    ORDER BY o_orderkey
    """,
)
def q_scalar_busdays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day calendar arithmetic — SLA deadlines ("ship within 5
    business days") and capacity windows (working days in the next 30)
    — entirely in closed-form integer date math: weekend starts roll to
    Monday, then result = start + n + 2·((dow + n) div 5) skips every
    crossed weekend without a calendar table or UDF; the 30-day window
    count is a higher-order filter over sequence(). Engine-portable
    because both sides derive Monday=0 weekday indices (Spark's
    Sunday-based dayofweek shifted, DuckDB's isodow − 1) and every
    operation is exact integer/date arithmetic."""
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    dow0 = (F.dayofweek("o_orderdate") + 5) % 7  # Monday=0 .. Sunday=6
    start_bd = F.when(dow0 == 5, F.date_add("o_orderdate", 2)).otherwise(
        F.when(dow0 == 6, F.date_add("o_orderdate", 1)).otherwise(F.col("o_orderdate"))
    )
    b = od.select(
        "o_orderkey",
        "o_orderdate",
        dow0.cast("int").alias("dow0"),
        start_bd.alias("start_bd"),
    ).withColumn("sd0", (F.dayofweek("start_bd") + 5) % 7)
    ship = F.expr("date_add(start_bd, CAST(5 + 2 * ((sd0 + 5) div 5) AS INT))")
    busdays = F.size(
        F.filter(
            F.sequence(
                F.date_add("o_orderdate", 1),
                F.date_add("o_orderdate", 30),
            ),
            lambda d: (F.dayofweek(d) + 5) % 7 <= 4,
        )
    )
    return b.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        "dow0",
        F.date_format(ship, "yyyy-MM-dd").alias("ship_by"),
        busdays.cast("int").alias("busdays_next30"),
    ).orderBy("o_orderkey")


@query(
    "q_scalar_explode_outer",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                         w -> len(w) >= 12) AS longwords
      FROM documents WHERE doc_id < 100
    ), exploded AS (
      SELECT t.doc_id, u.w
      FROM toks t LEFT JOIN (
        SELECT doc_id, unnest(longwords) AS w FROM toks
      ) u ON t.doc_id = u.doc_id
    )
    SELECT doc_id,
           CAST(count(w) AS BIGINT)  AS n_long_words,
           (count(w) = 0)            AS kept_as_null_row
    FROM exploded
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def q_scalar_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer semantics: rows whose array is EMPTY survive with
    a NULL element instead of vanishing — the difference between "docs
    with their long words" and "docs that happen to have long words".
    A plain explode here silently drops every doc below the length
    threshold, deflating downstream per-doc stats; the OUTER variant is
    the correct building block whenever per-row fan-out can be zero
    (the oracle mirrors it with a LEFT JOIN against the unnest). Same
    generator plan, null-row pass-through."""
    from etl4s_spark.operators.text import words

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    longwords = F.filter(words(F.col("text")), lambda w: F.length(w) >= 12)
    return (
        d.select("doc_id", F.explode_outer(longwords).alias("w"))
        .groupBy("doc_id")
        .agg(
            F.count("w").cast("long").alias("n_long_words"),
            (F.count("w") == 0).alias("kept_as_null_row"),
        )
        .orderBy("doc_id")
    )
