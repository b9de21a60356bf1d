"""Web-corpus curation queries, round 5: URL canonicalization and
corpus-level vocabulary statistics (Zipf table, n-gram frequencies).

These extend the q_text_* family (queries/llm.py) with the CORPUS-level
counterparts of its per-document stats: curation pipelines first profile
the vocabulary (rank/frequency, collocations) to calibrate quality
thresholds, and collapse crawl-URL variants before domain capping so one
site's utm-tagged duplicates don't count as distinct pages.

All pure built-in expressions — split/explode/window, no UDFs; the
explode fan-out is the word count (bounded by corpus token count), and
every aggregate is map-side combined on the shuffle key it groups by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl4s_spark.queries import query
from etl4s_spark.sources.tables import load_table


@query(
    "q_url_canonicalize",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'HTTPS://Site' || CAST(doc_id % 7 AS VARCHAR) || '.Example.COM'
               || '/p' || CAST(doc_id % 10 AS VARCHAR)
               || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
               || '?utm_source=feed&ref=' || CAST(doc_id % 5 AS VARCHAR)
               || CASE WHEN doc_id % 2 = 0 THEN '&utm_campaign=x' ELSE '' END
               || CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END AS url
      FROM documents
    ), parsed AS (
      SELECT doc_id, url,
             lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) AS host,
             regexp_replace(
               coalesce(regexp_extract(url, '^[A-Za-z]+://[^/?#]+(/[^?#]*)', 1), ''),
               '/$', '')                                             AS path,
             coalesce(regexp_extract(url, '[?]([^#]*)', 1), '')      AS query
      FROM urls
    ), canon AS (
      SELECT doc_id, url,
             'https://' || host || path ||
             CASE WHEN kept = '' THEN '' ELSE '?' || kept END AS canonical
      FROM (
        SELECT doc_id, url, host, path,
               array_to_string(
                 list_filter(string_split(query, '&'),
                             x -> x <> '' AND NOT starts_with(x, 'utm_')),
                 '&') AS kept
        FROM parsed
      )
    )
    SELECT canonical,
           CAST(count(*) AS BIGINT)              AS n_docs,
           CAST(count(DISTINCT url) AS BIGINT)   AS n_raw_variants,
           min(doc_id)                           AS first_doc
    FROM canon
    GROUP BY canonical
    HAVING count(DISTINCT url) > 1
    ORDER BY canonical
    """,
)
def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the crawl-dedup stage BEFORE domain
    capping: synthetic messy URLs (mixed-case scheme/host, utm tracking
    params, trailing slashes, fragments — deterministic per doc so both
    engines see identical strings) collapse to a canonical form
    (lowercased host, utm_* stripped, trailing slash and fragment
    dropped), then variant groups are counted. Without this, one page's
    tracking-tagged variants count as distinct URLs and survive
    per-domain caps. All string built-ins (parse_url is JVM-side
    codegen); one shuffle on the canonical key."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://Site"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".Example.COM/p"),
        (F.col("doc_id") % 10).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=feed&ref="),
        (F.col("doc_id") % 5).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("&utm_campaign=x")).otherwise(
            F.lit("")
        ),
        F.when(F.col("doc_id") % 4 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    with_url = d.select("doc_id", url.alias("url"))
    host = F.lower(F.parse_url("url", F.lit("HOST")))
    path = F.regexp_replace(
        F.coalesce(F.parse_url("url", F.lit("PATH")), F.lit("")), "/$", ""
    )
    qry = F.coalesce(F.parse_url("url", F.lit("QUERY")), F.lit(""))
    kept = F.array_join(
        F.filter(
            F.split(qry, "&"),
            lambda x: (x != "") & ~x.startswith("utm_"),
        ),
        "&",
    )
    canonical = F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
    )
    return (
        with_url.select("doc_id", "url", canonical.alias("canonical"))
        .groupBy("canonical")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_distinct("url").cast("long").alias("n_raw_variants"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_raw_variants") > 1)
        .orderBy("canonical")
    )


@query(
    "q_text_zipf",
    oracle="""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS word
      FROM documents WHERE text IS NOT NULL
    ), counts AS (
      SELECT word, count(*) AS freq
      FROM words WHERE word <> ''
      GROUP BY word
    )
    SELECT CAST(row_number() OVER (ORDER BY freq DESC, word) AS BIGINT) AS rank,
           word,
           CAST(freq AS BIGINT) AS freq
    FROM counts
    ORDER BY rank
    LIMIT 25
    """,
)
def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rank-frequency (Zipf) table: top-25 words with rank — the
    first thing profiled before setting stopword lists and quality
    thresholds. explode(split) → count per word (map-side combined on
    the word key) → global top-k. The final rank window runs over 25
    surviving rows only: orderBy+limit prunes to TakeOrdered BEFORE the
    rank is assigned, so the single-partition window touches k rows, not
    the vocabulary."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = counts.orderBy(F.col("freq").desc(), "word").limit(25)
    w = Window.orderBy(F.col("freq").desc(), "word")
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "word",
        F.col("freq").cast("long"),
    ).orderBy("rank")


@query(
    "q_text_ngram_topk",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ws
      FROM documents WHERE text IS NOT NULL
    ), grams AS (
      SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                                   i -> ws[i] || ' ' || ws[i + 1])) AS bigram
      FROM toks
    )
    SELECT bigram, CAST(count(*) AS BIGINT) AS freq
    FROM grams
    GROUP BY bigram
    ORDER BY freq DESC, bigram
    LIMIT 30
    """,
)
def q_text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram collocation table (top-30): the n-gram frequency
    profile behind boilerplate detection and LM evaluation. Bigrams are
    built with zip_with over the token array and its tail — array
    arithmetic inside the scan projection, exploded once; the count
    shuffles on the bigram key with map-side combine, and top-k is
    TakeOrdered with a total-order tie-break."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    ws = F.split("text", " ")
    grams = d.select(
        F.explode(
            F.zip_with(
                F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
                F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bigram")
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .orderBy(F.col("freq").desc(), "bigram")
        .limit(30)
    )


@query(
    "q_text_tfidf",
    oracle="""
    WITH docs AS (
      SELECT doc_id, source, string_split(text, ' ') AS ws
      FROM documents WHERE text IS NOT NULL
    ), n_docs AS (
      SELECT count(*) AS n FROM docs
    ), terms AS (
      SELECT doc_id, source, unnest(ws) AS term FROM docs
    ), clean AS (
      SELECT doc_id, source, term FROM terms WHERE term <> ''
    ), df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM clean GROUP BY term
    ), src_tf AS (
      SELECT source, term, count(*) AS tf FROM clean GROUP BY source, term
    ), scored AS (
      SELECT s.source, s.term,
             round(s.tf * ln(CAST(n.n AS DOUBLE) / d.df), 6) AS tfidf
      FROM src_tf s JOIN df d ON s.term = d.term CROSS JOIN n_docs n
    ), ranked AS (
      SELECT source, term, tfidf,
             row_number() OVER (PARTITION BY source
                                ORDER BY tfidf DESC, term) AS rn
      FROM scored
    )
    SELECT source, CAST(rn AS INT) AS rn, term, tfidf
    FROM ranked WHERE rn <= 3
    ORDER BY source, rn
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinguishing terms via TF-IDF — the lightweight
    topic fingerprint used to spot a source whose vocabulary drifts
    (scraper broke, boilerplate flooded in). Document frequency and
    per-source term frequency are INTEGER aggregates; the score
    multiplies those exact integers by one ln() at the end, so both
    engines compute identical doubles — no float summation anywhere.
    Plan: one explode scan feeds both aggregates (term key shuffle,
    map-side combined), df joins back on the term key, and the top-3
    per source compiles to a map-side WindowGroupLimit."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    clean = d.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    n_docs = d.count()
    df = clean.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    src_tf = clean.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = src_tf.join(df, "term").select(
        "source",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("source").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("source", F.col("rn").cast("int"), "term", "tfidf")
        .orderBy("source", "rn")
    )


@query(
    "q_text_readability",
    oracle="""
    WITH counts AS (
      SELECT doc_id,
             len(regexp_extract_all(lower(text), '[a-z]+'))      AS n_words,
             greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+'))   AS n_syllables
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT)     AS n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           round(206.835
                 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                 - 84.6  * (CAST(n_syllables AS DOUBLE) / n_words), 4) AS flesch
    FROM counts
    WHERE n_words > 0
    ORDER BY doc_id
    """,
)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document — the classic curation signal
    for separating prose from boilerplate/code (very low scores) and
    trivially-simple spam (very high). Syllables use the standard
    vowel-group proxy ([aeiouy]+ runs), sentences the terminal-punct
    runs, both as single regexp passes per document: three integer
    counts per row, zero shuffles before the final sort, and the
    formula's doubles are ratios of exact integers — identical in any
    engine. At 100 TB this is a free rider on whatever scan already
    touches the text (Catalyst collapses it into the same stage as the
    other q_text_* signals)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    lower = F.lower(F.col("text"))
    counts = d.select(
        "doc_id",
        F.regexp_count(lower, F.lit("[a-z]+")).alias("n_words"),
        F.greatest(
            F.lit(1), F.regexp_count(F.col("text"), F.lit("[.!?]+"))
        ).alias("n_sentences"),
        F.regexp_count(lower, F.lit("[aeiouy]+")).alias("n_syllables"),
    )
    return (
        counts.filter(F.col("n_words") > 0)
        .select(
            "doc_id",
            F.col("n_words").cast("long").alias("n_words"),
            F.col("n_sentences").cast("long").alias("n_sentences"),
            F.round(
                F.lit(206.835)
                - F.lit(1.015) * (F.col("n_words").cast("double") / F.col("n_sentences"))
                - F.lit(84.6) * (F.col("n_syllables").cast("double") / F.col("n_words")),
                4,
            ).alias("flesch"),
        )
        .orderBy("doc_id")
    )
