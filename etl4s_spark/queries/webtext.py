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

from etl4s_spark.functions.exact import d38
from etl4s_spark.operators.ranking import one_part
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
    w = Window.partitionBy(one_part("word")).orderBy(F.col("freq").desc(), "word")
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


@query(
    "q_seqlen_histogram",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
               AS n_tokens
      FROM documents
    ), b AS (
      SELECT doc_id, n_tokens,
             length(format('{:b}', n_tokens)) AS bucket
      FROM toks WHERE n_tokens > 0
    )
    SELECT CAST(bucket AS INT)                  AS bucket,
           CAST(1 << (bucket - 1) AS BIGINT)    AS lo_tokens,
           CAST((1 << bucket) - 1 AS BIGINT)    AS hi_tokens,
           CAST(count(*) AS BIGINT)             AS n_docs,
           CAST(sum(n_tokens) AS BIGINT)        AS total_tokens
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def q_seqlen_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length distribution in power-of-two buckets — the
    calibration input for sequence packing and context-length choice
    (what fraction of the corpus fits 2^k tokens?). The bucket is the
    BIT LENGTH of the token count (length of its binary rendering) —
    pure integer string ops, so bucket edges cannot drift the way
    floor(log2(x)) can when two libms disagree in the last ulp.
    One scan, one map-side-combined shuffle on ≤ ~20 bucket keys."""
    from etl4s_spark.operators.text import token_count

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(token_count(F.col("text")).alias("n_tokens")).filter(
        F.col("n_tokens") > 0
    )
    b = toks.withColumn("bucket", F.length(F.bin(F.col("n_tokens"))).cast("int"))
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .select(
            "bucket",
            F.expr("shiftleft(1L, bucket - 1)").cast("long").alias("lo_tokens"),
            F.expr("shiftleft(1L, bucket) - 1").cast("long").alias("hi_tokens"),
            "n_docs",
            "total_tokens",
        )
        .orderBy("bucket")
    )


@query(
    "q_corpus_drift",
    oracle="""
    WITH w AS (
      SELECT doc_id % 2 AS half,
             unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS word
      FROM documents
    ), wf AS (SELECT half, word, count(*) AS c FROM w WHERE word <> '' GROUP BY 1, 2),
    piv AS (
      SELECT word,
             coalesce(sum(c) FILTER (WHERE half = 0), 0) AS ca,
             coalesce(sum(c) FILTER (WHERE half = 1), 0) AS cb
      FROM wf GROUP BY word
    ), tot AS (
      SELECT sum(ca) AS na, sum(cb) AS nb, count(*) AS v FROM piv
    ), terms AS (
      SELECT CAST(round(
               ((p.ca + 1) / CAST(t.na + t.v AS DOUBLE))
               * ln( ((p.ca + 1) / CAST(t.na + t.v AS DOUBLE))
                   / ((p.cb + 1) / CAST(t.nb + t.v AS DOUBLE)) ) * 1000000000
             ) AS BIGINT) AS kl_ab_e9,
             CAST(round(
               ((p.cb + 1) / CAST(t.nb + t.v AS DOUBLE))
               * ln( ((p.cb + 1) / CAST(t.nb + t.v AS DOUBLE))
                   / ((p.ca + 1) / CAST(t.na + t.v AS DOUBLE)) ) * 1000000000
             ) AS BIGINT) AS kl_ba_e9
      FROM piv p, tot t
    )
    SELECT CAST(any_value(t.na) AS BIGINT) AS n_words_a,
           CAST(any_value(t.nb) AS BIGINT) AS n_words_b,
           CAST(any_value(t.v)  AS BIGINT) AS vocab,
           round(sum(kl_ab_e9) / 1000000000.0, 6) AS kl_ab,
           round(sum(kl_ba_e9) / 1000000000.0, 6) AS kl_ba
    FROM terms, tot t
    """,
)
def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift: smoothed unigram KL divergence between two halves
    of the corpus (even vs odd doc ids stand in for
    yesterday's-crawl-vs-today's) — the distribution-shift alarm a
    training-data pipeline runs before mixing a new dump in. Add-one
    smoothing over the JOINT vocabulary; each word's KL term is
    quantized to integer nano-nats and SUMMED EXACTLY (the float-sum
    engine-order trap cannot arise — FIXTURES §C). Plan: one word
    explode + one shuffle on word, then a 1-row broadcast of the
    totals; vocabulary-sized state only."""
    from etl4s_spark.operators.text import words

    d = load_table(spark, sf_dir, "documents")
    wf = (
        d.select((F.col("doc_id") % 2).alias("half"), F.explode(words(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("half", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    piv = wf.groupBy("word").agg(
        F.coalesce(F.sum(F.when(F.col("half") == 0, F.col("c"))), F.lit(0)).alias("ca"),
        F.coalesce(F.sum(F.when(F.col("half") == 1, F.col("c"))), F.lit(0)).alias("cb"),
    )
    tot = piv.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb"), F.count(F.lit(1)).alias("v")
    )
    j = piv.join(F.broadcast(tot))
    pa = (F.col("ca") + 1) / (F.col("na") + F.col("v")).cast("double")
    pb = (F.col("cb") + 1) / (F.col("nb") + F.col("v")).cast("double")
    terms = j.select(
        "na",
        "nb",
        "v",
        F.round(pa * F.log(pa / pb) * 1000000000).cast("long").alias("kl_ab_e9"),
        F.round(pb * F.log(pb / pa) * 1000000000).cast("long").alias("kl_ba_e9"),
    )
    return terms.agg(
        F.first("na").cast("long").alias("n_words_a"),
        F.first("nb").cast("long").alias("n_words_b"),
        F.first("v").cast("long").alias("vocab"),
        F.round(F.sum("kl_ab_e9") / 1000000000.0, 6).alias("kl_ab"),
        F.round(F.sum("kl_ba_e9") / 1000000000.0, 6).alias("kl_ba"),
    )


@query(
    "q_source_overlap",
    oracle="""
    WITH docs AS (
      SELECT source, string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS w
      FROM documents
    ), sh AS (
      SELECT DISTINCT source, s
      FROM (
        SELECT source,
               unnest(CASE WHEN len(w) >= 5
                    THEN list_distinct(list_transform(range(len(w) - 4),
                                       i -> array_to_string(w[i+1:i+5], ' ')))
                    ELSE [] END) AS s
        FROM docs
      )
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS shared_shingles
    FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY source_a, source_b
    """,
)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every source pair, how
    many DISTINCT 5-gram shingles they share — the triage view that
    tells you WHICH crawl dumps overlap before running pairwise dedup.
    Same shingle recipe as q_decontaminate; the self-join is on the
    shingle key, so fan-out per shingle is bounded by the number of
    sources containing it (≤ |sources|), never by corpus size; output
    is the |sources|² upper triangle. At 100 TB: join on
    xxhash64(shingle) longs, same plan."""
    from etl4s_spark.operators.text import normalize_text

    d = load_table(spark, sf_dir, "documents")
    w = F.split(normalize_text(F.col("text")), " ")
    shingles = F.when(
        F.size(w) >= 5,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(w) - 5),
                lambda i: F.array_join(F.slice(w, i + 1, 5), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    # keys are xxhash64(shingle) longs (the docstring's "production"
    # form: 8-byte shuffle keys; the oracle counts distinct STRINGS —
    # equal unless xxhash64 collides inside one pair's shingle set,
    # ~2⁻⁶⁴·n²); and instead of a 5M×5M self-join, each shingle's
    # ≤|sources| owner set is collected once and its ordered pairs are
    # generated MAP-SIDE from the sorted array (the basket-pairs shape)
    # — one shuffle on the hash, pair fan-out bounded by |sources|²
    # per shingle, never corpus size.
    from etl4s_spark.operators.parallelism import widen

    # single-split local parquet serializes the shingle-array build +
    # explode onto ONE core (3.7 of the 4.5 s) — widen() BEFORE the
    # heavy projection, exactly the substring-dedup fix (FIXTURES §C.2)
    sh = widen(d.select("doc_id", "source", "text"), "doc_id").select(
        "source", F.explode(shingles).alias("s")
    ).select("source", F.xxhash64("s").alias("s"))
    # collect_set dedups (source, shingle) inside the aggregation — no
    # separate distinct exchange; the explode feeds ONE shuffle total
    owners = sh.groupBy("s").agg(F.array_sort(F.collect_set("source")).alias("srcs"))
    pairs = owners.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("srcs"),
                    lambda x, i: F.transform(
                        F.slice(F.col("srcs"), i + 2, F.size(F.col("srcs"))),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("pr")
    )
    return (
        pairs.groupBy(
            F.col("pr.a").alias("source_a"), F.col("pr.b").alias("source_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_shingles"))
        .orderBy("source_a", "source_b")
    )


@query(
    "q_text_bm25",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS word
      FROM documents
    ), tf AS (
      SELECT doc_id, word, count(*) AS f FROM w WHERE word <> '' GROUP BY 1, 2
    ), dl AS (
      SELECT doc_id, sum(f) AS dl FROM tf GROUP BY doc_id
    ), stats AS (
      SELECT count(*) AS n_docs, sum(dl) AS total_len FROM dl
    ), dfreq AS (
      SELECT word, count(*) AS df FROM tf
      WHERE word IN ('data', 'model', 'system') GROUP BY word
    ), scored AS (
      SELECT t.doc_id,
             CAST(round(
               ln((s.n_docs - q.df + 0.5) / (q.df + 0.5) + 1)
               * (t.f * 2.2)
               / (t.f + 1.2 * (1 - 0.75 + 0.75 * d.dl
                               / (CAST(s.total_len AS DOUBLE) / s.n_docs)))
               * 1000000000) AS BIGINT) AS s_e9
      FROM tf t
      JOIN dfreq q ON t.word = q.word
      JOIN dl d ON t.doc_id = d.doc_id
      CROSS JOIN stats s
    )
    SELECT doc_id, round(sum(s_e9) / 1000000000.0, 4) AS bm25
    FROM scored
    GROUP BY doc_id
    ORDER BY sum(s_e9) DESC, doc_id
    LIMIT 20
    """,
)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking (k₁=1.2, b=0.75) of the corpus against the query
    {data, model, system} — the lexical-retrieval scorer that still
    anchors hybrid search. Term frequencies, document lengths, and
    document frequencies are exact integers from two shuffles (word,
    doc); the three per-term score doubles are nano-quantized and
    summed exactly (KL rule), so ranking ties and the oracle hash are
    engine-stable. The query-term table is tiny → broadcast; corpus
    scanned once; TakeOrdered(20) finishes without a global sort."""
    from etl4s_spark.operators.text import words

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(words(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("f").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )
    dfreq = (
        tf.filter(F.col("word").isin("data", "model", "system"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    term = (
        idf
        * (F.col("f") * 2.2)
        / (F.col("f") + 1.2 * (1 - 0.75 + 0.75 * F.col("dl") / avgdl))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "word")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .select("doc_id", F.round(term * 1000000000).cast("long").alias("s_e9"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("s_e9").alias("total_e9"))
        .select("doc_id", F.round(F.col("total_e9") / 1000000000.0, 4).alias("bm25"))
        .orderBy(F.desc("total_e9"), "doc_id")
        .limit(20)
    )


_RAKE_STOPS = "('the','and','of','is','in','to','a','with','for','on','as','by','at','it','this','that')"


@query(
    "q_text_rake",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, i AS pos, word, word IN {_RAKE_STOPS} AS is_stop
      FROM (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS ws
        FROM documents
      ), unnest(generate_series(1, len(ws))) AS t(i),
      LATERAL (SELECT ws[i] AS word) lw
      WHERE word <> ''
    ), islands AS (
      SELECT doc_id, pos, word,
             pos - row_number() OVER (PARTITION BY doc_id, is_stop ORDER BY pos) AS isl
      FROM w WHERE NOT is_stop
    ), phrases AS (
      SELECT doc_id, isl,
             array_to_string(list(word ORDER BY pos), ' ') AS phrase,
             count(*) AS plen
      FROM islands GROUP BY doc_id, isl
      HAVING count(*) BETWEEN 2 AND 4
    ), members AS (
      SELECT p.doc_id, p.isl, p.phrase, p.plen, i.word
      FROM phrases p JOIN islands i
        ON p.doc_id = i.doc_id AND p.isl = i.isl
    ), wordstats AS (
      SELECT word,
             count(*)    AS freq,
             sum(plen)   AS degree
      FROM members GROUP BY word
    ), scored AS (
      SELECT m.phrase,
             sum(CAST(round(CAST(ws.degree AS DOUBLE) / ws.freq * 1000000000)
                      AS BIGINT)) AS score_e9
      FROM members m JOIN wordstats ws ON m.word = ws.word
      GROUP BY m.doc_id, m.isl, m.phrase
    )
    SELECT phrase,
           CAST(count(*) AS BIGINT)            AS n_occurrences,
           round(any_value(score_e9) / 1000000000.0, 4) AS rake_score
    FROM scored
    GROUP BY phrase, score_e9
    ORDER BY score_e9 DESC, phrase
    LIMIT 20
    """,
)
def q_text_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free runs (2–4 words), each scored by the sum
    of its members' degree/frequency ratios — co-occurrence weight
    without any model. The phrase segmentation is the gaps-and-islands
    construction (pos − row_number over non-stop words, partitioned per
    doc), word stats aggregate map-side on the word key, and per-word
    ratios are nano-quantized so phrase scores sum exactly. Top-20 by
    score with a total-order tie-break; two shuffles (islands, word
    stats) plus the final TakeOrdered."""
    from pyspark.sql.window import Window as W

    from etl4s_spark.operators.text import words

    stops = [s.strip("'") for s in _RAKE_STOPS.strip("()").split(",")]
    d = load_table(spark, sf_dir, "documents")
    w = (
        d.select("doc_id", F.posexplode(words(F.col("text"))).alias("pos0", "word"))
        .filter(F.col("word") != "")
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "word",
                F.col("word").isin(*stops).alias("is_stop"))
    )
    islands = w.filter(~F.col("is_stop")).select(
        "doc_id",
        "pos",
        "word",
        (
            F.col("pos")
            - F.row_number().over(W.partitionBy("doc_id", "is_stop").orderBy("pos"))
        ).alias("isl"),
    )
    phrases = (
        islands.groupBy("doc_id", "isl")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("word")))
                    ),
                    lambda s: s["word"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).alias("plen"),
        )
        .filter(F.col("plen").between(2, 4))
    )
    members = phrases.join(islands, ["doc_id", "isl"]).select(
        "doc_id", "isl", "phrase", "plen", "word"
    )
    wordstats = members.groupBy("word").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("degree")
    )
    scored = (
        members.join(wordstats, "word")
        .groupBy("doc_id", "isl", "phrase")
        .agg(
            F.sum(
                F.round(F.col("degree").cast("double") / F.col("freq") * 1000000000)
                .cast("long")
            ).alias("score_e9")
        )
    )
    return (
        scored.groupBy("phrase", "score_e9")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .select(
            "phrase",
            "n_occurrences",
            F.round(F.col("score_e9") / 1000000000.0, 4).alias("rake_score"),
        )
        .orderBy(F.desc("score_e9"), "phrase")
        .limit(20)
    )


@query(
    "q_text_vocab_growth",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS word
      FROM documents
    ), firsts AS (
      SELECT word, min(doc_id) AS first_doc
      FROM w WHERE word <> '' GROUP BY word
    ), n AS (SELECT count(*) AS nd FROM documents),
    bucketed AS (
      SELECT least(9, (first_doc * 10) // n.nd) AS decile, count(*) AS new_words
      FROM firsts, n GROUP BY 1
    )
    SELECT CAST(decile AS INT) AS corpus_decile,
           CAST(new_words AS BIGINT) AS new_words,
           CAST(sum(new_words) OVER (ORDER BY decile
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
    FROM bucketed
    ORDER BY corpus_decile
    """,
)
def q_text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps' law profile): how many NEW words
    each additional tenth of the corpus contributes, and the cumulative
    vocabulary size — the curve that says whether more crawl keeps
    buying vocabulary or has saturated (tokenizer sizing, dedup
    health). Computed in ONE pass: each word's FIRST document (min
    doc_id per word — map-side combined), bucketed by corpus decile;
    no prefix re-scans, no distinct-over-growing-windows. The
    cumulative sum runs over 10 rows."""
    from etl4s_spark.operators.text import words

    d = load_table(spark, sf_dir, "documents")
    nd = d.count()  # scalar bound for the decile rule (count-only scan)
    firsts = (
        d.select("doc_id", F.explode(words(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    bucketed = firsts.groupBy(
        F.least(F.lit(9), F.expr(f"(first_doc * 10) div {nd}")).alias("decile")
    ).agg(F.count(F.lit(1)).alias("new_words"))
    w = Window.partitionBy(one_part("decile")).orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return bucketed.select(
        F.col("decile").cast("int").alias("corpus_decile"),
        F.col("new_words").cast("long").alias("new_words"),
        F.sum("new_words").over(w).cast("long").alias("vocab_size"),
    ).orderBy("corpus_decile")


@query(
    "q_text_pmi_bigrams",
    oracle="""
    WITH toks AS (
      SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents WHERE text IS NOT NULL
    ), uni AS (
      SELECT unnest(ws) AS word FROM toks
    ), uc AS (
      SELECT word, count(*) AS c FROM uni GROUP BY word
    ), nt AS (
      SELECT sum(c) AS n FROM uc
    ), grams AS (
      SELECT ws[i] AS a, ws[i + 1] AS b
      FROM toks, unnest(generate_series(1, len(ws) - 1)) AS g(i)
    ), bc AS (
      SELECT a, b, count(*) AS cab FROM grams GROUP BY a, b
    ), mt AS (
      SELECT sum(cab) AS m FROM bc
    ), scored AS (
      SELECT a || ' ' || b AS bigram,
             CAST(cab AS BIGINT) AS n_pair,
             round(ln(CAST(cab * n * n AS DOUBLE)
                      / CAST(m * ca.c * cb.c AS DOUBLE)), 6) AS pmi
      FROM bc
      JOIN uc ca ON ca.word = bc.a
      JOIN uc cb ON cb.word = bc.b
      CROSS JOIN nt CROSS JOIN mt
      WHERE cab >= 5
    )
    SELECT bigram, n_pair, pmi
    FROM scored ORDER BY pmi DESC, bigram LIMIT 20
    """,
)
def q_text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PMI collocations (min support 5) — the statistic behind
    multi-word-expression mining and boilerplate phrase detection:
    PMI = ln(P(ab)/(P(a)P(b))) rewritten as ln(c_ab·N² / (M·c_a·c_b))
    so the log argument is a ratio of two exact bigint products (raw
    frequency ordering — q_text_ngram_topk — surfaces stopword pairs;
    PMI surfaces pairs that co-occur far above chance). Empty tokens
    are filtered from the token ARRAY before pairing, so adjacency is
    over real words on both engines. One ln per surviving bigram on
    identical doubles (the q_text_tfidf precedent), rounded to 6 dp,
    ordered with a bigram tie-break. At 100 TB: two shuffles (unigram
    and bigram counts, both map-side combined), unigram counts join the
    bigram table twice on the word key, scalars N and M broadcast."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    ws = F.filter(F.split("text", " "), lambda x: x != "")
    toks = d.select(ws.alias("ws"))
    uni = toks.select(F.explode("ws").alias("word"))
    uc = uni.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    nt = uc.agg(F.sum("c").alias("n"))
    tail_len = F.greatest(F.size("ws") - 1, F.lit(0))
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice("ws", 1, tail_len),
                F.slice("ws", 2, tail_len),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    bc = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cab"))
    mt = bc.agg(F.sum("cab").alias("m"))
    ca = uc.select(F.col("word").alias("a"), F.col("c").alias("c_a"))
    cb = uc.select(F.col("word").alias("b"), F.col("c").alias("c_b"))
    scored = (
        bc.filter(F.col("cab") >= 5)
        .join(ca, "a")
        .join(cb, "b")
        .join(F.broadcast(nt))
        .join(F.broadcast(mt))
        .select(
            F.concat("a", F.lit(" "), "b").alias("bigram"),
            F.col("cab").cast("long").alias("n_pair"),
            F.round(
                F.log(
                    # d38 lane: cab*N^2 reaches 1e18+ once the corpus
                    # passes ~1e9 tokens (the SCALING_100X overflow
                    # class; DuckDB's sums are already hugeint)
                    (d38("cab") * d38("n") * d38("n")).cast("double")
                    / (d38("m") * d38("c_a") * d38("c_b")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "bigram").limit(20)


@query(
    "q_text_vocab_coverage",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
      FROM documents WHERE text IS NOT NULL
    ), wc AS (
      SELECT word, count(*) AS c FROM toks GROUP BY word
    ), classes AS (
      SELECT c, count(*) AS nw, c * count(*) AS tok FROM wc GROUP BY c
    ), cum AS (
      SELECT c, nw, tok,
             sum(nw)  OVER (ORDER BY c DESC ROWS UNBOUNDED PRECEDING) AS cw,
             sum(tok) OVER (ORDER BY c DESC ROWS UNBOUNDED PRECEDING) AS ct
      FROM classes
    ), tot AS (
      SELECT sum(nw) AS v, sum(tok) AS t FROM classes
    ), ks AS (
      SELECT unnest([10, 100, 1000, 10000]) AS k
    ), hit AS (
      SELECT k, c, cw, ct,
             row_number() OVER (PARTITION BY k ORDER BY cw) AS rn
      FROM ks JOIN cum ON cum.cw >= ks.k
    )
    SELECT CAST(ks.k AS INT) AS k,
           CAST(least(ks.k, tot.v) AS BIGINT) AS vocab_used,
           CAST(coalesce(hit.ct - (hit.cw - ks.k) * hit.c, tot.t) AS BIGINT)
             AS covered_tokens,
           CAST(tot.t AS BIGINT) AS total_tokens,
           round(CAST(coalesce(hit.ct - (hit.cw - ks.k) * hit.c, tot.t) AS DOUBLE)
                 / CAST(tot.t AS DOUBLE), 6) AS coverage
    FROM ks
    LEFT JOIN hit ON hit.k = ks.k AND hit.rn = 1
    CROSS JOIN tot
    ORDER BY k
    """,
)
def q_text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token coverage of a top-k frequency vocabulary (k ∈ {10, 100,
    1000, 10000}) — the tokenizer-design curve: what fraction of corpus
    tokens a k-word vocab explains. Computed from the FREQUENCY-CLASS
    histogram, not a rank window over the vocabulary: words collapse to
    (freq → n_words, tokens) classes, the cumulative window runs over
    distinct frequencies (hundreds of rows under Zipf, regardless of
    corpus size — the rank-over-V formulation would put the whole
    vocabulary through one partition), and rank k lands inside a class
    by exact interpolation covered = ct − (cw − k)·c, all bigint. One
    float division per output row, 6 dp; k beyond the vocabulary
    clamps to full coverage via the left join."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    ws = F.filter(F.split("text", " "), lambda x: x != "")
    wc = (
        d.select(F.explode(ws).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    classes = (
        wc.groupBy("c")
        .agg(F.count(F.lit(1)).alias("nw"))
        .select("c", "nw", (F.col("c") * F.col("nw")).alias("tok"))
        .localCheckpoint(eager=True)  # count-class histogram (bounded); reused by cum window AND totals
    )
    # cumulative window over the bounded frequency-class histogram:
    # one_part declares the single bounded partition explicitly (the
    # global order is unchanged — the key is constant 0 for every row;
    # plan-audit gate, see operators/ranking.py one_part)
    from etl4s_spark.operators.ranking import one_part

    wo = (
        Window.partitionBy(one_part("c"))
        .orderBy(F.col("c").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = classes.select(
        "c",
        F.sum("nw").over(wo).alias("cw"),
        F.sum("tok").over(wo).alias("ct"),
    )
    tot = classes.agg(F.sum("nw").alias("v"), F.sum("tok").alias("t"))
    ks = spark.createDataFrame([(10,), (100,), (1000,), (10000,)], "k int")
    hit = (
        F.broadcast(ks)
        .join(cum, cum["cw"] >= ks["k"])
        .withColumn("rn", F.row_number().over(Window.partitionBy("k").orderBy("cw")))
        .filter(F.col("rn") == 1)
        .select("k", "c", "cw", "ct")
    )
    covered = F.coalesce(
        F.col("ct") - (F.col("cw") - F.col("k")) * F.col("c"), F.col("t")
    )
    return (
        ks.join(hit, "k", "left")
        .join(F.broadcast(tot))
        .select(
            F.col("k").cast("int"),
            F.least(F.col("k").cast("long"), F.col("v")).cast("long").alias(
                "vocab_used"
            ),
            covered.cast("long").alias("covered_tokens"),
            F.col("t").cast("long").alias("total_tokens"),
            F.round(covered.cast("double") / F.col("t").cast("double"), 6).alias(
                "coverage"
            ),
        )
        .orderBy("k")
    )


@query(
    "q_text_lexical_profile",
    oracle="""
    WITH toks AS (
      SELECT source,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
      FROM documents WHERE text IS NOT NULL
    ), wc AS (
      SELECT source, word, count(*) AS c FROM toks GROUP BY source, word
    )
    SELECT source,
           CAST(sum(c) AS BIGINT)                          AS n_tokens,
           CAST(count(*) AS BIGINT)                        AS vocab,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           round(CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
             AS type_token_ratio,
           round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6)            AS hapax_share,
           round(CAST(sum(len(word) * c) AS DOUBLE)
                 / CAST(sum(c) AS DOUBLE), 6)              AS avg_word_len
    FROM wc GROUP BY source ORDER BY source
    """,
)
def q_text_lexical_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical richness profile: type-token ratio, hapax-
    legomenon share, and mean word length — the trio that separates
    natural prose (TTR ~0.4–0.7, hapax-heavy) from boilerplate or
    generated spam (tiny TTR, hapax-poor) when triaging sources before
    training. Two map-side-combined shuffles: (source, word) counts,
    then a per-source rollup whose state is bounded by vocabulary, not
    corpus; every ratio is a division of two exact bigints rounded to
    6 dp (char mass Σ len(w)·c is integer arithmetic on the count
    table, so the fact rows are never re-scanned)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    ws = F.filter(F.split("text", " "), lambda x: x != "")
    wc = (
        d.select("source", F.explode(ws).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        wc.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("long")
            .alias("hapax"),
            F.sum(F.length("word") * F.col("c")).alias("char_mass"),
        )
        .select(
            "source",
            "n_tokens",
            "vocab",
            "hapax",
            F.round(
                F.col("vocab").cast("double") / F.col("n_tokens").cast("double"), 6
            ).alias("type_token_ratio"),
            F.round(
                F.col("hapax").cast("double") / F.col("vocab").cast("double"), 6
            ).alias("hapax_share"),
            F.round(
                F.col("char_mass").cast("double") / F.col("n_tokens").cast("double"),
                6,
            ).alias("avg_word_len"),
        )
        .orderBy("source")
    )


@query(
    "q_text_powerlaw_fit",
    oracle="""
    WITH words AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
      FROM documents WHERE text IS NOT NULL
    ), counts AS (
      SELECT word, count(*) AS freq FROM words GROUP BY word
    ), top AS (
      SELECT row_number() OVER (ORDER BY freq DESC, word) AS rank, freq
      FROM counts ORDER BY freq DESC, word LIMIT 100
    ), q AS (
      SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000) AS BIGINT) AS x6,
             CAST(round(ln(CAST(freq AS DOUBLE)) * 1000000) AS BIGINT) AS y6
      FROM top
    ), s AS (
      SELECT count(*) AS n, sum(x6) AS sx, sum(y6) AS sy,
             sum(x6 * y6) AS sxy, sum(x6 * x6) AS sxx
      FROM q
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           round(-(CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE)), 6) AS zipf_alpha,
           round((CAST(sy AS DOUBLE) / n
                  + (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE))
                    * (CAST(sx AS DOUBLE) / n * -1) * -1) / 1000000, 6)
             AS ln_c
    FROM s
    """,
)
def q_text_powerlaw_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent estimate: OLS of ln(freq) on ln(rank) over the
    top-100 words — the one-number summary of q_text_zipf's table
    (natural corpora sit near α≈1; α drifting low flags boilerplate
    flooding the head). Each (ln rank, ln freq) point is computed on
    exact-integer inputs and quantized to integer MICRO-units before
    the moment sums (e6, not e9 — e9 products would overflow bigint at
    ln²≈25·10¹⁸), so the regression consumes exact bigint sums and
    does float math once. The top-100 selection is TakeOrdered with a
    word tie-break; everything downstream runs on 100 rows."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    ws = F.filter(F.split("text", " "), lambda x: x != "")
    counts = (
        d.select(F.explode(ws).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = (
        counts.orderBy(F.col("freq").desc(), "word")
        .limit(100)
        .select(
            F.row_number()
            .over(Window.partitionBy(one_part("word")).orderBy(F.col("freq").desc(), "word"))
            .alias("rank"),
            "freq",
        )
    )
    q = top.select(
        F.round(F.log(F.col("rank").cast("double")) * 1000000)
        .cast("long")
        .alias("x6"),
        F.round(F.log(F.col("freq").cast("double")) * 1000000)
        .cast("long")
        .alias("y6"),
    )
    s = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x6").alias("sx"),
        F.sum("y6").alias("sy"),
        F.sum(F.col("x6") * F.col("y6")).alias("sxy"),
        F.sum(F.col("x6") * F.col("x6")).alias("sxx"),
    )
    slope = (d38("n") * d38("sxy") - d38("sx") * d38("sy")).cast(
        "double"
    ) / (d38("n") * d38("sxx") - d38("sx") * d38("sx")).cast("double")
    return s.select(
        F.col("n").cast("long").alias("n_points"),
        F.round(-slope, 6).alias("zipf_alpha"),
        F.round(
            (
                F.col("sy").cast("double") / F.col("n")
                + slope * (F.col("sx").cast("double") / F.col("n") * -1) * -1
            )
            / 1000000,
            6,
        ).alias("ln_c"),
    )


@query(
    "q_text_code_detect",
    oracle="""
    WITH f AS (
      SELECT source,
             len(regexp_extract_all(text, '[{};=<>()\\[\\]]')) AS sym,
             len(regexp_extract_all(text,
                 '\\b(def|class|return|import|var|let|const|function|if|else|for|while)\\b'))
               AS kw,
             length(text) AS nc
      FROM documents WHERE text IS NOT NULL AND length(text) > 0
    ), scored AS (
      SELECT source,
             CASE WHEN sym * 50 >= nc OR kw >= 3 THEN 1 ELSE 0 END AS is_codey
      FROM f
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(is_codey) AS BIGINT) AS n_codey,
           round(CAST(sum(is_codey) AS DOUBLE) / count(*), 6) AS codey_share
    FROM scored GROUP BY source ORDER BY source
    """,
)
def q_text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose heuristic per source — the training-mix triage
    signal that decides whether a crawl source needs a code-specific
    pipeline (tokenizer, dedup granularity, quality rules differ for
    code): a document is 'codey' if structural symbols ({};=<>()[])
    exceed 2% of characters or ≥3 programming keywords appear. Both
    signals are single regexp passes in the scan projection (exact
    integer counts, threshold via integer cross-multiplication
    sym·50 ≥ nc — no float ratio), rolled up to a per-source share.
    The regexes are RE2-and-Java-compatible by construction (the
    TOKEN_REGEX portability rule)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    sym = F.regexp_count("text", F.lit(r"[{};=<>()\[\]]"))
    kw = F.regexp_count(
        "text",
        F.lit(
            r"\b(def|class|return|import|var|let|const|function|if|else|for|while)\b"
        ),
    )
    scored = d.select(
        "source",
        F.when((sym * 50 >= F.length("text")) | (kw >= 3), 1)
        .otherwise(0)
        .alias("is_codey"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("is_codey").cast("long").alias("n_codey"),
            F.round(
                F.sum("is_codey").cast("double") / F.count(F.lit(1)), 6
            ).alias("codey_share"),
        )
        .orderBy("source")
    )


@query(
    "q_corpus_diversity",
    oracle="""
    WITH cells AS (
      SELECT lang, source, count(*) AS c
      FROM documents GROUP BY lang, source
    ), per_lang AS (
      SELECT lang, sum(c) AS n, count(*) AS n_sources FROM cells GROUP BY lang
    ), simpson AS (
      SELECT lang, sum(c * (c - 1)) AS num FROM cells GROUP BY lang
    ), shannon AS (
      SELECT cells.lang,
             sum(CAST(round(-(CAST(c AS DOUBLE) / p.n)
                            * ln(CAST(c AS DOUBLE) / p.n)
                            * 1000000000) AS BIGINT)) AS h_e9
      FROM cells JOIN per_lang p ON p.lang = cells.lang
      GROUP BY cells.lang
    )
    SELECT p.lang,
           CAST(p.n AS BIGINT) AS n_docs,
           CAST(p.n_sources AS BIGINT) AS n_sources,
           round(1 - CAST(s.num AS DOUBLE) / (CAST(p.n AS DOUBLE) * (p.n - 1)), 6)
             AS simpson_d,
           round(h.h_e9 / 1000000000.0, 6) AS shannon_nats,
           round(exp(h.h_e9 / 1000000000.0), 4) AS effective_sources
    FROM per_lang p
    JOIN simpson s ON s.lang = p.lang
    JOIN shannon h ON h.lang = p.lang
    ORDER BY p.lang
    """,
)
def q_corpus_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mix diversity per language: Simpson's D (probability two
    random docs come from different sources — EXACT integers via
    1 − Σc(c−1)/n(n−1), no float accumulation at all), Shannon entropy
    (nano-nat quantized terms, the q_stat_mutual_info rule), and the
    effective source count e^H (exp on an identical double — same
    determinism class as ln, FIXTURES C.5). The corpus-composition
    scalar that says 'German is one crawl dump, English is twelve' —
    which decides per-language dedup and mixture strategy. One
    contingency shuffle; everything after is O(langs·sources)."""
    d = load_table(spark, sf_dir, "documents")
    cells = (
        d.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)  # contingency cells; reused by margins, Simpson and Shannon
    )
    per_lang = cells.groupBy("lang").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_sources")
    )
    simpson = cells.groupBy("lang").agg(
        # d38 lane: c*(c-1) is corpus-squared per cell (functions/exact.py)
        F.sum(d38("c") * (d38("c") - 1)).alias("num")
    )
    sh_term = (
        -(F.col("c").cast("double") / F.col("n"))
        * F.log(F.col("c").cast("double") / F.col("n"))
        * 1000000000
    )
    shannon = (
        cells.join(per_lang.select("lang", "n"), "lang")
        .groupBy("lang")
        .agg(F.sum(F.round(sh_term).cast("long")).alias("h_e9"))
    )
    return (
        per_lang.join(simpson, "lang")
        .join(shannon, "lang")
        .select(
            "lang",
            F.col("n").cast("long").alias("n_docs"),
            F.col("n_sources").cast("long").alias("n_sources"),
            F.round(
                1
                - F.col("num").cast("double")
                / (F.col("n").cast("double") * (F.col("n") - 1)),
                6,
            ).alias("simpson_d"),
            F.round(F.col("h_e9") / 1000000000.0, 6).alias("shannon_nats"),
            F.round(F.exp(F.col("h_e9") / 1000000000.0), 4).alias(
                "effective_sources"
            ),
        )
        .orderBy("lang")
    )
