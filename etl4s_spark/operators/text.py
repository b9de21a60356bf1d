"""Text-analysis operators for LLM training-data pipelines.

Everything is a built-in Column expression (JVM-side, codegen'd) — at
100 TB these run inside the scan stage with zero shuffles and no Python
in the row path. Each helper returns a Column so callers compose them
into a single Project.

Design sources: standard corpus-quality heuristics (length/punctuation/
stopword ratios à la C4/Gopher rules), n-gram language ID, rolling-hash
fingerprinting. All deterministic → DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny fixed stopword set — mirrored verbatim in oracle SQL. Real
# deployments swap in a per-language list; the mechanics are identical.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# BPE-ish token regex: letter runs | digit runs | single non-space symbol.
# Kept to a dialect subset (character classes only) that Java regex and
# DuckDB's RE2 interpret identically.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def normalize_text(col: Column) -> Column:
    """Canonical form for hashing/dedup: lowercase, collapse non-alnum
    runs to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def words(col: Column) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize_text(col), " ")


def word_count(col: Column) -> Column:
    return F.size(words(col))


def token_count(col: Column) -> Column:
    """BPE-ish token count via regexp matches — the cheap proxy for a
    real tokenizer when budgeting corpus size."""
    return F.regexp_count(col, F.lit(TOKEN_REGEX))


def avg_word_len(col: Column) -> Column:
    w = words(col)
    return F.aggregate(
        w, F.lit(0.0), lambda acc, x: acc + F.length(x)
    ) / F.greatest(F.size(w), F.lit(1))


def stopword_ratio(col: Column) -> Column:
    w = words(col)
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    return n_stop / F.greatest(F.size(w), F.lit(1))


def punct_ratio(col: Column) -> Column:
    """Non-alphanumeric-non-space chars / total chars."""
    n_punct = F.length(F.regexp_replace(col, "[A-Za-z0-9 ]", ""))
    return n_punct / F.greatest(F.length(col), F.lit(1))


def uppercase_ratio(col: Column) -> Column:
    return F.length(F.regexp_replace(col, "[^A-Z]", "")) / F.greatest(F.length(col), F.lit(1))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality score: penalize too-short/too-long docs,
    reward normal stopword density and low punctuation noise — the
    classic cheap pre-filter before model-based scoring."""
    wc = word_count(col).cast("double")
    len_score = F.least(wc / 50.0, F.lit(1.0)) * F.when(wc > 5000, 0.5).otherwise(1.0)
    stop_score = F.least(stopword_ratio(col) * 4.0, F.lit(1.0))
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 5.0)
    return F.round(len_score * 0.4 + stop_score * 0.3 + punct_penalty * 0.3, 6)


# -- repetition (Gopher-style) -----------------------------------------------

def dup_word_fraction(w: Column) -> Column:
    """Fraction of words that are repeats of an earlier word:
    1 − |distinct words| / |words| — the Gopher repetition signal at word
    granularity. Input: a MATERIALIZED words array column."""
    n = F.greatest(F.size(w), F.lit(1))
    return F.lit(1.0) - F.size(F.array_distinct(w)) / n


def dup_ngram_fraction(w: Column, norm: Column, k: int = 3) -> Column:
    """Fraction of word k-grams that are repeats: 1 − |distinct k-grams| /
    |k-grams|. High values mean within-document boilerplate/looping text —
    the Gopher 'duplicate n-gram' filter. Same shingle construction as the
    dedup tier (shingles_from_words), so it shares its zero-shuffle,
    lambda-input-only scaling properties."""
    sh = shingles_from_words(w, norm, k=k)
    n = F.greatest(F.size(sh), F.lit(1))
    return F.lit(1.0) - F.size(F.array_distinct(sh)) / n


# -- PII scrubbing ------------------------------------------------------------

# Dialect-safe regexes (character classes only — Java regex and DuckDB RE2
# agree): production lists add many more patterns; the plumbing — chained
# regexp_replace inside one Project, zero shuffles — is identical.
PII_EMAIL_REGEX = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PII_PHONE_REGEX = "[+][0-9]{1,3}[ ][0-9]{3}[-][0-9]{2,6}"


def scrub_pii(col: Column) -> Column:
    """Redact emails and phone numbers to typed placeholders. Spark's
    regexp_replace is global by default (the DuckDB mirror needs the 'g'
    flag)."""
    out = F.regexp_replace(col, PII_EMAIL_REGEX, "<EMAIL>")
    return F.regexp_replace(out, PII_PHONE_REGEX, "<PHONE>")


# -- language ID -------------------------------------------------------------

# marker-word lists per language; deterministic scoring = count of marker
# hits. A production system uses char-n-gram profiles (same plumbing, more
# markers); synthetic test data carries a `lang` column we report alongside.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "los", "que"),
    "fr": ("le", "les", "des", "est"),
}


def lang_scores(col: Column) -> dict[str, Column]:
    w = words(col)

    def marker_pred(markers: tuple[str, ...]):
        # closure factory, NOT a default-arg lambda: Spark treats a 2-param
        # lambda as (element, index) and would bind markers to the index col
        return lambda x: x.isin(*markers)

    return {
        lang: F.size(F.filter(w, marker_pred(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """argmax over marker-hit counts; 'und' (undetermined) when all zero.
    Ties resolve in the fixed en>de>es>fr order (greatest-so-far keeps the
    FIRST maximum), mirrored in the oracle SQL."""
    scores = lang_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, score in scores.items():  # dict order = declaration order
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


# -- fingerprinting ----------------------------------------------------------

def rolling_fingerprint(norm: Column, k: int = 8, mod: int = 2_147_483_647) -> Column:
    """Winnowing-style rolling-hash fingerprint: the minimum polynomial
    hash over all k-char windows of the ALREADY-NORMALIZED text column
    (h = Σ code(cᵢ)·31ⁱ mod M). Robust to content being shifted by
    prepended/appended bytes — unlike whole-document md5 — because the
    window set is position-free.

    Plain integer arithmetic, so it is DuckDB-mirrorable
    (q_text_rolling_fp). Pass a MATERIALIZED normalized column (plain
    reference, not the normalize_text expression): it is read inside the
    transform lambda body k times per window, and a non-trivial
    expression there re-evaluates per element (see shingles_from_words)."""
    n = F.length(norm)

    def whash(i: Column) -> Column:
        h = F.lit(0).cast("bigint")
        p = 1
        for j in range(k):
            h = h + F.ascii(norm.substr(i + F.lit(j), F.lit(1))).cast("bigint") * F.lit(p).cast(
                "bigint"
            )
            p = (p * 31) % mod
        return F.pmod(h, F.lit(mod))

    starts = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_min(F.transform(starts, whash))


def fingerprint_md5(col: Column) -> Column:
    """Content fingerprint: md5 of the normalized text. Identical
    normalization on the oracle side makes this the exact-dedup key."""
    return F.md5(normalize_text(col))


def shingles_from_words(w: Column, norm: Column, k: int = 3) -> Column:
    """Word k-shingles (array<string>) from a words array column + the
    normalized text column.

    Built by zip_with-ing the word array against its own 1..k-1 shifted
    slices, so the array is only ever a lambda INPUT (evaluated once per
    row). Referencing an array column inside a transform lambda *body*
    (e.g. element_at(w, i+j)) makes Spark re-evaluate the underlying
    expression per element after projection collapsing — O(n²) per row
    and ~10× slower end-to-end."""
    n = F.size(w)
    acc = w
    for j in range(1, k):
        tail = F.slice(w, j + 1, F.greatest(n - j, F.lit(0)))
        # zip_with pads the shorter side with null; concat_ws skips nulls,
        # producing short grams at the tail that the final slice drops
        acc = F.zip_with(acc, tail, lambda a, b: F.concat_ws(" ", a, b))
    k_grams = F.slice(acc, 1, F.greatest(n - (k - 1), F.lit(1)))
    # short docs (< k words): the whole normalized text is the one shingle
    return F.when(n >= k, k_grams).otherwise(F.array(norm))


def shingles(col: Column, k: int = 3) -> Column:
    """Word k-shingles of a raw text column. Convenience form for small
    inputs/tests; hot paths should materialize words first and use
    shingles_from_words (see its scaling note)."""
    return shingles_from_words(words(col), normalize_text(col), k=k)


def unigram_logprob_scores(
    df, id_col: str, text_col: str, min_count: int = 5
):
    """CCNet-style unigram language-model scoring: build the corpus'
    own unigram table, then score each doc by its mean word
    log-probability — the cheap stand-in for model perplexity that
    ranks fluent prose above word soup and boilerplate above neither.
    Returns (id, n_words, n_oov, avg_logprob ROUNDED to 4).

    Pure dataflow, no driver-side model: the vocabulary IS a DataFrame
    (words with count >= min_count), the corpus total is a one-row
    broadcast, and rare/OOV words score the 0.5-count smoothing floor.
    Shuffle profile at 100 TB: explode → one groupBy on the word (heavy
    tail but bounded by vocab), one join words⋈vocab on the same key
    (partitioning reuse), one final groupBy on the id. The rounding
    absorbs libm ln() last-ulp differences across engines, so the
    score is oracle-reproducible."""
    from pyspark.sql import functions as F

    w = df.select(F.col(id_col).alias("id"), F.explode(words(F.col(text_col))).alias("w"))
    total = w.agg(F.count(F.lit(1)).cast("double").alias("N"))
    vocab = (
        w.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .crossJoin(F.broadcast(total))
        .select("w", F.log(F.col("c") / F.col("N")).alias("lp"))
    )
    floor_lp = F.log(F.lit(0.5) / F.col("N"))
    return (
        w.join(vocab, "w", "left")
        .crossJoin(F.broadcast(total))
        .select("id", "w", F.coalesce(F.col("lp"), floor_lp).alias("lp"), F.col("lp").isNull().alias("oov"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_words"),
            F.sum(F.col("oov").cast("int")).cast("int").alias("n_oov"),
            F.round(F.avg("lp"), 4).alias("avg_logprob"),
        )
    )


BPE_MERGES_DEMO = (
    ("t", "h"),
    ("th", "e"),
    ("a", "n"),
    ("i", "n"),
    ("e", "r"),
    ("o", "n"),
    ("r", "e"),
    ("an", "d"),
)


def bpe_merge_stage_sql(arr_col: str, x: str, y: str) -> str:
    """One BPE merge pass as a pure SQL expression over a token array
    column: leftmost-greedy fold (accumulator = space-joined tokens;
    merge fires when the accumulator's LAST token is ``x`` and the
    incoming token is ``y``), then re-split. Exactly the reference BPE
    apply step (Sennrich et al., ACL 2016), engine-neutral: the same
    text works in Spark (aggregate/endswith) — DuckDB mirrors with
    list_reduce/ends_with. Each stage must read a MATERIALIZED column
    (withColumn / CTE per merge): textually nesting stages repeats the
    child expression 3× per level and the plan grows 3^k (a 14 MiB task
    binary at k=8 in the prototype)."""
    return (
        f"split(aggregate(slice({arr_col}, 2, size({arr_col}) - 1), "
        f"element_at({arr_col}, 1), "
        f"(acc, t) -> CASE WHEN (acc = '{x}' OR endswith(acc, ' {x}')) AND t = '{y}' "
        f"THEN CASE WHEN acc = '{x}' THEN '{x}{y}' "
        f"ELSE concat(substring(acc, 1, length(acc) - {len(x)}), '{x}{y}') END "
        f"ELSE concat(acc, ' ', t) END), ' ')"
    )


def bpe_apply(words: "DataFrame", word_col: str = "w", merges=BPE_MERGES_DEMO):
    """Apply an ordered BPE merge list to a DISTINCT-word frame,
    returning (word, tokens array, n_tokens). Tokenizing the vocabulary
    instead of the corpus is the production shape: token counts join
    back to occurrences by word, so the fold cost is O(|vocab|·len),
    not O(corpus bytes) — and the stage-per-column structure keeps the
    plan linear in the merge count."""
    from pyspark.sql import functions as F

    out = words.withColumn(
        "__arr",
        F.expr(
            f"transform(sequence(1, length({word_col})), "
            f"i -> substring({word_col}, i, 1))"
        ),
    )
    for x, y in merges:
        out = out.withColumn("__arr", F.expr(bpe_merge_stage_sql("__arr", x, y)))
    return out.select(
        word_col,
        F.col("__arr").alias("tokens"),
        F.size("__arr").cast("long").alias("n_tokens"),
    )


def bpe_learn(
    docs: "DataFrame",
    text_col: str = "text",
    n_merges: int = 8,
    batch_size: int = 8,
):
    """LEARN a BPE merge list, MERGE-FOR-MERGE identical to sequential
    BPE (Sennrich et al., ACL 2016) with the deterministic (count DESC,
    x ASC, y ASC) tie-break, but with a BOUNDED driver loop: each
    collect round counts pairs over the current tokenization of the
    DISTINCT-word frame (frequency-weighted) and accepts up to
    ``batch_size`` merges at once, so the round-trip complexity is
    O(ceil(n_merges / m_eff)) Spark jobs (m_eff = accepted merges per
    round, data-dependent, >= 1) instead of O(n_merges) — the driver
    holds only the merge list, never data.

    Why the batch is EXACTLY what sequential BPE would pick (the prefix
    rule, pytest-proven against the in-memory reference trainer):
    collect the top batch_size+1 pairs in global (c DESC, x, y) order
    and accept a PREFIX p_1..p_m that is (a) mutually token-disjoint
    and (b) for k >= 2, strictly above ``bound`` = max(count of the
    first token-sharing candidate, count of the (batch_size+1)-th
    collected pair — the ceiling on every unseen pair). Applying
    disjoint merges never changes each other's counts (no shared
    tokens to consume, and created pairs involve only the brand-new
    symbol x_jy_j), every created pair's count is <= the old count of
    some pair sharing a token with an accepted pair — which is <= bound
    by construction — and every old pair ranked below the prefix is
    also <= bound. So at sequential step k, p_k is still the STRICT
    unique maximum: the batch replays the sequential choices without
    re-counting between them. p_1 is always safe (it is the global
    argmax of this round's exact counts). Ties collapse the batch
    toward 1 rather than risk divergence.

    Returns the ordered list of (x, y) pairs."""
    from pyspark.sql import functions as F

    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    vocab = (
        docs.select(F.explode(words(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    cur = vocab.withColumn(
        "__arr",
        F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
    )
    while len(merges) < n_merges:
        room = min(batch_size, n_merges - len(merges))
        top = (
            cur.select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(slice(__arr, 1, size(__arr) - 1), "
                        "(x, i) -> struct(x AS x, element_at(__arr, i + 2) AS y))"
                    )
                ).alias("p"),
            )
            .groupBy("p.x", "p.y")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), "x", "y")
            .limit(room + 1)  # +1: exact ceiling on every unseen pair
            .collect()
        )
        if not top:
            break
        # the prefix rule (docstring): mutually disjoint prefix, then
        # truncate to counts strictly above the interference bound
        used: set[str] = set()
        accepted: list = []
        conflict_c = None
        for r in top[:room]:
            if r.x in used or r.y in used:
                conflict_c = r.c
                break
            accepted.append(r)
            used.update((r.x, r.y))
        bound = None
        if conflict_c is not None:
            bound = conflict_c
        if len(top) == room + 1:
            tail_c = top[room].c
            bound = tail_c if bound is None else max(bound, tail_c)
        batch = [accepted[0]] + [
            r for r in accepted[1:] if bound is None or r.c > bound
        ]
        for r in batch:
            merges.append((r.x, r.y))
            cur = cur.withColumn("__arr", F.expr(bpe_merge_stage_sql("__arr", r.x, r.y)))
        cur = cur.localCheckpoint(eager=True)
    return merges
