"""Reproducible sampling for training-data pipelines.

``df.sample()`` / ``sampleBy()`` are rand()-based: resampling on retry,
different rows per run, unverifiable. At corpus scale you want CONTENT-
ADDRESSED sampling — keep a row iff a hash of its id clears a threshold:

- identical output on every run/cluster/engine (oracle-checkable),
- stable under repartitioning and retries,
- composable: disjoint hash ranges give overlap-free splits
  (train/val/test) without coordination.

The hash is md5 of (seed, id): its first 8 hex chars are uniform on
[0, 16^8); comparing the hex PREFIX STRING against the threshold's hex
form avoids any integer conversion and works identically in every engine
that lowercases md5 output (Spark and DuckDB both do).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPACE = 16**8


def _threshold_hex(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    if fraction >= 1.0:
        # "g" sorts after every [0-9a-f] hex prefix, so `hash < 'g'` keeps
        # ALL rows. Clamping to 0xffffffff with strict `<` would silently
        # drop rows whose md5 prefix is exactly 'ffffffff' (~1 in 4.3B —
        # real at 100 TB scale; ADVICE r1).
        return "g"
    return format(int(fraction * _SPACE), "08x")


def sample_hash(id_col: Column, seed: int = 42) -> Column:
    """First 8 hex chars of md5(seed || ':' || id) — the sampling key."""
    return F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), id_col.cast("string"))), 1, 8)


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Keep ~fraction of rows, chosen by content hash — same rows every
    run. One scan, zero shuffles; the predicate pushes past projections."""
    return df.filter(sample_hash(F.col(id_col), seed) < _threshold_hex(fraction))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate
    web text to 10% while keeping 100% of books). Zero shuffles."""
    thr: Column = F.lit(_threshold_hex(default_fraction))
    for value, frac in fractions.items():
        thr = F.when(F.col(stratum_col) == value, F.lit(_threshold_hex(frac))).otherwise(thr)
    return df.filter(sample_hash(F.col(id_col), seed) < thr)


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stratum_col: str,
    budgets: Mapping[str, int],
    seed: int = 42,
) -> DataFrame:
    """Mixture weighting for training-data assembly: sample each stratum
    (source/domain) down to ~its token budget. fraction_s = min(1,
    budget_s / total_tokens_s); strata without a budget drop to 0.

    Pass 1 aggregates per-stratum token totals (BPE-ish regex count,
    operators/text.py TOKEN_REGEX) — the collect is #strata rows of
    model parameters, not data. Pass 2 is the zero-shuffle
    content-addressed stratified filter, so the selected rows are stable
    across runs/engines/retries — resampling a 100 TB mixture because a
    job retried is not a thing that happens here."""
    from etl4s_spark.operators.text import TOKEN_REGEX

    totals = {
        r[0]: r[1]
        for r in df.groupBy(stratum_col)
        .agg(F.sum(F.regexp_count(F.col(text_col), F.lit(TOKEN_REGEX))).alias("t"))
        .collect()
    }
    fractions = {
        # zero/None token total with a positive budget: the budget
        # trivially covers zero tokens, keep the stratum whole (ADVICE
        # r2 — silently dropping token-free strata contradicted the
        # keep-up-to-budget intent)
        s: min(1.0, budgets[s] / t) if t else (1.0 if budgets[s] > 0 else 0.0)
        for s, t in totals.items()
        if s in budgets
    }
    return stratified_sample(
        df, id_col, stratum_col, fractions, default_fraction=0.0, seed=seed
    )


def temperature_budget_sample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stratum_col: str,
    total_budget: int,
    alpha: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Temperature-weighted mixture sampling (the multilingual /
    multi-domain rebalancing rule, e.g. mC4/XLM-R): stratum s gets a
    share p_s ∝ (tokens_s)^alpha of ``total_budget`` tokens, so
    alpha < 1 UPWEIGHTS tail strata relative to their natural size and
    alpha = 1 reduces to proportional (no-op) mixing. fraction_s =
    min(1, budget_s / tokens_s), then the zero-shuffle content-addressed
    stratified filter selects rows.

    Same two-pass structure as ``token_budget_sample``: pass 1 collects
    #strata token totals (model parameters, not data); pass 2 is a pure
    filter — deterministic, retry-stable, engine-reproducible.

    Cross-engine determinism of the FRACTIONS: totals are summed in
    sorted-stratum order and each fraction is floor-quantized to 1e-6
    before thresholding, so a last-ulp divergence in another engine's
    pow()/sum order cannot flip a row across the hash threshold. With
    the default alpha=0.5 the weight is sqrt — correctly rounded in
    IEEE 754, hence bit-identical everywhere."""
    import math

    from etl4s_spark.operators.text import TOKEN_REGEX

    totals = {
        r[0]: r[1] or 0
        for r in df.groupBy(stratum_col)
        .agg(F.sum(F.regexp_count(F.col(text_col), F.lit(TOKEN_REGEX))).alias("t"))
        .collect()
    }
    strata = sorted(totals)
    # math.sqrt is guaranteed correctly rounded; pow(x, 0.5) is not on
    # every libm — use sqrt explicitly so the bit-identical claim holds
    weights = {
        s: (math.sqrt(float(totals[s])) if alpha == 0.5 else float(totals[s]) ** alpha)
        if totals[s]
        else 0.0
        for s in strata
    }
    z = 0.0
    for s in strata:  # fixed accumulation order (see docstring)
        z += weights[s]
    fractions: dict[str, float] = {}
    for s in strata:
        t = totals[s]
        if not t:
            # zero-token stratum with a positive overall budget: nothing
            # to spend budget on, keep it whole (token_budget_sample rule)
            fractions[s] = 1.0 if total_budget > 0 else 0.0
            continue
        raw = (total_budget * (weights[s] / z)) / t if z else 0.0
        fractions[s] = 1.0 if raw >= 1.0 else math.floor(raw * 1_000_000) / 1_000_000
    return stratified_sample(
        df, id_col, stratum_col, fractions, default_fraction=0.0, seed=seed
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    val_fraction: float = 0.05,
    test_fraction: float = 0.05,
    seed: int = 42,
) -> DataFrame:
    """Overlap-free split column from disjoint hash ranges:
    [0, val) → 'val', [val, val+test) → 'test', rest → 'train'.
    Membership is a pure function of the id — no coordination, no
    shuffles, stable across runs and engines."""
    h = sample_hash(F.col(id_col), seed)
    t_val = _threshold_hex(val_fraction)
    t_test = _threshold_hex(val_fraction + test_fraction)
    return df.withColumn(
        "split",
        F.when(h < t_val, F.lit("val")).when(h < t_test, F.lit("test")).otherwise(F.lit("train")),
    )


def per_group_cap(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    cap: int,
    seed: int = 42,
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum, chosen in content-hash
    order — deterministic domain capping (bound any single site/domain's
    share of the corpus regardless of its raw size). Hash order makes
    the kept subset a uniform sample of the stratum AND stable across
    runs/engines/retries; ``id_col`` breaks hash ties totally.

    One shuffle on the stratum; the rank compiles to WindowGroupLimit,
    which caps each group map-side BEFORE the exchange — the property
    that makes this safe when one domain is half the corpus (the hot
    stratum never materializes unbounded in one task's sort)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(stratum_col).orderBy(
        sample_hash(F.col(id_col), seed), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def domain_mixture_weights(
    df: DataFrame,
    domain_col: str,
    size_col: Column,
) -> DataFrame:
    """Static domain-mixture reweighting to a UNIFORM token target — the
    data-mixing stage of a pretraining pipeline (the fixed-target core
    of DoReMi-style reweighting, minus the learned proxy): given each
    domain's token mass, emit the per-domain sampling weight that
    equalizes token share across domains. weight > 1 means the domain is
    under-represented (upsample/repeat epochs), < 1 means downsample;
    ``sample_frac`` caps at 1 for single-epoch pipelines.

    All arithmetic is integer-derived — weight = T / (D · tokens) with
    T, D, tokens exact BIGINTs and ONE float division — so a SQL oracle
    reproduces every value bit-for-bit (no pow(), the α-smoothing trap:
    libm pow is not cross-engine reproducible; a uniform target needs
    none).

    Plan: one map-side-combined agg over the corpus on the domain key,
    then per-row expressions over the (tiny) domain frame with its
    one-row totals broadcast back — the corpus is scanned exactly once.
    Returns (domain, n_docs, n_tokens, actual_share, target_share,
    weight, sample_frac, planned_tokens)."""
    domains = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(size_col).cast("long").alias("n_tokens"),
    )
    totals = domains.agg(
        F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("d")
    )
    weight = F.col("t") / (F.col("d") * F.col("n_tokens"))
    frac = F.least(F.lit(1.0), weight)
    return domains.join(F.broadcast(totals)).select(
        "domain",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("t"), 6).alias("actual_share"),
        F.round(F.lit(1.0) / F.col("d"), 6).alias("target_share"),
        F.round(weight, 6).alias("weight"),
        F.round(frac, 6).alias("sample_frac"),
        F.round(F.col("n_tokens") * frac).cast("long").alias("planned_tokens"),
    )


def weighted_sample_without_replacement(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Efraimidis–Spirakis (A-ES) weighted sampling WITHOUT replacement:
    each row gets the key u^(1/w) for u ~ Uniform(0,1); the k largest
    keys are a correct weight-proportional sample. This is THE
    distributed formulation — no sequential pass over a cumulative
    weight array, no coordination: keys are computed row-locally, and
    top-k is a TakeOrdered (per-partition heads + one tiny merge),
    so at 100 TB the corpus is scanned once and only k rows move.

    Determinism: u is content-addressed (md5 of seed:id, the module's
    standard recipe) — (u32 + 0.5)/2^32 is an exact dyadic double in
    (0,1), so reruns, retries, and the SQL oracle reproduce the exact
    sample. Keys are compared in log space (ln(u)/w, monotone in
    u^(1/w)) to dodge underflow at large weights; ln is within 1 ulp on
    both engines and adjacent order-statistic gaps are ~10 orders of
    magnitude larger, so the ranking is engine-stable. Ties broken by id.

    Weights must be POSITIVE and finite: rows with w ≤ 0, NULL, or NaN
    are filtered out up front (ADVICE r5 — a NaN score sorts FIRST under
    descending order, silently forcing that row into every sample;
    negative weights likewise float to the top). Filtering matches A-ES
    semantics: zero/negative weight means zero selection probability.

    Returns the k sampled rows with their ``score`` (= ln(u)/w).
    """
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"w:{seed}:"), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("double")
    u = (u32 + F.lit(0.5)) / F.lit(4294967296.0)
    w = F.col(weight_col).cast("double")
    score = F.log(u) / w
    return (
        df.filter(w.isNotNull() & ~F.isnan(w) & (w > 0))
        .withColumn("score", score)
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )
