from etl4s_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    hamming64,
    minhash_lsh_candidates,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    simhash_from_hashes,
    word_hashes,
)
from etl4s_spark.operators.joins import (  # noqa: F401
    asof_join,
    broadcast_join,
    interval_join,
    join,
    salted_join,
)
from etl4s_spark.operators.rollup import rollup_hierarchy  # noqa: F401
from etl4s_spark.operators.similarity import (  # noqa: F401
    cosine,
    cosine_topk,
    embedding_neardup_pairs,
    ivf_topk,
    lsh_bucketed_topk,
)
from etl4s_spark.operators.text import (  # noqa: F401
    fingerprint_md5,
    lang_id,
    normalize_text,
    quality_score,
    rolling_fingerprint,
    shingles,
    shingles_from_words,
    token_count,
    word_count,
    words,
)
