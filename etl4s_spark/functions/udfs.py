"""UDF / UDAF / UDTF surface (SURVEY.md §2.B).

The performance ladder, top (fast) to bottom (slow):

1. built-in ``F.*`` expressions — JVM, codegen; EVERYTHING else in this
   repo uses these. The UDFs below exist because the surface is part of
   the contract, and as templates for logic that genuinely can't be
   expressed with built-ins (model inference, custom scoring).
2. ``pandas_udf`` (Arrow-vectorized) — one Python call per batch,
   zero-copy columns. 10-100× faster than row UDFs.
3. ``applyInPandas`` / grouped-agg pandas_udf — per-group pandas frames;
   watch group sizes (a mega-group OOMs one worker — salt or pre-agg).
4. row-at-a-time ``F.udf`` — serializes every row through pickle;
   **never in a hot path**; included only as the escape-hatch example.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.ArrayType(T.DoubleType()))
def vec_l2_normalize(v: pd.Series) -> pd.Series:
    """Vectorized scalar UDF: L2-normalize embedding arrays per Arrow
    batch (numpy under the hood, no per-row Python)."""
    import numpy as np

    def norm(a):
        if a is None:  # NULL array in -> NULL array out, like built-ins
            return None
        arr = np.asarray(a, dtype="float64")
        n = np.linalg.norm(arr)
        return (arr / n if n else arr).tolist()

    return v.map(norm)


@pandas_udf(T.DoubleType())
def grouped_weighted_avg(value: pd.Series, weight: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (UDAF): weighted average. Used as
    ``df.groupBy(k).agg(grouped_weighted_avg(col, w))`` — Spark handles
    the shuffle; Python sees one group's columns at a time."""
    w = weight.sum()
    return float((value * weight).sum() / w) if w else 0.0


def normalize_group_pandas(df, key_col: str, value_col: str):
    """Grouped-map applyInPandas: z-score values within each group —
    the template for per-group logic needing the whole group in memory
    (model fitting, ranking with cross-row interactions)."""
    schema = T.StructType(
        [*df.schema.fields, T.StructField(f"{value_col}_z", T.DoubleType())]
    )

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=1)
        mean = pdf[value_col].mean()
        pdf[f"{value_col}_z"] = (pdf[value_col] - mean) / std if std and std > 0 else 0.0
        return pdf

    return df.groupBy(key_col).applyInPandas(norm, schema)


def sentence_split_udtf():
    """Python UDTF (Spark 4 table function): one input string → one row
    per sentence with its index and char length — the template for
    fan-out logic that genuinely needs Python (custom parsers, model
    tokenizers). Register and use in SQL as a lateral table function:

        spark.udtf.register("sentences", sentence_split_udtf())
        spark.sql("SELECT d.doc_id, s.* FROM docs d,
                   LATERAL sentences(d.text) s")

    For anything expressible with explode()/split() built-ins, use those
    — a UDTF is row-path Python (same ladder position as F.udf)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx: int, sentence: string, n_chars: int")
    class SentenceSplit:
        def eval(self, text: str):
            if not text:
                return
            parts = [p.strip() for p in text.replace("!", ".").replace("?", ".").split(".")]
            for i, p in enumerate(p for p in parts if p):
                yield i, p, len(p)

    return SentenceSplit


def py_classify_price(threshold: float = 200000.0):
    """Row-at-a-time Python UDF — the DISCOURAGED escape hatch, kept as
    the contract example. Equivalent built-in: F.when(...). ~100× slower
    than the when() form at scale."""

    @F.udf(returnType=T.StringType())
    def classify(price: float) -> str:
        return "high" if price is not None and price > threshold else "low"

    return classify
