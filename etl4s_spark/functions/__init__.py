from etl4s_spark.functions.udfs import (  # noqa: F401
    grouped_weighted_avg,
    normalize_group_pandas,
    py_classify_price,
    sentence_split_udtf,
    vec_l2_normalize,
)
