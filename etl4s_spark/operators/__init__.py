from etl4s_spark.operators.joins import (  # noqa: F401
    asof_join,
    broadcast_join,
    interval_join,
    join,
)
