from etl4s_spark.sources.tables import TABLES, load_table, load_tables  # noqa: F401
from etl4s_spark.sources.batch import (  # noqa: F401
    scan_parquet,
    scan_csv,
    scan_json,
    write_parquet,
    write_csv,
    write_partitioned,
)
