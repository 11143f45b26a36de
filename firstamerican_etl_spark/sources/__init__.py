from firstamerican_etl_spark.sources.io import (
    load_table,
    read_csv,
    read_parquet,
    write_parquet,
    extract_zips,
    output_exists,
)

__all__ = [
    "load_table",
    "read_csv",
    "read_parquet",
    "write_parquet",
    "extract_zips",
    "output_exists",
]
