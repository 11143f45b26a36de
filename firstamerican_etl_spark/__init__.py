"""firstamerican_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the capabilities of
mansueto-institute/firstamerican-etl (a single-node Polars LazyFrame
batch-ETL pipeline, see /root/reference/fa-etl.py) as an idiomatic
Spark engine: DataFrame/SQL plans optimized by Catalyst, parquet/CSV
sources and sinks, window dedup, join cascades, plus large-scale
training-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal plumbing, streaming windows).

Layout:
- session:    SparkSession factory tuned for local[N] and cluster runs
- sources:    CSV/parquet/zip readers, parquet sinks, idempotent writes
- functions:  scalar expression toolkit (SURVEY.md §2.8), text, vector
- operators:  relational ops, dedup, similarity, windows, multimodal
- pipeline:   the FA pipeline re-expressed (convert_* / unify / run)
- plans:      query registry (queries() + oracle_sql() pairs)
- streaming:  Structured Streaming windowed aggregations
"""

from firstamerican_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
