"""Public engine façade — the one-import surface a user of the
reference switches to:

    from firstamerican_etl_spark.api import Engine

    eng = Engine()                      # or Engine(existing_spark)
    eng.list_queries()                  # all registered operators + tags
    df = eng.query("fa_flagship_merged", "/data/tables")
    df = eng.sql("SELECT ... FROM parquet.`/data/x.parquet`")
    eng.run_fa_pipeline("/data/fa")     # the reference's ETL, Spark-first
    eng.build_corpus_from("/data/docs.parquet", "/data/corpus")
    eng.explain("q21_waiting_orders", "/data/tables")

Everything here delegates: queries come from the registry
(plans/registry.py), the ETL from pipeline/run.py, the corpus build
from pipeline/corpus_build.py, the session from session.py. The class
adds no behavior — only a stable entry point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from firstamerican_etl_spark.plans.registry import QuerySpec, load_all
from firstamerican_etl_spark.session import get_spark


class Engine:
    """Thin façade over the query registry + pipelines."""

    def __init__(self, spark: SparkSession | None = None) -> None:
        self.spark = spark or get_spark()
        self._registry: dict[str, QuerySpec] = load_all()

    # -- query surface -------------------------------------------------
    def list_queries(self) -> dict[str, tuple[str, ...]]:
        """name → tags for every registered operator."""
        return {n: s.tags for n, s in self._registry.items()}

    def query(self, name: str, sf_dir: str) -> DataFrame:
        """Build (lazily) the named operator's DataFrame over the
        parquet tables in ``sf_dir``."""
        try:
            spec = self._registry[name]
        except KeyError:
            raise KeyError(
                f"unknown query {name!r}; see list_queries()"
            ) from None
        return spec.spark(self.spark, sf_dir)

    def oracle_sql(self, name: str) -> str | None:
        """The DuckDB-executable oracle SQL for a query (None for
        non-SQL-expressible operators)."""
        return self._registry[name].oracle

    def sql(self, statement: str) -> DataFrame:
        """Raw SQL passthrough (Spark SQL dialect)."""
        return self.spark.sql(statement)

    def explain(self, name: str, sf_dir: str) -> str:
        """AQE-formatted physical plan of the named query."""
        df = self.query(name, sf_dir)
        return self.spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    # -- pipelines -----------------------------------------------------
    def run_fa_pipeline(self, input_dir: str, **kwargs) -> DataFrame:
        """The reference's full ETL (zips → staged → ranked → unified
        merge); see pipeline/run.py run_pipeline for options."""
        from firstamerican_etl_spark.pipeline.run import run_pipeline

        return run_pipeline(self.spark, input_dir, **kwargs)

    def build_corpus_from(self, input_parquet: str, out_dir: str, **kwargs):
        """Training-corpus build (dedup → quality → redact → pack →
        split → write); see pipeline/corpus_build.py for options."""
        from firstamerican_etl_spark.pipeline.corpus_build import build_corpus

        docs = self.spark.read.parquet(input_parquet)
        return build_corpus(self.spark, docs, out_dir, **kwargs)
