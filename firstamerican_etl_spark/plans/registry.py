"""Query registry: every operator from SURVEY.md §2 (plus the
training-data-pipeline extensions) gets a named (PySpark plan, oracle
SQL) pair here. The driver contract (/root/repo/__spark_entry__.py)
exposes this as ``queries()`` / ``oracle_sql()``.

Conventions enforced by the harness (tests/test_oracle.py):
- Column names in the Spark result and the oracle SQL match exactly
  (the driver sorts columns by name before value-hashing).
- Double-typed aggregates are wrapped in round(x, N) on BOTH sides so
  summation-order differences between engines can't flip the hash.
- Sorts that feed a LIMIT carry a unique tie-break key, so the row set
  is deterministic.
- Queries whose semantics are not ANSI-SQL-expressible (MinHash bands,
  SimHash, streaming state) register ``oracle=None`` → the driver
  records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None
    tags: tuple[str, ...] = field(default=())
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import all plan modules (side-effect: fills REGISTRY)."""
    from firstamerican_etl_spark.plans import (  # noqa: F401
        core,
        fa,
        textplans,
        vectorplans,
        eventplans,
        dedupplans,
        streamingplans,
        multimodalplans,
        extplans,
        tpchplans,
        tpchplans3,
        trainplans,
        etlplans,
        funcplans,
        analyticsplans,
        timeseriesplans,
        arrayplans,
        statsplans,
        corpusplans,
    )

    return REGISTRY
