"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in firstamerican_etl_spark/plans/ — one registered
(PySpark plan, DuckDB oracle SQL) pair per operator from SURVEY.md §2
plus the training-data-pipeline extensions.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from firstamerican_etl_spark.plans.registry import load_all

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference's unified-merge join
    cascade (fa-etl.py:429-483) re-expressed as one Spark plan."""
    registry = load_all()
    return registry["fa_flagship_merged"].spark(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data-pipeline extensions). load_all() orders the dict so
    the driver's 50-entry correctness window covers one proving query
    per §2 operator family AND the LLM-pipeline flagships — see
    plans/registry.py DRIVER_WINDOW (pinned by
    tests/test_registry_window.py); everything after slot 50 carries
    the same local DuckDB-oracle coverage in tests/test_oracle.py."""
    return {name: spec.spark for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; non-SQL-expressible ops
    (MinHash/SimHash/LSH internals) are omitted → rows-only check."""
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
