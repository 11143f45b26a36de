"""Differential tests: every registered query with an oracle must match
DuckDB exactly (the driver's t2 gate, run here at sf0.001 for speed —
set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full tier).
Queries without an oracle are smoke-checked (plan executes, schema
stable, deterministic across two runs)."""

from __future__ import annotations

import pytest

from firstamerican_etl_spark.plans.registry import load_all
from tests.oracle_harness import compare, spark_rows

REGISTRY = load_all()
WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    errs = compare(name, df, spec.oracle, sf_dir)
    assert not errs, "\n".join(errs)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_deterministic(spark, sf_dir, name):
    spec = REGISTRY[name]
    c1, r1 = spark_rows(spec.spark(spark, sf_dir))
    c2, r2 = spark_rows(spec.spark(spark, sf_dir))
    assert c1 == c2
    assert sorted(map(str, r1)) == sorted(map(str, r2)), f"{name} nondeterministic"
    assert len(r1) >= 0
