"""Engine façade: delegation only, no behavior of its own."""

from __future__ import annotations

import pytest

from firstamerican_etl_spark.api import Engine


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark)


def test_list_and_query(eng, sf_dir):
    qs = eng.list_queries()
    assert len(qs) >= 170
    assert "fa_flagship_merged" in qs
    df = eng.query("q1_pricing_summary", sf_dir)
    assert df.count() > 0


def test_unknown_query_raises(eng):
    with pytest.raises(KeyError, match="list_queries"):
        eng.query("no_such_query", "/tmp")


def test_oracle_and_sql_and_explain(eng, sf_dir):
    assert "SELECT" in eng.oracle_sql("q1_pricing_summary").upper()
    assert eng.oracle_sql("dedup_minhash_lsh") is None
    assert eng.sql("SELECT 1 AS x").first()["x"] == 1
    plan = eng.explain("q5_region_revenue", sf_dir)
    assert "BroadcastHashJoin" in plan or "Physical Plan" in plan


def test_build_corpus_from(eng, sf_dir, tmp_path):
    out = str(tmp_path / "api_corpus")
    stats = eng.build_corpus_from(f"{sf_dir}/documents.parquet", out)
    assert stats.n_after_quality > 0
    assert eng.spark.read.parquet(out).count() == stats.n_after_quality
