"""Empty-input behavior for the operators that collect driver-side
scalars (cutpoints, codebooks, shard offsets): a fully filtered input
— routine after selective partition pruning at scale — must yield an
EMPTY result with the normal schema, never a KeyError from a missing
boundary rank or codebook entry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import firstamerican_etl_spark.plans.analyticsplans as analyticsplans
import firstamerican_etl_spark.plans.corpusplans as corpusplans
import firstamerican_etl_spark.plans.extplans as extplans
import firstamerican_etl_spark.plans.vectorplans as vectorplans
from firstamerican_etl_spark.plans.registry import load_all
from firstamerican_etl_spark.sources.io import load_table

REGISTRY = load_all()

_CASES = {
    "quantile_bins_scalable": (extplans, ("quartile", "n_orders", "lo", "hi")),
    "pq_adc_topk": (vectorplans, ("q_id", "c_id", "adc_dist")),
    "corpus_pack_contiguous": (
        corpusplans,
        ("bin_id", "n_docs", "total_tokens", "first_doc", "last_doc"),
    ),
    "pareto_cumulative_share": (
        analyticsplans,
        ("rnk", "o_custkey", "revenue", "cum_share"),
    ),
}


@pytest.fixture()
def empty_tables(monkeypatch):
    def empty_load(spark, sf_dir, name):
        return load_table(spark, sf_dir, name).filter(F.lit(False))

    for mod, _ in _CASES.values():
        monkeypatch.setattr(mod, "load_table", empty_load)


@pytest.mark.parametrize("name", sorted(_CASES))
def test_empty_input_yields_empty_result(spark, sf_dir, name, empty_tables):
    df = REGISTRY[name].spark(spark, sf_dir)
    assert df.count() == 0
    assert tuple(df.columns) == _CASES[name][1]
