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


# The driver's CORRECTNESS harness verifies the FIRST 50 entries of
# load_all() in dict-insertion order. This explicit priority window
# pins those 50 slots to a curated set: one proving query per
# SURVEY.md §2 operator family PLUS the LLM-data-pipeline flagships
# (dedup, deterministic sampling, multimodal, corpus prep, streaming
# batch-twin, TF-IDF) and the round-3 scale operators. Everything
# outside the window keeps full local oracle coverage in
# tests/test_oracle.py — the window only chooses which 50 get the
# driver's independent green row. tests/test_registry_window.py pins
# the window's size, existence, and ordering.
DRIVER_WINDOW: tuple[str, ...] = (
    # ------------------------------------------------------------------
    # r11 FINAL ROTATION, last of the three planned sweeps (VERDICT r10
    # #2). After r10's 45-first-timer sweep the cumulative driver-proven
    # count is 204/261 (recomputed from the CORRECTNESS_r*.json union —
    # `python tools/driver_sim.py --ledger`); exactly 45 window-eligible
    # queries (full value oracle, non-`contrast`) have never received an
    # independent driver row. This window pins the same FIVE veterans —
    # the three FA anchors (the reference's own pipeline, re-proven
    # every round), the TPC-H aggregation flagship, and the corpus e2e —
    # and fills all FORTY-FIVE remaining slots with the entire eligible
    # backlog, including the r10 red-row retry
    # (range_join_quantity_bands — float-vs-BIGINT local_df dtype
    # mismatch, fixed in sources/io.py + extplans.py, regression-tested
    # Arrow-off in tests/test_arrow_off.py) and the two r10 additions
    # (drift_ks_two_sample, corpus_snapshot_diff). A green round leaves
    # only the 12 structurally ineligible rows (10 rows-only sketches
    # with driver-proven oracled twins + 2 `contrast` anchors)
    # driver-unproven. Every rotated-out veteran keeps its full local
    # oracle in tests/test_oracle.py.
    # ------------------------------------------------------------------
    # — pinned veterans (5) —
    "fa_ranked_deed",
    "fa_valhist_cascade",
    "fa_flagship_merged",
    "q1_pricing_summary",
    "corpus_clean_pipeline",
    # — r10 red-row retry (1) —
    "range_join_quantity_bands",
    # — r10 additions, driver-pending (2) —
    "drift_ks_two_sample",
    "corpus_snapshot_diff",
    # — aggregation / stats tail (9) —
    "agg_arg_extremes",
    "agg_collect_set_sorted",
    "modal_quantity_per_flag",
    "stats_moments_stable",
    "iqr_outlier_bounds",
    "pearson_correlation_matrix",
    "linreg_price_on_qty",
    "table_profile",
    "dq_constraint_report",
    # — text / corpus tail (10) —
    "bpe_pair_counts",
    "ngram_shingles",
    "repetition_dup_ngram_coverage",
    "repetition_top_bigram",
    "corpus_byte_histogram",
    "quality_classifier_score",
    "zipf_rank_frequency",
    "chi2_lang_source",
    "doc_chunk_windows",
    "udtf_tokenize_lateral",
    # — training-prep tail (6) —
    "train_split_assign",
    "sample_stratified_hash",
    "token_budget_sample",
    "length_bucket_batching",
    "hard_negative_mining",
    "retrieval_eval_ndcg",
    # — embedding tail (3) —
    "embedding_centroid_per_label",
    "embedding_quantize_int8",
    "int8_recon_fidelity",
    # — time-series / sessionization tail (8) —
    "rolling_7d_active_users",
    "gap_fill_forward",
    "gap_fill_interpolate",
    "ewma_truncated_k8",
    "funnel_stage_conversion",
    "cohort_retention_matrix",
    "markov_event_transitions",
    "event_mix_gini_by_weekday",
    # — functions / arrays tail (4) —
    "array_higher_order",
    "map_event_type_counts",
    "regexp_extract_numbers",
    "levenshtein_similar_parts",
    # — misc analytics tail (2) —
    "basket_cooccurrence_pairs",
    "inverted_index_postings",
)

# (The retired r8/r9 window generations and their per-slot retirement
# rationale live in git history — `git show eb35e5a:.../registry.py`
# for r9, the r8 tag for r8. Nothing imports them, so they are not
# kept as dead constants here.)


def load_all() -> dict[str, QuerySpec]:
    """Import all plan modules (side-effect: fills REGISTRY), then
    order the result so DRIVER_WINDOW occupies the first 50 slots
    (the driver's correctness harness checks exactly those); the
    remaining queries follow in module-registration order."""
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
        retrievalplans,
        geoplans,
        graphplans,
        webplans,
    )

    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise KeyError(f"DRIVER_WINDOW names not registered: {missing}")
    ordered = {name: REGISTRY[name] for name in DRIVER_WINDOW}
    ordered.update(
        (name, spec) for name, spec in REGISTRY.items() if name not in ordered
    )
    return ordered
