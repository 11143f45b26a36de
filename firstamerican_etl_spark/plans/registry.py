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
    # r14 WINDOW — third round of the STANDING RE-PROVE ROTATION,
    # steady state (r13 went 50/50 green, zero retries outstanding):
    # exactly 5 pinned veterans + the 45 stalest-proven eligible rows.
    #
    # Rotation policy (VERDICT r11 #4):
    #
    #   slots  1-5   PINNED VETERANS, never rotated: the three FA
    #                anchors (the reference's own pipeline), the TPC-H
    #                aggregation flagship, and the corpus e2e — proven
    #                fresh EVERY round so the core contract can never
    #                silently drift.
    #   slots  6-50  OLDEST-FIRST RE-PROVE: the 45 eligible queries
    #                (full value oracle, non-contrast, non-veteran)
    #                whose MOST RECENT green driver row is oldest —
    #                max green round per name across the GIT-TRACKED
    #                CORRECTNESS_r*.json (tracked-only since r13: the
    #                driver's post-round untracked drop must not re-age
    #                the world mid-judgment — VERDICT r12 #1), NOT
    #                first-proven, which is immutable and would
    #                re-select the same cohort forever; ties broken
    #                alphabetically. With ~249 eligible queries and 45
    #                slots per round, each proof refreshes at least
    #                every ~6 rounds. Contrast-tagged rows are excluded
    #                even when historically proven. This round
    #                re-proves the r8-r9 vintage.
    #
    # Any NEW oracled query (or red-row retry) enters at the top of the
    # rotation segment — it has no green row, so it is stalest by
    # definition; `driver_sim --rotation` now prints those first
    # (ADVICE r12) and tests/test_docs_coverage.py asserts every
    # eligible never-proven query holds a window slot. Regenerate per
    # round: `python tools/driver_sim.py --rotation 45` prints the
    # COMPLETE 50-line tuple body (veterans included) — paste it
    # verbatim; tests/test_registry_window.py::
    # test_window_is_veterans_plus_stalest_eligible pins the result.
    # ------------------------------------------------------------------
    # — pinned veterans (5) —
    "fa_ranked_deed",
    "fa_valhist_cascade",
    "fa_flagship_merged",
    "q1_pricing_summary",
    "corpus_clean_pipeline",
    # — oldest-first re-prove rotation (45), keyed on MOST RECENT green —
    # last green r8:
    "mad_outlier_zscores",
    "minhash_lsh_recall_eval",
    "multimodal_wds_roundtrip",
    "ngram_diversity_ratio",
    "ols_trend_per_group",
    "pmi_collocations",
    "recursive_cte_hierarchy",
    "rendezvous_shard_assign",
    "rfm_user_segments",
    "rolling_7d_median_bucketed",
    "sample_weighted_maxhash",
    "semdedup_cluster_prune_sqrtk",
    "setop_intersect_all",
    "streaming_outer_interval_join",
    "streaming_ttl_throttle",
    "timeseries_gapfill_ffill",
    "weekday_seasonality_profile",
    "weighted_median_udaf",
    "winsorized_robust_mean",
    # last green r9:
    "bpe_train_unrolled",
    "char_entropy_quality",
    "contamination_ngram_overlap",
    "count_distinct_two_phase",
    "dedup_cluster_components",
    "dedup_image_dhash_distinct",
    "dedup_minhash_lsh_oracled",
    "epoch_shuffle_shards",
    "events_burst_dedup",
    "events_session_window_native",
    "fazip_source_roundtrip",
    "hybrid_rrf_fusion",
    "jaccard_df_capped_pairs",
    "jsonlgz_sink_roundtrip",
    "matryoshka_truncation_recall",
    "multimodal_knn_bucketed",
    "ndcg_at_k_eval",
    "pq_adc_topk",
    "q10_returned_items",
    "q11_important_types",
    "q12_priority_by_status",
    "q13_order_count_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
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
