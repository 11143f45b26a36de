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
    # r15 WINDOW — fourth round of the STANDING RE-PROVE ROTATION,
    # first round of the CODE-TOUCHED-FIRST extension (VERDICT r14 #1):
    # exactly 5 pinned veterans + 45 rotation slots.
    #
    # Rotation policy (VERDICT r11 #4, extended r15):
    #
    #   slots  1-5   PINNED VETERANS, never rotated: the three FA
    #                anchors (the reference's own pipeline), the TPC-H
    #                aggregation flagship, and the corpus e2e — proven
    #                fresh EVERY round so the core contract can never
    #                silently drift.
    #   slots  6-50  (a) eligible NEVER-PROVEN queries first (none this
    #                round), then (b) CODE-TOUCHED since last green:
    #                any query whose registered function's same-module
    #                AST-closure fingerprint changed between its last
    #                green round's artifact commit and the latest round
    #                boundary (driver_sim.code_touched_since_green) —
    #                a rewritten query re-proves NEXT round instead of
    #                waiting ~6 rounds for its staleness slot (this
    #                round: the 14 r14-rewritten paths — repetition,
    #                cdc, both triangles + 50k, kcore/lpa/khop,
    #                knn_ivf, bootstrap, stats_moments, containment,
    #                heavy_hitters, retrieval_ndcg); then (c) the
    #                stalest PROVEN eligible queries by MOST RECENT
    #                green driver row across the GIT-TRACKED
    #                CORRECTNESS_r*.json, ties alphabetical — this
    #                round the r9-r10 vintage fills the remainder.
    #
    # Regenerate per round: `python tools/driver_sim.py --rotation`
    # prints the COMPLETE 50-line tuple body (veterans included) —
    # paste it verbatim, then `--rotation-note` writes the
    # ROTATION_r{N}.json provenance artifact (VERDICT r14 #9) so the
    # driver's window diff is never read as dropped queries.
    # tests/test_registry_window.py::
    # test_window_is_veterans_plus_stalest_eligible pins the result.
    # ------------------------------------------------------------------
    # — pinned veterans (5) —
    "fa_ranked_deed",
    "fa_valhist_cascade",
    "fa_flagship_merged",
    "q1_pricing_summary",
    "corpus_clean_pipeline",
    # — rotation (45): code-touched first, then oldest MOST RECENT green —
    # code-touched since last green (r10):
    "graph_triangle_count",
    "graph_triangle_degree_50k",
    # code-touched since last green (r11):
    "repetition_dup_ngram_coverage",
    "retrieval_eval_ndcg",
    "stats_moments_stable",
    # code-touched since last green (r13):
    "bootstrap_mean_ci_poisson",
    "cdc_chunk_dedup",
    "doc_containment_pairs",
    "graph_triangle_count_degree",
    "heavy_hitters_cms",
    "kcore_peel_unrolled",
    "khop_neighbor_agg",
    "knn_ivf_recall_eval",
    "lpa_communities_unrolled",
    # last green r9:
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "q20_promotion_suppliers",
    "q22_dormant_customers",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_revenue_forecast",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "quality_gopher_rules",
    "salted_skew_join",
    "semdedup_threshold_sweep",
    "streaming_custom_source_agg",
    "streaming_dedup_exactly_once",
    "streaming_dedup_within_watermark",
    "streaming_sessionize_stateful",
    "streaming_tumbling_window",
    "text_redact_pii",
    # last green r10:
    "asof_join_events_orders",
    "asof_join_forward",
    "bucketed_join_colocated",
    "dedup_exact",
    "dedup_incremental_ingest",
    "domain_registrable_profile",
    "events_from_orc",
    "exact_percentiles",
    "full_outer_reconcile",
    "geo_haversine_knn",
    "geo_morton_bucket",
    "global_row_index_scalable",
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
