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
    # r13 WINDOW — second round of the STANDING RE-PROVE ROTATION, and
    # the first PURE steady-state one: zero retries and zero new
    # queries outstanding (r12 went 50/50 green), so the window is
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
    #                re-proves the r6-r8 vintage.
    #
    # Any NEW oracled query (or red-row retry) enters at the top of the
    # rotation segment — it has no green row, so it is stalest by
    # definition; `driver_sim --rotation` now prints those first
    # (ADVICE r12) and tests/test_docs_coverage.py asserts every
    # eligible never-proven query holds a window slot. Regenerate per
    # round: `python tools/driver_sim.py --rotation 45` and paste below
    # the veterans; tests/test_registry_window.py::
    # test_window_is_veterans_plus_stalest_eligible pins the result.
    # ------------------------------------------------------------------
    # — pinned veterans (5) —
    "fa_ranked_deed",
    "fa_valhist_cascade",
    "fa_flagship_merged",
    "q1_pricing_summary",
    "corpus_clean_pipeline",
    # — oldest-first re-prove rotation (45), keyed on MOST RECENT green —
    # last green r6:
    "events_session_window",
    "heavy_hitters_cms",
    "knn_ivf_recall_eval",
    "left_join_null_filter",
    "mixture_temperature_resample",
    "pagerank_trade_graph",
    "quantile_bins_scalable",
    "scan_filter_project",
    "string_date_funcs",
    "text_quality",
    "tfidf_top_terms",
    "window_dedup_top1",
    # last green r7:
    "boilerplate_segment_dedup",
    "corpus_drift_psi",
    "dedup_exact_keep_first",
    "doc_containment_pairs",
    "geo_knn_grid_bucketed",
    "q21_waiting_orders",
    "sql_interface_passthrough",
    "streaming_interval_join",
    "vocab_oov_rate",
    # last green r8:
    "asof_join_nearest",
    "association_rules_lift",
    "audience_overlap_jaccard",
    "bm25_topk_retrieval",
    "bootstrap_mean_ci_poisson",
    "bpe_apply_fertility",
    "cdc_chunk_dedup",
    "corpus_pack_contiguous",
    "dedup_simhash_oracled",
    "dedup_survivorship_report",
    "duplicate_span_cut",
    "event_path_trigrams",
    "events_variant_shred",
    "funnel_time_bounded",
    "geo_point_in_polygon_join",
    "graph_triangle_count_degree",
    "incremental_agg_merge",
    "kcore_peel_unrolled",
    "khop_neighbor_agg",
    "kmeans_lloyd_step_oracled",
    "knn_lsh_bucketed_oracled",
    "lang_id_confusion",
    "leakage_safe_split_assign",
    "lpa_communities_unrolled",
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
