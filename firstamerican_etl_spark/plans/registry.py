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
    # r10 MASS ROTATION, second of the three planned sweeps (VERDICT r9
    # #1). After r9's 43-first-timer sweep, 99 of 259 registry entries
    # had never received an independent driver CORRECTNESS row. This
    # round pins only FIVE veterans — the three FA anchors (the
    # reference's own pipeline, re-proven every round), the TPC-H
    # aggregation flagship, and the corpus e2e — and fills FORTY-FIVE
    # slots with first-timers in the verdict's priority order: the
    # §2-mapped extension proofs (union_by_name resolves the
    # fa-etl.py:581-582 TODO), the source formats (ORC, mergeSchema),
    # then the multimodal / graph / join / scale / analytics / dedup
    # tails. Every rotated-out veteran keeps its full local oracle in
    # tests/test_oracle.py; per-slot retirement rationale lives in git
    # history (r9 tag). No `contrast` row is eligible, and every window
    # row carries a full value oracle (test_registry_window pins both).
    # ------------------------------------------------------------------
    # — pinned veterans (5) —
    "fa_ranked_deed",
    "fa_valhist_cascade",
    "fa_flagship_merged",
    "q1_pricing_summary",
    "corpus_clean_pipeline",
    # — §2-mapped extension proofs (11) —
    "union_by_name",
    "grouping_sets_agg",
    "exact_percentiles",
    "pivot_status_by_year",
    "unpivot_part_attrs",
    "posexplode_tokens",
    "window_range_frame",
    "dedup_exact",
    "text_normalize",
    "asof_join_events_orders",
    "range_join_quantity_bands",
    # — source formats (3) —
    "events_from_orc",
    "orc_source_roundtrip",
    "scan_merge_schema",
    # — r9 web-corpus additions, driver-pending (2) —
    "url_normalize_dedup",
    "domain_registrable_profile",
    # — never-proven streaming (2) —
    "streaming_sliding_window",
    "streaming_static_enrich",
    # — multimodal tail (5) —
    "multimodal_ppm_pixel_decode",
    "multimodal_binaryfile_ingest",
    "multimodal_resize_chain",
    "multimodal_frame_sample",
    "multimodal_featurize_knn",
    # — graph / geo tail (4) —
    "graph_triangle_count",
    "graph_triangle_degree_50k",
    "geo_haversine_knn",
    "geo_morton_bucket",
    # — join-family tail (5) —
    "asof_join_forward",
    "full_outer_reconcile",
    "join_null_safe",
    "merge_upsert_snapshot",
    "scd2_value_intervals",
    # — scale-operator tail (5) —
    "global_row_index_scalable",
    "global_running_sum_scalable",
    "bucketed_join_colocated",
    "salted_skew_agg",
    "key_skew_report",
    # — window / analytics tail (5) —
    "histogram_width_bucket",
    "ntile_price_quartiles",
    "window_percent_rank",
    "yoy_revenue_change",
    "share_of_total_window",
    # — dedup / similarity tail (3) —
    # (dedup_embedding_cosine held this slot when r10 opened; the same
    # round's probe-coverage closure measured it at 17.0x/decade —
    # fixed-cardinality label blocking — and it was retagged
    # `contrast`; the exact n-gram Jaccard pair anchor, never
    # driver-seen and the lossless oracle the capped/prefix-filter
    # variants verify against, takes the slot)
    "ngram_jaccard_pairs",
    "dedup_incremental_ingest",
    "jaccard_prefix_filter_pairs",
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
