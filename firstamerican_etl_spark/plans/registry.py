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
    # r12 WINDOW — first round of the STANDING RE-PROVE ROTATION.
    #
    # Rotation policy (VERDICT r11 #4), now the steady-state cadence
    # since the eligible backlog closed in r11 (247/261 driver-proven;
    # only the 12 structurally ineligible rows plus this round's 2
    # retries remain unproven):
    #
    #   slots  1-5   PINNED VETERANS, never rotated: the three FA
    #                anchors (the reference's own pipeline), the TPC-H
    #                aggregation flagship, and the corpus e2e — proven
    #                fresh EVERY round so the core contract can never
    #                silently drift.
    #   slots  6-7   RETRIES: queries whose last driver row was red,
    #                re-windowed in the same round as their fix. This
    #                round: the two r11 array-output canonicalizer
    #                crashes (agg_collect_set_sorted,
    #                inverted_index_postings), now emitting canonical
    #                sorted STRINGS on both engine and oracle sides.
    #   slots  8-50  OLDEST-FIRST RE-PROVE: the 43 eligible queries
    #                whose MOST RECENT green driver row is oldest
    #                (recompute per round from the CORRECTNESS_r*.json
    #                union — max green round per name, NOT first-proven,
    #                which is immutable and would re-select the same
    #                cohort forever; ties broken alphabetically). Every
    #                proof thus ages out and gets re-established against
    #                current code rather than standing as a one-shot
    #                historical artifact; with ~250 eligible queries
    #                and 43 slots per round, each proof refreshes at
    #                least every ~6 rounds. Contrast-tagged rows are
    #                excluded even when historically proven (r1 proved
    #                dedup_embedding_cosine_vectorized before the
    #                contrast policy existed). This round re-proves the
    #                r2-r6 vintage — many r1 firsts were re-proven by
    #                later windows, so the stalest greens are the r2-r3
    #                setop/events/sampling tails and the r4-r6 rows no
    #                window has touched since.
    #
    # Any NEW oracled query enters at the top of the rotation segment
    # (it has no driver row, so it is oldest by definition — and
    # tests/test_docs_coverage.py asserts every eligible never-proven
    # query holds a window slot).
    # ------------------------------------------------------------------
    # — pinned veterans (5) —
    "fa_ranked_deed",
    "fa_valhist_cascade",
    "fa_flagship_merged",
    "q1_pricing_summary",
    "corpus_clean_pipeline",
    # — r11 red-row retries (2): array outputs stringified both sides —
    "agg_collect_set_sorted",
    "inverted_index_postings",
    # — oldest-first re-prove rotation (43), keyed on MOST RECENT green —
    # last green r2:
    "anti_join_not_exists",
    "cube_agg",
    "distinct_projection",
    "events_from_xml",
    "events_json_extract",
    "pagination_limit_offset",
    "semi_join_exists",
    "setop_except_all",
    # last green r3:
    "coalesce_cascade_q",
    "concat_fallback",
    "doc_fingerprint",
    "embedding_norms",
    "events_multi_resolution_rollup",
    "events_sliding_window",
    "events_tumbling_window",
    "knn_ivf_cells",
    "multimodal_decode_stats",
    "rollup_agg",
    "sample_fixed_k_per_group",
    "sample_hash_deterministic",
    "setop_except",
    "setop_intersect",
    "window_analytics",
    # last green r4:
    "conditional_flags",
    "pareto_cumulative_share",
    "q5_region_revenue",
    "streaming_foreachbatch_ingest",
    "token_count",
    "unigram_logprob_score",
    # last green r5:
    "asymmetric_key_join",
    "cosine_topk_bruteforce",
    "events_from_jsonl",
    "having_filter",
    "lang_id_heuristic",
    "q3_shipping_priority",
    "setop_union",
    "sort_limit_topk",
    "window_topk_per_group",
    # last green r6:
    "agg_groupby_full",
    "dim_join_broadcast",
    "dsir_importance_weights",
    "duplicate_span_report",
    "embedding_gram_matrix",
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
