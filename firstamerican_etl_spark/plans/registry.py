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

# The r9 window, kept importable for the rotation-history tests and as
# the documented prior generation (every name below is driver-proven
# green in CORRECTNESS_r09.json).
_R9_WINDOW: tuple[str, ...] = (
    "fa_ranked_deed",
    "fa_valhist_cascade",
    "fa_flagship_merged",
    "q1_pricing_summary",
    "dedup_minhash_lsh_oracled",
    "corpus_clean_pipeline",
    "streaming_tumbling_window",
    "epoch_shuffle_shards",
    "ndcg_at_k_eval",
    "semdedup_threshold_sweep",
    "jaccard_df_capped_pairs",
    "multimodal_knn_bucketed",
    "streaming_sessionize_stateful",
    "streaming_dedup_within_watermark",
    "streaming_dedup_exactly_once",
    "streaming_custom_source_agg",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_revenue_forecast",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_types",
    "q12_priority_by_status",
    "q13_order_count_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "q20_promotion_suppliers",
    "q22_dormant_customers",
    "quality_gopher_rules",
    "text_redact_pii",
    "bpe_train_unrolled",
    "char_entropy_quality",
    "pq_adc_topk",
    "matryoshka_truncation_recall",
    "events_session_window_native",
    "events_burst_dedup",
    "dedup_cluster_components",
    "contamination_ngram_overlap",
    "salted_skew_join",
    "count_distinct_two_phase",
    "hybrid_rrf_fusion",
    "dedup_image_dhash_distinct",
    "fazip_source_roundtrip",
    "jsonlgz_sink_roundtrip",
)

# The r8 window, kept importable for the rotation-history tests and as
# the documented prior generation (every name below is driver-proven
# green in CORRECTNESS_r08.json).
_R8_WINDOW: tuple[str, ...] = (
    # (scan_filter_project retired to local-oracle coverage in r7 —
    # P1-P5 scan/project/filter stay driver-proven inside q1, the FA
    # flagship chain and string_date's scan; slot reused for the r6
    # LPA community detection, never driver-seen: the third iterative
    # graph family after PageRank and CC.)
    "lpa_communities_unrolled",
    # (sort_limit_topk retired to local-oracle coverage in r6 — the
    # ordered-limit shape stays driver-proven inside q21's top-100 and
    # the per-group top-k flagships; slot reused for the SimHash md5
    # verification twin, never driver-seen before)
    "dedup_simhash_oracled",
    # §2 aggregation family (rollup/cube/grouping-sets keep full local
    # oracles in tests/test_oracle.py)
    "q1_pricing_summary",
    # (agg_groupby_full retired to local-oracle coverage in r7 — the
    # multi-aggregate groupBy shape stays driver-proven by q1 and the
    # FA family chains; slot reused for the K=30 k-core peel, never
    # driver-seen: iterative graph peeling with a round-for-round CTE
    # oracle.)
    "kcore_peel_unrolled",
    # (having_filter retired to local-oracle coverage in r6 — the
    # post-agg filter is also driver-proven inside q21 and the q18
    # local oracle; slot reused for the corpus-drift PSI monitor,
    # never driver-seen before. r8: PSI retired after two green
    # rounds — the distribution-shift stats family stays driver-
    # proven five ways in-window (bootstrap CI, winsorized mean, MAD
    # z-scores, OLS trend, weighted median); slot reused for RFM
    # user segmentation, never driver-seen: global quantile cutpoints
    # re-broadcast onto the fact scan, the BI-workload flagship.)
    "rfm_user_segments",
    # §2 join family (J1-J6)
    # (dim_join_broadcast retired to local-oracle coverage in r7 — J3
    # broadcast dim joins stay driver-proven inside q21 and the FA
    # flagship's dimension chain; slot reused for association-rule
    # confidence/lift over basket pairs, never driver-seen: the
    # market-basket analytics family's first window row.)
    "association_rules_lift",
    # (left_join_null_filter retired to local-oracle coverage in r7
    # batch 2 — J6 left-join + null-reject (⇒ inner) stays driver-
    # proven inside fa_valhist_cascade's cascade joins and q21; slot
    # reused for the Poisson-bootstrap mean CI, never driver-seen:
    # the distributable bootstrap as 2+2B exact partial sums.)
    "bootstrap_mean_ci_poisson",
    # (asymmetric_key_join retired to local-oracle coverage in r6 —
    # expression-keyed joins stay driver-proven inside
    # pagerank_trade_graph and the q2 local oracle; slot reused for
    # the Lloyd-step kmeans md5 twin, never driver-seen before)
    "kmeans_lloyd_step_oracled",
    # §2 window family (W1/W2): fa_ranked_deed IS the W1 ranked-dedup
    # operator applied to the reference's own chain
    # (operators/relational.py:22, same code path), so
    # window_dedup_top1 retired to local-oracle coverage in r7 batch 2
    # after six green rounds; slot reused for the rank-defined
    # winsorized mean, never driver-seen: robust location with
    # integer-exact p01/p99 cutpoints.
    "winsorized_robust_mean",
    # (window_topk_per_group retired to local-oracle coverage in r6 —
    # per-group top-k stays driver-proven by window_dedup_top1,
    # fa_ranked_deed and geo_knn_grid_bucketed; slot reused for the
    # cluster survivorship report, never driver-seen before)
    "dedup_survivorship_report",
    # (§2.7 setop_union retired to local-oracle coverage in r6 per the
    # r5 verdict's own suggestion — union/unionByName stay driver-
    # proven inside the FA multi-county pipeline and the span-cut CC
    # edge build; intersect/except keep full local oracles. Slot
    # reused for the leakage-safe split assignment, never driver-seen
    # before and the anti-contamination flagship.)
    "leakage_safe_split_assign",
    # §2.8 scalar function surface (F1-F14; string_date_funcs retired
    # to local-oracle coverage in r7 — the cast/slice/lpad/date-parse
    # family stays driver-proven inside fa_ranked_deed +
    # fa_valhist_cascade, which exist to exercise exactly those
    # scalars; the F9/F10 coalesce cascade and F11 concat-fallback
    # keep their dedicated full local oracles. Slot reused for
    # INTERSECT ALL, never driver-seen: bag-semantics min-multiplicity
    # set op completing the §2.7 family.)
    "setop_intersect_all",
    # (conditional_flags — F7/F8 flag surface — retired to local-oracle
    # coverage in r5: its scalar family is also driver-proven inside
    # string_date_funcs + fa_ranked_deed; slot reused for the Arrow
    # UDAF family the driver had never seen)
    "weighted_median_udaf",
    # (sql_interface_passthrough retired to local-oracle coverage in
    # r8 after six green rounds — the spark.sql surface stays driver-
    # proven by recursive_cte_hierarchy, which parses/plans through
    # the same SQL front door; slot reused for the time-bounded
    # sequential funnel, never driver-seen: skip-ahead stage matching
    # with per-stage deadline windows, the event-analytics flagship.)
    "funnel_time_bounded",
    # (events_from_jsonl retired to local-oracle coverage in r6 — the
    # jsonl scan stays driver-proven inside events_variant_shred,
    # which reads the same source into VariantType; slot reused for
    # the per-language tokenizer-vocabulary OOV audit, never
    # driver-seen before. r8: vocab_oov_rate retired after two green
    # rounds — the vocab-audit family stays driver-proven by
    # bpe_apply_fertility (train→apply OOV/fertility on the same
    # tokenizer surface); slot reused for the language-ID CONFUSION
    # MATRIX eval, never driver-seen: the n-gram classifier graded
    # in-plan against labels, precision/recall/F1 per language.)
    "lang_id_confusion",
    # TPC-H shapes in the window (q21: the single-scan decorrelation;
    # q3 retired to local-oracle coverage in r6 — the join+agg+topk
    # shape stays driver-proven by q1/q21/fa_flagship. Slot reused
    # for the MinHash-LSH recall/precision eval: the banding scheme
    # graded in-plan against exact Jaccard truth, never driver-seen.)
    "minhash_lsh_recall_eval",
    # (q5_region_revenue retired to local-oracle coverage in r5 — the
    # multi-join + agg shape stays driver-proven by q3/q21 and the FA
    # flagship; slot reused for SemDeDup, a driver-unseen family.
    # r8: the fixed-K oracle twin retired to local-oracle coverage —
    # its quadratic N²/K pair term was the repo's last perf-weak
    # registered plan; the √N-cells SCALE path takes the slot, now
    # carrying its own full value oracle (K derived in SQL), so the
    # driver proves the plan a 100× scale-up would actually run.)
    "semdedup_cluster_prune_sqrtk",
    # (q21_waiting_orders retired to local-oracle coverage in r8 after
    # seven green rounds — the decorrelated-exists + ordered-limit
    # shape stays driver-proven by q1 + fa_flagship + the per-group
    # top-k rows; slot reused for the NEAREST-direction as-of join,
    # never driver-seen: the r7 completion of the as-of family
    # (backward/forward proven locally) under a DuckDB ASOF oracle.)
    "asof_join_nearest",
    # the reference's own pipeline (fa-etl.py) re-expressed
    "fa_ranked_deed",
    "fa_valhist_cascade",
    "fa_flagship_merged",
    # text analysis + retrieval (text_quality retired to local-oracle
    # coverage in r7 — the scalar text-quality family stays
    # driver-proven by vocab_oov_rate/tfidf/bm25 below; slot reused
    # for the distinct-n corpus diversity diagnostic, never
    # driver-seen: in-plan n-gram slicing + the Expand-free two-phase
    # distinct recipe. BM25 is the lexical-retrieval flagship of the
    # round-4 retrieval family.)
    "ngram_diversity_ratio",
    # (token_count retired to local-oracle coverage in r5 — whitespace
    # + BPE-ish counting is also exercised inside corpus_pack/BM25;
    # slot reused for Spark 4 recursive CTE, a driver-unseen family)
    "recursive_cte_hierarchy",
    # (lang_id_heuristic retired to local-oracle coverage in r6 — the
    # scalar text family stays driver-proven via text_quality/tfidf/
    # bm25; slot reused for the sign-LSH md5 verification twin, never
    # driver-seen before — with it, all three rows-only ANN/dedup fast
    # paths now have their value-oracled twin independently green in
    # the driver.)
    "knn_lsh_bucketed_oracled",
    # (unigram_logprob_score retired to local-oracle coverage in r5;
    # dsir_importance_weights — its r5 replacement — retired in r7
    # batch 2 after two green rounds, importance weighting keeps its
    # full local oracle; slot reused for closed-form per-group OLS,
    # never driver-seen: a 100 TB regression as one decimal power-sum
    # aggregate.)
    "ols_trend_per_group",
    "bm25_topk_retrieval",
    # embeddings / ANN (cosine_topk_bruteforce retired to local-oracle
    # coverage in r6 — the cosine family stays driver-proven by
    # knn_ivf_recall_eval, which recomputes exact ground truth
    # in-plan, plus semdedup + the Gram matrix; LSH/kmeans are
    # rows-only with their oracled twins now ALSO in-window. Slot
    # reused for the duplicate-span REMOVAL operator new in r6.)
    "duplicate_span_cut",
    # (dedup_embedding_cosine_vectorized retired to local-oracle
    # coverage in r5 — the cosine family stays triple-proven by the
    # brute-force baseline, IVF recall eval and LSH rows; slot reused
    # for the VariantType semi-structured shred, a driver-unseen
    # family)
    "events_variant_shred",
    # (knn_ivf_recall_eval retired to local-oracle coverage in r7
    # batch 2 after three green rounds — ANN stays driver-proven by
    # the LSH md5 twin + Lloyd step + semdedup in-window; IVF keeps
    # its full local oracle. Slot reused for rendezvous-hash shard
    # assignment with measured resize churn, never driver-seen: the
    # stable-sharding primitive for pinning training data to
    # workers.)
    "rendezvous_shard_assign",
    # (knn_lsh_bucketed — rows-only by design — retired from the
    # window in r6 batch 2: its md5 verification twin
    # knn_lsh_bucketed_oracled is in-window with a FULL value oracle
    # and recomputes the same buckets/candidates/cosines; the xxhash64
    # fast path keeps its determinism check in tests. Slot reused for
    # the asymmetric containment-pairs dedup, never driver-seen — and
    # with the three rows-only slots converted, every window row now
    # carries a full value oracle. r8: doc_containment_pairs retired
    # after two green rounds — asymmetric containment stays locally
    # oracled and the postings machinery is driver-proven by the
    # minhash/recall rows; slot reused for event path trigrams, never
    # driver-seen: per-user ordered action paths sliced into n-grams
    # in-plan, the session-mining workhorse.)
    "event_path_trigrams",
    # (kmeans_embedding_clusters — rows-only by design — retired from
    # the window in r6 batch 2: kmeans_lloyd_step_oracled is in-window
    # value-checking the Lloyd update end-to-end. Slot reused for the
    # stream-stream LEFT OUTER interval join, never driver-seen: the
    # deferred-null-emission semantics no other streaming row
    # exercises.)
    "streaming_outer_interval_join",
    # (embedding_gram_matrix retired to local-oracle coverage in r7 —
    # the vector family stays driver-proven five ways in-window
    # (IVF recall eval, semdedup, LSH twin, Lloyd step, containment);
    # slot reused for the BPE train→apply fertility eval, never
    # driver-seen: the tokenizer-training family's apply side.)
    "bpe_apply_fertility",
    # (events_session_window retired to local-oracle coverage in r7
    # batch 2 — §2.9 event-time windowing stays driver-proven FOUR
    # ways in-window (streaming tumbling/interval/ttl/outer-interval),
    # and the gaps-and-islands shape keeps its native twin's local
    # oracle; slot reused for calendar gap-fill + forward-fill, never
    # driver-seen: the densify step every honest rolling statistic
    # needs.)
    "timeseries_gapfill_ffill",
    # (streaming_interval_join retired to local-oracle coverage in r8
    # after six green rounds — §2.9 stays driver-proven THREE ways
    # in-window (tumbling window, LEFT OUTER interval join — the
    # strictly harder semantics — and the stateful TTL throttle);
    # slot reused for the weekday seasonality profile, never
    # driver-seen: engine-neutral day-of-week arithmetic from epoch
    # days, the calendar-join every ops dashboard needs.)
    "weekday_seasonality_profile",
    # custom stateful per-key TTL throttle (exact recursive-CTE oracle)
    "streaming_ttl_throttle",
    # LLM-pipeline dedup flagships (+ CCNet-style cross-corpus
    # boilerplate segment removal)
    # (dedup_exact_keep_first retired to local-oracle coverage in r8
    # after seven green rounds — exact dedup stays driver-proven
    # inside corpus_clean_pipeline (same fingerprint + keep-min
    # stage) and dedup_survivorship_report; slot reused for the
    # audience-overlap Jaccard matrix, never driver-seen: pairwise
    # set similarity across event-type audiences via one self-joined
    # distinct frame.)
    "audience_overlap_jaccard",
    # (dedup_minhash_lsh — rows-only by design — retired from the
    # window in r6 batch 2: the md5 verification twin below carries
    # the identical MinHash+banding pipeline under a FULL value
    # oracle, and the xxhash64 fast path stays benched + determinism-
    # tested. Slot reused for content-defined-chunking dedup, never
    # driver-seen: chunk-granular position-independent recurrence,
    # the granularity between doc fingerprints and 8-token spans.)
    "cdc_chunk_dedup",
    # the md5 verification twin gives the flagship near-dup family a
    # FULL value oracle in the driver (the xxhash64 fast path stays
    # rows-only by design, outside the window since r6 batch 2);
    # replaces the approx_count_distinct rows-only slot (HLL accuracy
    # stays pinned locally)
    "dedup_minhash_lsh_oracled",
    # (boilerplate_segment_dedup retired to local-oracle coverage in
    # r8 after four green rounds — CCNet-style segment removal stays
    # driver-proven by duplicate_span_cut (the harder corpus-wide
    # excision) + cdc_chunk_dedup; slot reused for DEGREE-oriented
    # triangle counting, never driver-seen: the O(m^1.5) compact-
    # forward orientation cross-checked by the id-oriented oracle —
    # a cross-ALGORITHM value check in the driver.)
    "graph_triangle_count_degree",
    # (duplicate_span_report retired to local-oracle coverage in r7
    # batch 2 — the span family stays driver-proven by
    # duplicate_span_cut, which recomputes the same spans before
    # cutting them; slot reused for incremental aggregate state
    # MERGE, never driver-seen: the commutative-monoid contract that
    # keeps a 100 TB rollup fresh without rescanning history.)
    "incremental_agg_merge",
    # deterministic sampling: mixture_temperature_resample retired to
    # local-oracle coverage in r7 batch 2 after three green rounds —
    # the md5-predicate family keeps three local oracles; slot reused
    # for weighted A-ES sampling WITHOUT replacement, never
    # driver-seen: the u^(1/w) key made integer-exact as max of w
    # md5 tickets.
    "sample_weighted_maxhash",
    # (pagerank_trade_graph retired to local-oracle coverage in r7
    # batch 2 after four green rounds — the iterative graph family
    # stays driver-proven by lpa_communities + kcore_peel in-window;
    # slot reused for 2-hop neighborhood aggregation, never
    # driver-seen: the GNN message-passing primitive on the
    # co-shipment backbone.)
    "khop_neighbor_agg",
    # round-4 geo family: grid-bucketed KNN retired to local-oracle
    # coverage in r8 after four green rounds — the cell-candidate
    # pruning design stays driver-proven by the point-in-polygon
    # join, which reuses it (broadcast cell-coverage join) and adds
    # the ray-cast containment kernel the reference's promised geo
    # validation step needs (fa-etl.py:492), never driver-seen.
    "geo_point_in_polygon_join",
    # multimodal + corpus prep + TF-IDF (the wds round trip subsumes
    # the fake-decode stats row: custom tar-shard source pair + real
    # pixel decode + JSON metadata, all under one closed-form oracle;
    # multimodal_decode_stats keeps its full local oracle)
    "multimodal_wds_roundtrip",
    "corpus_clean_pipeline",
    "corpus_pack_contiguous",
    # (tfidf_top_terms retired to local-oracle coverage in r7 batch 2
    # after five green rounds — term weighting stays driver-proven by
    # bm25_topk_retrieval (same explode/df/broadcast shape plus
    # length normalization); slot reused for PMI collocations, never
    # driver-seen: corpus-level association mining on stably-rounded
    # log scores.)
    "pmi_collocations",
    # structured streaming flagship + incremental-ingest dedup
    # (foreachBatch with an exact batch-split-invariant SQL oracle)
    "streaming_tumbling_window",
    # (streaming_foreachbatch_ingest retired to local-oracle coverage
    # in r5 — streaming stays triple-proven by interval_join/
    # ttl_throttle/tumbling. heavy_hitters_cms retired in r7 after
    # three green rounds — the sketch keeps its local oracle; slot
    # reused for the per-user rolling 7-day exact median, never
    # driver-seen: the RANGE-frame composite Spark lacks natively.
    # r8: the window formulation retired to local-oracle coverage
    # after one green round — the BUCKETED scale twin (identical
    # oracle, (user, week)-sharded mapInPandas skiplist, bounded task
    # memory for years-long heavy hitters) takes the slot, so the
    # driver proves the plan that survives heavy-hitter users.)
    "rolling_7d_median_bucketed",
    # (quantile_bins_scalable retired to local-oracle coverage in r7
    # after four green rounds — the prefix-sum family stays
    # driver-proven by corpus_pack_contiguous; slot reused for the
    # MAD robust outlier scores, never driver-seen: two exact-median
    # passes broadcast back onto the fact scan.)
    "mad_outlier_zscores",
    # (pareto_cumulative_share retired to local-oracle coverage in r5 —
    # ordered-cumulative windows stay driver-proven by quantile_bins +
    # the prefix-sum family; slot count back to 50)
)


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
