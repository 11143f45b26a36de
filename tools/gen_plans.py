"""Regenerate PLANS.md: AQE-final formatted plans for the
representative queries, with hand-maintained commentary on why each
plan is shaped the way it is. Run after plan-affecting changes:

    python tools/gen_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firstamerican_etl_spark.plans.registry import load_all
from firstamerican_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"

COMMENT = {
    "fa_flagship_merged": """The reference's unified merge (fa-etl.py:429-483) as one plan.
What to look for: TWO hash exchanges total (valhist agg, fused orders agg) — the
reference's three passes over the deed table are fused into one keyed aggregation
(max_by ranked-sale + conditional sums); the customer/nation/region dimension chain
broadcasts; the final SaleAmt null-reject lets Catalyst run EliminateOuterJoin.""",
    "q6_revenue_forecast": """Pushdown proof: the date/discount/quantity conjuncts appear in
PushedFilters on the parquet scan, and ReadSchema is pruned to the 4 referenced
columns — the scan does the filtering, the query is one map-side aggregate.""",
    "q21_waiting_orders": """The dual correlated EXISTS/NOT-EXISTS decorrelated into ONE per-order
rollup that carries the at-fault supplier identity and R-row count with it:
lineitem is scanned exactly ONCE (the literal correlated plan scans it three
times); supplier/nation broadcast; everything after the rollup is ~|orders| rows.""",
    "tfidf_top_terms": """Two aggregates over the exploded term table; the |vocabulary|-sized
doc-frequency side comes back via BroadcastHashJoin — the tf table is never
shuffled a second time. Ranking runs on the one partitioning the agg produced.""",
    "sample_hash_deterministic": """A reproducible sample must be a pure filter: no Exchange
anywhere in the plan. md5(key) < threshold evaluates scan-side; at 100 TB the
sample costs one scan, not a repartition.""",
    "dedup_minhash_lsh": """MinHash+LSH banding entirely in JVM expressions (no Python UDF):
shingle → 32 minhashes via transform() → band structs → explode → groupBy band
bucket. The only shuffles are the band-bucket aggregation and the pair dedup.""",
    "events_multi_resolution_rollup": """One Expand + one aggregation computes hour AND day rollups:
grouping-sets replaces per-resolution re-scans with a single shuffle.""",
    "q8_market_share": """8-way snowflake: every dimension (part, nations, region, customer-side chain,
supplier) broadcasts; lineitem⋈orders is the only real shuffle. The market-share
ratio is two conditional sums in ONE aggregate pass — never two jobs for a ratio.""",
    "corpus_clean_pipeline": """Dedup-survivor selection + quality filters + deterministic sample fused into
one plan: a single content-hash aggregate feeds a left-semi join, both filters
evaluate scan-side — one pass over the corpus, not three.""",
    "levenshtein_similar_parts": """Blocked entity matching: the block key turns O(n²) all-pairs edit distance
into an equi-join over distinct names; Levenshtein evaluates post-join on the
(small) within-block candidate set.""",
    "corpus_pack_contiguous": """Sequence packing WITHOUT the single-task global window: the running token
offset comes from the distributed prefix-sum recipe — tokenized docs staged to
temp parquet ONCE, shard ids assigned by a literal-cutpoint CASE chain (pure
function of row values: the totals pass and the cumsum pass can never disagree),
per-shard Arrow cumsum + driver prefix-summed base offsets. Look for the CASE
comparison feeding hashpartitioning(_pid) and NO WindowExec anywhere; bin
aggregation is an ordinary hash aggregate.""",
    "pareto_cumulative_share": """Top-N-first Pareto: TakeOrderedAndProject ships each shard's local top-100
(never the full per-customer aggregate through one task); the grand total is a
one-row aggregate broadcast onto the survivors; the ranking/running-sum window
runs over exactly 100 rows.""",
    "quantile_bins_scalable": """The scalable contrast to ntile: cutpoints come from the distributed-rank
recipe (driver collects exactly 3 boundary values), bin assignment is a pure
scan-side CASE against broadcast literals, then one hash aggregate — no global
ORDER BY window anywhere.""",
    "gap_fill_interpolate": """Date-spine interpolation: global bounds are a ONE-ROW aggregate broadcast-
crossed onto the distinct priorities (no unpartitioned min/max window); both
IGNORE NULLS fill directions share a single (priority, day) exchange + sort.""",
    "contamination_ngram_overlap": """Decontamination at corpus scale: the held-out set's distinct shingle
hashes come back via BroadcastHashJoin — the training corpus streams through a
map-side probe and is never shuffled by shingle; per-doc overlap is then one
keyed aggregate.""",
    "salted_skew_agg": """Two-phase skew-resistant aggregation: phase 1 groups on (key, salt) —
look for TWO HashAggregate+Exchange pairs — so a hot key spreads over 16
reducers before the ≤16-partials-per-key merge. Result-identical to the plain
group-by (that is the registered oracle).""",
    "bm25_topk_retrieval": """BM25 ranked retrieval: the query-term IN-filter evaluates directly on the
exploded term column (Generate → Filter before anything widens), so only
matching terms reach the score aggregate; the |query|-row document-frequency
side and the one-row (n_docs, avgdl) stats both come back via
BroadcastExchange; the final top-k is TakeOrderedAndProject — per-partition
top-20 merged at the driver, never a global sort.""",
    "hybrid_rrf_fusion": """Reciprocal-rank fusion of the BM25 leg and a cosine leg: each leg ends in
TakeOrderedAndProject (local top-k, no global sort), so the fusion full-outer
join runs over two ≤20-row frames. The cosine leg broadcasts the single query
vector and streams the corpus through one map stage. Ranks are 1 + count-of-better
self-joins over the bounded legs (broadcast nested loop) — no global-ORDER-BY
WindowExec anywhere.""",
    "geo_knn_grid_bucketed": """Grid-bucketed geo-KNN (the scale path): the 27 probe rows (query points ×
3×3 cell neighborhood) come back via BroadcastHashJoin on (cell_y, cell_x), so
the point set streams through ONE map-side probe — candidate cost follows cell
occupancy, never the point count; haversine evaluates post-join on candidates
only, and the per-query top-5 is a bounded window over the tiny candidate set.""",
    "unigram_logprob_score": """Perplexity-style quality scoring: the term→count unigram model
(|vocabulary| rows) and the one-row corpus total come back via
BroadcastExchange onto the exploded term table — the corpus shuffles exactly
once, on doc_id, for the per-doc mean. Everything numeric rides the
stably-rounded quantized-int64 path, so the score is engine- and
partitioning-exact despite the ln().""",
    "pagerank_trade_graph": """Unrolled iterative PageRank. What to look for: the iteration
joins consume the STAGED src-bucketed edge table — a handful of bucketed scans
and NO exchange on the edge side (only the |nodes|-sized rank frame shuffles
per round, plus the final aggregate). Without staging, Catalyst plans K
copies of the whole edge-build subtree: 28 parquet scans, 0 ReusedExchange —
the measured motivation for the bucketed-stage design. Ranks are scaled
int64, so every distributed sum is exact under any partitioning (bit-tight
oracle for an iterative algorithm).""",
    "boilerplate_segment_dedup": """CCNet-style segment dedup. The corpus is shuffled only inside
the segment-frequency aggregate (map-side partials collapse each partition to
its distinct segment hashes first); the frequency-filtered boilerplate set is
staged to parquet and broadcast back ONLY under a measured size cap
(spark.firstamerican.boilerplate.broadcastCapBytes, default 16 MiB) — over the
cap (a web corpus) the mark-back degrades to a shuffle hash join instead of
OOMing executors. Per-doc report is a second map-side-combined aggregate.""",
    "semdedup_cluster_prune": """SemDeDup semantic dedup (arXiv:2303.09540). Broadcast-centroid
cell assignment (IVF pattern) is staged once; the returned plan is ONE
exchange — groupBy(cell) into an exact int64 BLAS pair kernel that scores all
Σ|cell|² intra-cell pairs per task with a single integer matmul. No pair join,
no cartesian product, no float accumulation (25·dot² ≥ 4·‖a‖²‖b‖² on
quantized ints matches the oracle bit-for-bit).""",
    "dsir_importance_weights": """DSIR importance weighting (arXiv:2302.03169). One corpus pass:
per-(doc, bucket) hashed-bigram counts are staged; both 256-row distribution
frames derive from the staged counts and the int64-quantized log-ratio frame
re-joins via BroadcastExchange. The per-doc score is an exact integer dot
product, so any partitioning gives bit-identical weights.""",
    "bootstrap_mean_ci_poisson": """Poisson bootstrap as columns, not rows: all 32 replicates ride
ONE HashAggregate pass (2+2B exact int64 partial sums, map-side combined) —
look for a single Exchange hashpartitioning and no Generate node (an
exploded-replicate formulation would shuffle 32× the table). The per-row
replicate draw is 8 md5 calls compared directly against hex-string
inverse-CDF thresholds (no per-row hex→int conversion).""",
    "sample_weighted_maxhash": """Weighted sampling without replacement that costs a scan: the
A-ES key (max of w md5 tickets — exactly the u^(1/w) ranking, integer-exact)
is a pure projection, so the plan is Scan → Project → TakeOrderedAndProject.
No Exchange anywhere; at 100 TB the sample costs one scan plus K rows per
partition — the minimum possible.""",
    "timeseries_gapfill_ffill": """Calendar densify + forward fill: the fact table collapses
FIRST (daily aggregate, map-side combined), the per-series calendar explodes
from the collapsed frame's min/max bounds (metadata next to the facts), and
the fill is ONE Window node partitioned by (type, series) — never an
unpartitioned frame. Everything after the first aggregate is
collapsed-series-sized regardless of input scale.""",
    "rfm_user_segments": """RFM quartile segmentation at scale: the fact table collapses to
the per-user frame once (localCheckpointed — three rank probes re-read it),
each dimension's exact cutpoints come from the rank-targeted recipe (shard
counts + ONE partitioned window filtered to 3 ordinals — no global ORDER BY),
and segment assignment is a broadcast-literal comparison feeding one
|segments|-row aggregate.""",
    "geo_point_in_polygon_join": """Point-in-polygon spatial join (the fa-etl.py:492 validation
step). What to look for: the point scan is never shuffled — candidates come from
a BroadcastHashJoin against the (cell -> tract) coverage dim on the point's grid
cell (one equi-key probe per point, no nested loop anywhere), the exact ray-cast
runs via a second BroadcastHashJoin on tract_id, and the only exchange is the
(point, tract) crossing-parity aggregate whose <=6-edge fan-out collapses in the
map-side partial. Both dims are Arrow LocalTableScans (sources/io.local_df).""",
    "jaccard_df_capped_pairs": """The CCNet hot-shingle guard measured: identical
postings machinery as ngram_jaccard_pairs, but posting lists longer than the df
cap are filtered BEFORE the in-array pair expansion — the plan shows the size
predicate on the aggregated postings, so the quadratic expansion is bounded at
cap^2 per shingle and total candidate work at sum(min(df,cap)^2).""",
    "dedup_image_dhash_distinct": """Image perceptual near-dup, the scale shape
(the all-pairs row measured 11.1x/decade under mass duplication — SCALING.md).
What to look for: ONE narrow mapInPandas stage (decode + dHash) feeding a hash
aggregate on the four 16-bit band values (map-side partial: identical prints
collapse in-task), staged once; everything after is relational over DISTINCT
fingerprints — band explode, equi-join on (band_id, value), bit_count verify —
so candidate and output volume scale with content diversity, not corpus size.
The shuffle carries 4 ints per distinct print, never pixels.""",
    "url_normalize_dedup": """URL canonicalization dedup: every normalization
clause (case, www, default port, utm strip, param sort, fragment, trailing
slash) is a scan-side regexp/split/sort expression inside one WholeStageCodegen
span — no UDF, no join; the only exchange is the final hash aggregate on the
canonical string, with a map-side partial so surface variants of one page
collapse before the shuffle.""",
}

HEADER = [
    "# PLANS — physical-plan review of representative queries",
    "",
    "Generated by `python tools/gen_plans.py` (re-run after plan-affecting changes).",
    "Each section: why the plan is shaped the way it is, then the AQE-final",
    "`explain(formatted)` output at sf0.1. Regression tests in",
    "`tests/test_plan_shapes.py` pin the load-bearing properties (shuffle counts,",
    "broadcasts, pushdown, JVM-only paths).",
    "",
]


def main() -> None:
    spark = get_spark(app_name="plansdoc")
    registry = load_all()
    out = list(HEADER)
    for name, comment in COMMENT.items():
        df = registry[name].spark(spark, SF_DIR)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        tree = plan.split("\n\n")[0]  # the operator tree; detail sections omitted
        out += [f"## {name}", "", comment, "", "```", tree, "```", ""]
    dest = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(dest, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {dest}")
    spark.stop()


if __name__ == "__main__":
    main()
