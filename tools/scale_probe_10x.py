"""Measure the NEXT 10× step: derive an "sf1"-scale dataset from
sf0.1 (10 deterministic key-shifted copies of the fact/corpus tables;
dimension tables shared) into a reuse-cached /tmp dir, then time the
scale-critical operators at sf0.1 vs the derived sf1 and append the
ratio table to SCALING.md.

Why this exists: at sf0.1 most queries sit on Spark's fixed per-query
floor, so the 100×-span table in SCALING.md mostly proves the floor.
One more decade puts the data term in view for the heavy operators —
the ratio that actually answers "would this survive another 10×?".

Key shifts preserve join relationships (l_orderkey tracks o_orderkey;
o_custkey is reused, so each customer simply has 10× orders — the
realistic direction of growth) and determinism (pure arithmetic on
ids; md5-hash sampling predicates stay well-distributed).

    python tools/scale_probe_10x.py          # appends to SCALING.md
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from firstamerican_etl_spark.plans.registry import load_all
from firstamerican_etl_spark.session import get_spark
from firstamerican_etl_spark.sources.io import staging_tag

SRC = "/root/testdata/sf0.1"
COPIES = 10
_SHIFT = 10_000_000

#: (table, shifted id columns) — fact/corpus tables replicated with
#: key shifts; everything else is shared via copy.
SCALED = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],  # tracks the orders shift
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id"],
}

PROBE = [
    "fa_flagship_merged",
    "q1_pricing_summary",
    "q21_waiting_orders",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "boilerplate_segment_dedup",
    "corpus_pack_contiguous",
    "global_row_index_scalable",
    "quantile_bins_scalable",
    "pagerank_trade_graph",
    "tfidf_top_terms",
    "bm25_topk_retrieval",
    "contamination_ngram_overlap",
    "cosine_topk_bruteforce",
    "semdedup_cluster_prune",
    "semdedup_cluster_prune_sqrtk",
    "dsir_importance_weights",
    "duplicate_span_report",
    "heavy_hitters_cms",
    "jaccard_prefix_filter_pairs",
    "ngram_jaccard_pairs",
    "minhash_lsh_recall_eval",
    "leakage_safe_split_assign",
    # r6 additions: the sweep twin, the span REMEDIATION pass, and the
    # remaining rotated-in window newcomers with data-sized plans
    "semdedup_threshold_sweep",
    "duplicate_span_cut",
    "dedup_survivorship_report",
    "corpus_drift_psi",
    "vocab_oov_rate",
    # r6 second batch: new dedup granularities, the backbone triangle
    # pass, analytics/stats newcomers with data-sized plans
    "doc_containment_pairs",
    "cdc_chunk_dedup",
    "graph_triangle_count",
    "kcore_peel_unrolled",
    "lpa_communities_unrolled",
    "markov_event_transitions",
    "cohort_retention_matrix",
    "pearson_correlation_matrix",
    "salted_skew_join",
    "zipf_rank_frequency",
    "token_budget_sample",
    # r6 third batch: robust stats + entropy gate + the two-phase
    # distinct recipe, all data-sized
    "rolling_7d_median_value",
    "mad_outlier_zscores",
    "char_entropy_quality",
    "count_distinct_two_phase",
    "matryoshka_truncation_recall",
    "bpe_train_unrolled",
    # r7: the skiplist rolling-median twin (vs the 2.4× window row
    # above it), degree-oriented triangles at both backbone caps, and
    # the LSH-bucketed multimodal kNN
    "rolling_7d_median_bucketed",
    "graph_triangle_count_degree",
    "graph_triangle_degree_50k",
    "multimodal_knn_bucketed",
    # r7 batch 2: data-sized newcomers (bootstrap = 64 partial sums on
    # one exchange; gapfill = calendar explode + ffill window; rfm =
    # per-user collapse + 3 rank probes; trigram = per-user window +
    # count; weighted sampling = pure projection + TakeOrdered)
    "bootstrap_mean_ci_poisson",
    "timeseries_gapfill_ffill",
    "rfm_user_segments",
    "event_path_trigrams",
    "sample_weighted_maxhash",
    "winsorized_robust_mean",
    "pmi_collocations",
    # r8 additions with real data terms
    "jaccard_df_capped_pairs",
    "geo_point_in_polygon_join",
    "semdedup_threshold_sweep",
    "epoch_shuffle_shards",
    "ndcg_at_k_eval",
    # r9 additions (dedup_image_dhash_pairs is the contrast row —
    # measured 11.1x at the third decade, kept for the anti-pattern
    # table; the distinct twin is the production path)
    "dedup_image_dhash_pairs",
    "dedup_image_dhash_distinct",
    "url_normalize_dedup",
    "domain_registrable_profile",
]

#: End-to-end pipelines (not registry entries): (label, callable(spark,
#: sf_dir) -> seconds). The fa pipeline is parameterized by scale
#: factor (it generates its own raw zips), the corpus builds by table
#: dir — both time ONLY the pipeline, not input generation.
def _e2e_probes():
    import bench

    def fa(spark, d):
        sf = 1.0 if "sf1" in os.path.basename(d) else 0.1
        return bench._fa_pipeline_e2e(spark, sf, partition_staging_by_fips=True)

    def corpus_full(spark, d):
        return bench._corpus_build_e2e(spark, d)

    def corpus_delta(spark, d):
        return bench._corpus_build_delta(spark, d)

    def ann(spark, d):
        return bench._ann_pipeline_e2e(spark, d)

    return [
        ("fa_pipeline_e2e", fa),
        ("corpus_build_e2e", corpus_full),
        ("corpus_build_delta", corpus_delta),
        ("ann_index_pipeline_e2e", ann),
    ]


def build_sf1(spark) -> str:
    # cache key = source content tag + derivation version (v2: per-copy
    # content perturbation so clones are not mutual near-duplicates)
    out = os.path.join("/tmp", f"fa_sf1_derived_v2_{staging_tag(SRC, 'lineitem')}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    tables = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    for t in tables:
        src = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        if t in SCALED:
            cols = [c for c in SCALED[t] if c in src.columns]
            parts = []
            for k in range(COPIES):
                d = src
                for c in cols:
                    d = d.withColumn(c, F.col(c) + F.lit(k * _SHIFT))
                # Perturb CONTENT per copy, not just keys: verbatim
                # clones would be mutual near-duplicates, inflating
                # dedup/ANN candidate counts ~45 pairs per group — the
                # probe would read super-linear for data-construction
                # reasons, the exact false flag it exists to catch.
                if t == "documents" and k > 0:
                    # suffix every word with the copy index: copies
                    # share ZERO shingles with the original, so MinHash/
                    # SimHash/Jaccard see no cross-copy similarity;
                    # within-copy duplicate relations are preserved
                    # (same rewrite applied to all rows of the copy)
                    # and per-doc word counts are unchanged.
                    d = d.withColumn(
                        "text",
                        F.array_join(
                            F.transform(
                                F.split(F.col("text"), " "),
                                lambda w: F.concat(w, F.lit(f"_{k}")),
                            ),
                            " ",
                        ),
                    )
                if t == "embeddings" and k > 0:
                    # rotate coordinates by k positions per copy: norms
                    # and within-copy geometry are EXACTLY preserved
                    # (it's a permutation), value ranges unchanged (no
                    # overflow risk in the int-quantized kernels), and
                    # cross-copy cosine decorrelates to ~0 for random
                    # vectors — so cosine/LSH/IVF candidate counts
                    # scale with data, not with copy multiplicity
                    d = d.withColumn(
                        "embedding",
                        F.concat(
                            F.slice(F.col("embedding"), k + 1, 64 - k),
                            F.slice(F.col("embedding"), 1, k),
                        ),
                    )
                parts.append(d)
            big = parts[0]
            for p in parts[1:]:
                big = big.unionByName(p)
            big.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
        else:
            src.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
    open(os.path.join(out, "_DONE"), "w").close()
    return out


def _force(df) -> None:
    cols = [F.col(c) for c in df.columns]
    df.select(F.sum(F.xxhash64(*[c.cast("string") for c in cols])).alias("h")).collect()


def main() -> None:
    spark = get_spark(app_name="scale_probe_10x")
    registry = load_all()
    sf1 = build_sf1(spark)
    print(f"# derived sf1 at {sf1}", file=sys.stderr)

    # warm every probe at the small SF so codegen/classloading is paid
    for name in PROBE:
        _force(registry[name].spark(spark, "/root/testdata/sf0.001"))

    def best_of(n, name, d):
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            _force(registry[name].spark(spark, d))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    rows = []
    for name in PROBE:
        # min-of-2, like bench.py: a single sample absorbs whatever GC/
        # JIT/host noise hits that second; the min is the plan cost
        t_small = best_of(2, name, SRC)
        t_big = best_of(2, name, sf1)
        rows.append((name, t_small, t_big))
        print(f"# {name}: sf0.1 {t_small:.2f}s sf1 {t_big:.2f}s "
              f"x{t_big / max(t_small, 1e-9):.1f}", file=sys.stderr)

    # e2e pipelines: min-of-2 like the registry rows (each sample
    # regenerates its inputs untimed, so the resume skip never fires)
    for name, fn in _e2e_probes():
        t_small = min(fn(spark, SRC) for _ in range(2))
        t_big = min(fn(spark, sf1) for _ in range(2))
        rows.append((name, t_small, t_big))
        print(f"# {name}: sf0.1 {t_small:.2f}s sf1 {t_big:.2f}s "
              f"x{t_big / max(t_small, 1e-9):.1f}", file=sys.stderr)

    lines = [
        "",
        "## The next decade: sf0.1 → derived sf1 (10× facts, measured)",
        "",
        "Derived sf1 = 10 key-shifted copies of the sf0.1 fact/corpus",
        "tables (join relationships preserved, dimensions shared;",
        "document text and embeddings are perturbed per copy so clones",
        "are NOT mutual near-duplicates — dedup/ANN ratios measure",
        "data growth, not construction artifacts) — see",
        "`tools/scale_probe_10x.py`. At this size the data term clears",
        "Spark's fixed per-query floor for the heavy operators, so the",
        "ratio is a real slope, not floor noise. 10× data on the same",
        "32 cores: linear-work plans should land well under 10× wall",
        "(the floor amortizes); super-10× ratios would flag a",
        "super-linear stage (the thing the plan shapes are designed to",
        "prevent).",
        "",
        "| query | sf0.1 s | sf1 s | × per 10× data |",
        "|---|---|---|---|",
    ]
    for name, a, b in rows:
        lines.append(f"| {name} | {a:.2f} | {b:.2f} | {b / max(a, 1e-9):.1f}× |")
    lines.append("")
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    with open(dest, "a") as f:
        f.write("\n".join(lines))
    print(f"appended to {dest}")
    spark.stop()


if __name__ == "__main__":
    main()
