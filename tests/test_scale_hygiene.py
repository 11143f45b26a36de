"""Repo-wide scale-hygiene audit: EVERY registered query's physical
plan is machine-checked for the anti-patterns that kill 100 TB runs,
so a new operator can't silently ship one — the per-query pins in
test_plan_shapes.py cover the flagships; this closes the registry.

Checked per plan:
- no CartesianProduct (an un-broadcast cross join; BroadcastNestedLoop
  over a tiny side is fine and common for scalar-bound broadcasts);
- no BatchEvalPython (row-at-a-time Python — never acceptable);
- Arrow-batched Python (ArrowEvalPython / MapInPandas / InPandas
  variants) only in the explicitly-pandas operators;
- no UNPARTITIONED window over unbounded input (single-task collapse),
  except the three documented bounded/contrast cases.
"""

from __future__ import annotations

import pytest

from firstamerican_etl_spark.plans.registry import load_all

REGISTRY = load_all()

#: Unpartitioned windows that are deliberate and bounded:
#: ntile is the documented non-scaling CONTRAST to quantile_bins_scalable;
#: share_of_total runs over the ≤|nations| aggregate;
#: pareto's window input is LIMIT-100-bounded.
UNPARTITIONED_WINDOW_OK = {
    "ntile_price_quartiles",
    "share_of_total_window",
    "pareto_cumulative_share",
}

#: Operators whose algorithm is an Arrow-batched block computation with
#: no Catalyst builtin equivalent (BLAS blocks, stateful streaming,
#: distributed prefix-sum local passes, spark.ml).
ARROW_PYTHON_OK = {
    "multimodal_decode_stats",
    "multimodal_resize_chain",
    "multimodal_frame_sample",
    "multimodal_featurize_knn",
    "multimodal_knn_bucketed",  # same featurizer, LSH-bucketed candidates
    "multimodal_ppm_pixel_decode",  # pure-python netpbm raster decode
    "multimodal_binaryfile_ingest",  # same netpbm decode over binaryFile rows
    "multimodal_wds_roundtrip",  # netpbm decode over wds tar-shard rows
    # gradient-asset synth + netpbm decode + integer dHash: the ONE
    # narrow Python stage; everything after the 4-int fingerprint is
    # relational (banded equi-join + bit_count verify)
    "dedup_image_dhash_pairs",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_vectorized",
    "semdedup_cluster_prune",  # per-cell int64 BLAS pair kernel (exact)
    "semdedup_cluster_prune_sqrtk",  # same kernel, sqrt(N) cells
    "semdedup_threshold_sweep",  # same kernel, blocked, 4-τ counts (r6: was a 27×/10× interpreted pair join)
    "streaming_sessionize_stateful",
    "streaming_custom_source_agg",
    "kmeans_embedding_clusters",
    "global_row_index_scalable",
    "global_running_sum_scalable",
    "drift_ks_two_sample",  # ECDF cumsum rides the same prefix-sum recipe
    "corpus_pack_contiguous",
    "quantile_bins_scalable",
    "weighted_median_udaf",
    "udtf_tokenize_lateral",  # Arrow-optimized UDTF (useArrow=True)
    "pq_adc_topk",  # numpy block encode (integer grid, exact)
    "embedding_gram_matrix",  # numpy partial-matmul blocks (integer grid, exact)
    "corpus_byte_histogram",  # mapInArrow buffer-level numpy bincount
    # C-skiplist sliding median per (user, week-bucket) — the exact
    # rolling-median state machine Catalyst has no operator for
    "rolling_7d_median_bucketed",
    # r15: SimHash 64-lane bit votes as one vectorized numpy pass
    # (unpackbits + add.reduceat) — the r14 65-aggregate JVM form was
    # the slowest non-e2e bench row and every JVM reformulation
    # measured flat (OPTIMIZATION_r15.md); bit-identical by test
    "dedup_simhash",
    "dedup_simhash_pairs",  # consumes the fingerprint pass above
    # r15: MinHash signatures via the numpy permutation-min path
    # (bit-identical to the JVM aggregates — parity pinned by
    # test_multimodal/test_ansi_parity; −24% on the LSH pipeline)
    "dedup_minhash_lsh",
}


def _initial_plan(df) -> str:
    full = df._jdf.queryExecution().executedPlan().toString()
    return full.split("== Initial Plan ==")[0]


def _unpartitioned_window_lines(plan: str) -> list[str]:
    """A physical Window node prints `Window [exprs], [partition],
    [order]`, omitting empty groups. Two groups therefore mean either
    no-partition (second group is an order spec, carries ASC/DESC) or
    no-order (second group is the partition keys) — only the former is
    the single-task collapse."""
    hits = []
    for line in plan.splitlines():
        stripped = line.strip().lstrip("+-: ").strip()
        if not stripped.startswith("Window "):
            continue
        groups = stripped.split("], [")
        if len(groups) == 2 and ("ASC" in groups[1] or "DESC" in groups[1]):
            hits.append(stripped[:160])
    return hits


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_plan_hygiene(spark, sf_dir, name):
    df = REGISTRY[name].spark(spark, sf_dir)
    plan = _initial_plan(df)
    assert "CartesianProduct" not in plan, f"{name}: un-broadcast cross join"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in ARROW_PYTHON_OK:
        for marker in ("ArrowEvalPython", "MapInPandas", "InPandas", "MapInArrow"):
            assert marker not in plan, f"{name}: unexpected Python stage ({marker})"
    if name not in UNPARTITIONED_WINDOW_OK:
        bad = _unpartitioned_window_lines(plan)
        assert not bad, f"{name}: unpartitioned window(s): {bad}"


def test_no_session_global_conf_mutation_in_query_modules():
    """No registered query may flip a session-global conf
    (spark.conf.set) — a set/restore around a plan is not thread-safe
    when a driver runs queries concurrently; use plan-scoped hints
    (df.hint("merge"), F.broadcast) instead. The one sanctioned
    mutation lives in pipeline/run.py's bucket_staging path
    (requireAllClusterKeysForCoPartition), a pipeline entry point, not
    a registered query."""
    import glob as _glob
    import os as _os

    root = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "firstamerican_etl_spark",
    )
    offenders = []
    for sub in ("plans", "operators", "functions", "streaming"):
        for path in _glob.glob(_os.path.join(root, sub, "*.py")):
            src = open(path).read()
            for i, line in enumerate(src.splitlines(), 1):
                stripped = line.split("#", 1)[0]
                if "conf.set(" in stripped:
                    offenders.append(f"{path}:{i}: {line.strip()}")
    assert offenders == [], (
        "session-global conf mutation inside query modules:\n"
        + "\n".join(offenders)
    )
