"""Behavioral properties of the round-3 LLM-pipeline operators —
invariants that must hold at any scale, complementing the exact
DuckDB-oracle checks in test_oracle.py."""

from __future__ import annotations

from firstamerican_etl_spark.plans.registry import load_all

REGISTRY = load_all()


def test_contamination_bounds_and_exclusions(spark, sf_dir):
    rows = REGISTRY["contamination_ngram_overlap"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % 50 != 0  # benchmark slice never audited as training
        assert 0 <= r["n_matched"] <= r["n_shingles"]
        assert 0.0 <= r["contamination"] <= 1.0


def test_train_split_proportions(spark, sf_dir):
    rows = REGISTRY["train_split_assign"].spark(spark, sf_dir).collect()
    by_split: dict[str, int] = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    total = sum(by_split.values())
    # hash-range targets 230/13/13 out of 256 ≈ 89.8/5.1/5.1 — allow
    # generous sampling noise at small corpus sizes
    assert 0.80 <= by_split.get("train", 0) / total <= 0.97
    assert by_split.get("val", 0) > 0 and by_split.get("test", 0) > 0


def test_split_assignment_is_stable_under_recompute(spark, sf_dir):
    a = {
        (r["split"], r["lang"]): r["n_docs"]
        for r in REGISTRY["train_split_assign"].spark(spark, sf_dir).collect()
    }
    b = {
        (r["split"], r["lang"]): r["n_docs"]
        for r in REGISTRY["train_split_assign"].spark(spark, sf_dir).collect()
    }
    assert a == b


def test_length_buckets_cover_every_document(spark, sf_dir):
    from pyspark.sql import functions as F

    from firstamerican_etl_spark.sources.io import load_table

    rows = REGISTRY["length_bucket_batching"].spark(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["padding_waste"] >= 0
        assert r["n_batches"] >= 1
        # bucket must be large enough for every doc in it
        assert r["total_tokens"] + r["padding_waste"] == r["bucket_len"] * r["n_docs"]


def test_gopher_pass_subset_of_rows(spark, sf_dir):
    rows = REGISTRY["quality_gopher_rules"].spark(spark, sf_dir).collect()
    assert rows
    passed = [r for r in rows if r["gopher_pass"] == 1]
    for r in passed:
        assert 3 <= r["mean_word_len"] <= 10
        assert 10 <= r["n_words"] <= 5000
        assert r["n_stop_distinct"] >= 2


def test_leakage_safe_split_no_straddling_pairs(spark, sf_dir):
    """The defining invariant: no near-dup pair may straddle splits —
    both endpoints of every Jaccard >= 0.5 edge land in the SAME
    split (this is exactly what doc-hash splitting violates)."""
    from pyspark.sql import functions as F

    from firstamerican_etl_spark.plans.registry import load_all

    reg = load_all()
    splits = reg["leakage_safe_split_assign"].spark(spark, sf_dir)
    pairs = reg["ngram_jaccard_pairs"].spark(spark, sf_dir).select("doc_a", "doc_b")
    a = splits.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")
    )
    b = splits.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")
    )
    straddling = (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert straddling == 0
    # and the doc-hash baseline DOES straddle on this corpus (5 of the
    # 28 near-dup pairs at sf0.001) — the invariant above is not
    # vacuously true, the cluster-keyed split genuinely changes the
    # outcome. Deterministic data + md5, so an exact lower bound holds.
    from firstamerican_etl_spark.plans.trainplans import split_col

    doc_split = splits.select("doc_id").withColumn(
        "split", split_col(F.col("doc_id"))
    )
    a2 = doc_split.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    b2 = doc_split.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    doc_straddling = (
        pairs.join(a2, "doc_a").join(b2, "doc_b").filter(F.col("sa") != F.col("sb")).count()
    )
    assert doc_straddling > 0


def test_connected_components_long_chain_converges(spark):
    """A path graph of diameter 40 exceeds the old silent 15-round cap;
    BOTH physical strategies must reach the true fixed point: every
    node labeled 0."""
    from firstamerican_etl_spark.operators.graph import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    # driver union-find path (default routing for a 40-edge graph)
    labels = connected_components(pairs)
    assert {r["label"] for r in labels.collect()} == {0}
    # distributed propagation path, forced
    labels_dist = connected_components(pairs, driver_max_edges=0)
    assert {r["label"] for r in labels_dist.collect()} == {0}


def test_connected_components_gate_is_bounded_and_routes_distributed(
    spark, monkeypatch
):
    """VERDICT r12 #7: the auto-route gate must (a) send a graph past
    ``driver_max_edges`` down the DISTRIBUTED path — the driver
    union-find must never see it — and (b) decide that with a
    LIMIT-bounded probe (``limit(cap+1)`` collected in one fused
    decide+fetch job since r14), never a full count/collect over the
    edge set."""
    from firstamerican_etl_spark.operators import graph

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "doc_a long, doc_b long"
    )
    # patch the CONCRETE class (Spark 4: pyspark.sql.classic.DataFrame
    # overrides the pyspark.sql.DataFrame facade's methods)
    df_cls = type(pairs)
    limit_calls: list[int] = []
    orig_limit = df_cls.limit

    def spy_limit(self, n):
        limit_calls.append(n)
        return orig_limit(self, n)

    monkeypatch.setattr(df_cls, "limit", spy_limit)

    def forbidden(*_a, **_k):
        raise AssertionError(
            "driver union-find engaged on a past-threshold graph"
        )

    monkeypatch.setattr(graph, "_driver_union_find", forbidden)
    labels = graph.connected_components(pairs, driver_max_edges=5)
    assert {r["label"] for r in labels.collect()} == {0}
    assert 6 in limit_calls  # the probe asked for cap+1 rows, no more


def test_connected_components_path_parity(spark):
    """Driver union-find and distributed propagation must emit the
    IDENTICAL (node, label) set — the routing threshold may never be
    observable in results."""
    from firstamerican_etl_spark.operators.graph import connected_components

    # two components + a self-contained triangle + an isolated edge
    edges = [(1, 5), (5, 9), (9, 1), (20, 21), (21, 22), (30, 31)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    fast = {(r["node"], r["label"]) for r in connected_components(pairs).collect()}
    dist = {
        (r["node"], r["label"])
        for r in connected_components(pairs, driver_max_edges=0).collect()
    }
    assert fast == dist
    assert fast == {(1, 1), (5, 1), (9, 1), (20, 20), (21, 20), (22, 20),
                    (30, 30), (31, 30)}


def test_connected_components_raises_on_round_cap(spark):
    """strategy='minlabel' pins the r5 contract: exhausting max_rounds
    while labels still change must raise, not silently return
    unconverged labels (a silent wrong clustering would let near-dup
    pairs straddle train/test splits)."""
    import pytest as _pytest

    from firstamerican_etl_spark.operators.graph import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            pairs, max_rounds=3, driver_max_edges=0, strategy="minlabel"
        )


def test_connected_components_auto_falls_back_to_star(spark):
    """strategy='auto' (the default) must CONVERGE on a >50-diameter
    chain — min-label exhausts its cap and hands the same edges to
    star contraction (r6 verdict item #3: high-diameter graphs should
    cluster, not raise). 200-node chain, shuffled ids so the
    component min is interior, driver path disabled to force the
    distributed route."""
    from firstamerican_etl_spark.operators.graph import connected_components

    # chain over a permuted id space: node ids 7·i mod 997 are all
    # distinct, the min id sits mid-chain — label must still be the
    # component-global min, not a traversal artifact
    ids = [(7 * i) % 997 + 1 for i in range(200)]
    pairs = spark.createDataFrame(
        list(zip(ids, ids[1:])), "doc_a long, doc_b long"
    )
    labels = connected_components(pairs, driver_max_edges=0)
    got = {(r["node"], r["label"]) for r in labels.collect()}
    mn = min(ids)
    assert got == {(n, mn) for n in ids}


def test_star_contraction_parity_with_minlabel(spark):
    """All three strategies emit the identical (node, label) set on a
    dense multi-component fixture — the strategy knob may never be
    observable in results."""
    from firstamerican_etl_spark.operators.graph import connected_components

    edges = [
        (1, 5), (5, 9), (9, 1), (5, 17), (17, 9),   # dense blob
        (20, 21), (21, 22), (22, 20),                # triangle
        (30, 31),                                    # isolated edge
        (40, 41), (41, 42), (42, 43), (43, 44),      # short chain
        (50, 50),                                    # self-pair-ONLY node
        (40, 40),                                    # self-pair on a chain node
    ]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    want = {
        (r["node"], r["label"])
        for r in connected_components(pairs).collect()  # driver exact
    }
    star = {
        (r["node"], r["label"])
        for r in connected_components(pairs, strategy="star").collect()
    }
    ml = {
        (r["node"], r["label"])
        for r in connected_components(
            pairs, strategy="minlabel", driver_max_edges=0
        ).collect()
    }
    assert star == want
    assert ml == want


def test_duplicate_span_cut_leaves_no_cross_doc_window(spark, sf_dir):
    """After the cut pass, re-windowing the cleaned corpus must find no
    8-token window shared across documents (the arXiv:2107.06499
    invariant: exactly one canonical occurrence survives corpus-wide).
    Also: docs without duplicated spans pass through with n_cut=0 and
    whitespace-normalized text."""
    from pyspark.sql import functions as F

    from firstamerican_etl_spark.plans.dedupplans import (
        _SPAN_L,
        duplicate_span_cut,
    )

    cleaned = duplicate_span_cut(spark, sf_dir).localCheckpoint(eager=True)
    w = cleaned.select(
        "doc_id", F.split("text_clean", " ", -1).alias("words")
    ).filter(F.size("words") >= _SPAN_L)
    n = F.size("words")
    wins = w.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n - (_SPAN_L - 1)),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice(F.col("words"), i, _SPAN_L))
                ),
            )
        ).alias("h"),
    )
    crossdoc = (
        wins.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .count()
    )
    assert crossdoc == 0, f"{crossdoc} window hashes still span documents"
    # sanity: something was cut on this fixture, and uncut docs emerge
    # with n_cut == 0 and every word kept
    agg = cleaned.agg(
        F.sum("n_cut").alias("cut"),
        F.sum(F.when(F.col("n_cut") == 0, 1).otherwise(0)).alias("uncut_docs"),
    ).first()
    assert agg["cut"] > 0 and agg["uncut_docs"] > 0


def test_cdc_chunks_survive_an_insertion(spark, tmp_path):
    """THE content-defined-chunking property: inserting one word
    re-cuts only the insertion's neighborhood; every other chunk keeps
    its identity. Two docs — original and one-word-inserted — share
    all chunks outside a bounded window, which is exactly what
    cdc_chunk_dedup's cross-doc recurrence (n_docs > 1) reports.
    Fixed-size blocking would shift EVERY block after the insertion
    and share nothing."""
    from firstamerican_etl_spark.plans.registry import load_all

    words = [f"w{i % 37}x{(i * 7) % 11}" for i in range(200)]
    original = " ".join(words)
    inserted = " ".join(words[:100] + ["INSERTED"] + words[100:])
    docs = spark.createDataFrame(
        [
            (1, original, "en", "synthetic", len(original)),
            (2, inserted, "en", "synthetic", len(inserted)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path / "cdc_prop")
    import os

    os.makedirs(sf_dir, exist_ok=True)
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    from pyspark.sql import functions as F

    reg = load_all()
    shared = reg["cdc_chunk_dedup"].spark(spark, sf_dir)
    shared_words = shared.agg(F.sum("n_words")).first()[0]
    # 200 words total; the insertion can disturb at most the chunks
    # straddling it (expected chunk ≈ 16 words, boundary window 3) —
    # a 64-word allowance is ~4 expected chunks of slack
    assert shared_words is not None and shared_words >= 200 - 64, shared_words


def test_jaccard_df_cap_bounds_candidate_expansion(spark, tmp_path):
    """The CCNet df-cap's SCALE claim demonstrated by COUNT, not wall:
    on a corpus where every doc shares one boilerplate opening (a
    corpus-frequency shingle), the exact pair machinery expands the
    hot posting list into O(N²) candidate pairs, while the capped twin
    drops it before expansion — candidate work stays bounded by the
    rare-shingle lists. Also pins that genuinely similar pairs (made
    of RARE shingles) still surface through the capped path."""
    import pandas as pd

    from firstamerican_etl_spark.plans.dedupplans import (
        _JACCARD_DF_CAP,
        jaccard_df_capped_pairs,
        ngram_jaccard_pairs,
    )

    n = 60
    boiler = "all rights reserved contact admin for licensing details"
    rows = []
    for i in range(n):
        uniq = " ".join(f"w{i}x{j}" for j in range(8))
        rows.append((i, f"{boiler} {uniq}", "en"))
    # one genuine near-dup pair built from RARE shingles only
    rows.append((1000, "alpha beta gamma delta epsilon zeta eta theta iota", "en"))
    rows.append((1001, "alpha beta gamma delta epsilon zeta eta theta kappa", "en"))
    d = tmp_path / "hot"
    d.mkdir()
    pd.DataFrame(rows, columns=["doc_id", "text", "lang"]).to_parquet(
        d / "documents.parquet", index=False
    )
    sf = str(d)

    exact = {(r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(spark, sf).collect()}
    capped = {
        (r["doc_a"], r["doc_b"]) for r in jaccard_df_capped_pairs(spark, sf).collect()
    }
    # the rare-shingle near-dup pair survives the cap
    assert (1000, 1001) in capped and (1000, 1001) in exact
    # boilerplate-only pairs are below threshold either way here, but
    # the CANDIDATE counts differ by construction: measure the pair
    # expansion each physical plan performs.
    from firstamerican_etl_spark.plans.dedupplans import (
        exploded_word_hashes,
        shingle_hashes_col,
    )
    from pyspark.sql import functions as F

    from firstamerican_etl_spark.sources.io import load_table

    docs = (
        exploded_word_hashes(load_table(spark, sf, "documents"))
        .filter(F.size("wh") >= 5)
        .select(
            "doc_id",
            F.explode(F.array(F.array_distinct(shingle_hashes_col("wh")))).alias("sh"),
        )
        .select("doc_id", F.explode("sh").alias("shingle"))
    )
    df_counts = docs.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    expansion = (
        df_counts.filter(F.col("df") > 1)
        .agg(F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("p"))
        .first()["p"]
    )
    capped_expansion = (
        df_counts.filter((F.col("df") > 1) & (F.col("df") <= _JACCARD_DF_CAP))
        .agg(F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("p"))
        .first()["p"]
    )
    # hot shingles (df == 60+) dominate exact expansion quadratically;
    # the cap removes every one of them from the candidate stage
    assert expansion >= n * (n - 1) / 2  # ≥ C(60,2) from boilerplate alone
    assert capped_expansion <= 40  # only the rare near-dup shingles


def test_snapshot_diff_statuses_and_nullsafe_compare(spark):
    from firstamerican_etl_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "id long, txt string, n long",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "CHANGED", 30), (4, "now-set", 40), (5, "e", 50)],
        "id long, txt string, n long",
    )
    got = {
        r["id"]: (r["status"], r["txt_old"], r["txt_new"])
        for r in snapshot_diff(old, new, key=["id"]).collect()
    }
    assert got[1] == ("removed", "a", None)
    assert got[2] == ("unchanged", "b", "b")
    assert got[3] == ("changed", "c", "CHANGED")
    # NULL -> value is a change under the null-safe comparison
    assert got[4] == ("changed", None, "now-set")
    assert got[5] == ("added", None, "e")
    assert len(got) == 5


def test_snapshot_diff_explicit_compare_and_errors(spark):
    import pytest as _pytest

    from firstamerican_etl_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame([(1, "a", 10)], "id long, txt string, n long")
    new = spark.createDataFrame([(1, "zzz", 10)], "id long, txt string, n long")
    # restricting compare to n: the txt difference is invisible
    row = snapshot_diff(old, new, key=["id"], compare=["n"]).collect()[0]
    assert row["status"] == "unchanged" and row["n_old"] == row["n_new"] == 10
    with _pytest.raises(ValueError):
        snapshot_diff(old, new, key=[])
    with _pytest.raises(ValueError):
        snapshot_diff(old, new, key=["id"], compare=["absent"])
    # key/compare overlap must be a clear ValueError, not a deferred
    # ambiguous-column AnalysisException (ADVICE r10)
    with _pytest.raises(ValueError, match="both key and compare"):
        snapshot_diff(old, new, key=["id"], compare=["id", "n"])
    with _pytest.raises(ValueError, match="duplicate"):
        snapshot_diff(old, new, key=["id"], compare=["n", "n"])


def test_snapshot_diff_null_keys_never_match(spark):
    """A null-keyed row never joins; it must surface as removed/added
    for its own side, not be misclassified via key-null inference."""
    from firstamerican_etl_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame([(None, "x")], "id long, txt string")
    new = spark.createDataFrame([(None, "y")], "id long, txt string")
    rows = sorted(
        (r["status"], r["txt_old"], r["txt_new"])
        for r in snapshot_diff(old, new, key=["id"]).collect()
    )
    assert rows == [("added", None, "y"), ("removed", "x", None)]


def test_ks_statistic_matches_independent_numpy_ecdf(spark, sf_dir):
    """Third, independent implementation of the KS statistic: the
    classic two-float-ECDF scan in numpy over the raw rows. The
    registered query's integerized single-prefix-sum formulation
    (max|cum(a*nB - b*nA)|/(nA*nB)) and its DuckDB oracle share the
    algebra; this check shares NOTHING with either — it pins the
    algebraic identity itself, at full double precision, to the ppm
    quantization the query emits."""
    import numpy as np

    row = REGISTRY["drift_ks_two_sample"].spark(spark, sf_dir).collect()[0]

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "value")
        .where("event_type in ('click','error') and value is not null")
        .collect()
    )
    a = np.sort(np.array([r["value"] for r in ev if r["event_type"] == "click"]))
    b = np.sort(np.array([r["value"] for r in ev if r["event_type"] == "error"]))
    grid = np.unique(np.concatenate([a, b]))
    ecdf_a = np.searchsorted(a, grid, side="right") / len(a)
    ecdf_b = np.searchsorted(b, grid, side="right") / len(b)
    ks = float(np.max(np.abs(ecdf_a - ecdf_b)))

    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert row["n_values"] == len(grid)
    assert row["ks_ppm"] == int(np.floor(ks * 1_000_000 + 0.5))


def test_snapshot_diff_query_matches_independent_dict_diff(spark, sf_dir):
    """Independent reimplementation of corpus_snapshot_diff: plain
    python dicts over the raw rows, sharing neither the join nor the
    fingerprint algebra with the query/oracle pair (membership is by
    literal text comparison, no md5)."""
    got = {
        r["status"]: (r["n_docs"], r["chars_a"], r["chars_b"])
        for r in REGISTRY["corpus_snapshot_diff"].spark(spark, sf_dir).collect()
    }

    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "n_chars")
        .collect()
    )
    a = {r["doc_id"]: (r["text"], r["n_chars"]) for r in rows if r["doc_id"] % 10 != 9}
    b = {
        r["doc_id"]: (
            r["text"] + " v2" if r["doc_id"] % 17 == 3 else r["text"],
            r["n_chars"] + (3 if r["doc_id"] % 17 == 3 else 0),
        )
        for r in rows
        if r["doc_id"] % 13 != 5
    }
    expect: dict[str, list[int]] = {}
    for k in set(a) | set(b):
        if k not in a:
            st, ca, cb = "added", 0, b[k][1]
        elif k not in b:
            st, ca, cb = "removed", a[k][1], 0
        elif a[k][0] != b[k][0]:
            st, ca, cb = "changed", a[k][1], b[k][1]
        else:
            st, ca, cb = "unchanged", a[k][1], b[k][1]
        agg = expect.setdefault(st, [0, 0, 0])
        agg[0] += 1
        agg[1] += ca
        agg[2] += cb
    assert got == {k: tuple(v) for k, v in expect.items()}
