"""Similarity search over the ``embeddings`` table (array<float>
column): brute-force cosine top-k as the exact baseline, plus an
LSH-bucketed variant as the scale path.

All vector math is built-in array expressions (``zip_with`` +
``aggregate`` fold) — JVM-side, no Python per row. Arrays are cast to
double before arithmetic so the fold matches the oracle's
double-precision result bit-for-bit after rounding.

Scale design: brute force is O(Q·N) — fine when Q (query set) is
small and broadcast; the LSH variant buckets by random-hyperplane
signs so candidate generation is an equi-join on bucket keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from firstamerican_etl_spark.functions.stable import stable_round
from firstamerican_etl_spark.operators.relational import top_k_per_group
from firstamerican_etl_spark.plans.registry import register
from firstamerican_etl_spark.sources.io import load_table, local_df, staging_tag


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a sequential left fold — deterministic order, so
    bit-stable across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


@register(
    "embedding_norms",
    oracle="""
SELECT vec_id, label,
       len(embedding) AS dim,
       floor(sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
             x -> x * x), 'sum')) * 10000 + 0.5) / 10000 AS l2
FROM embeddings
""",
    tags=("vector", "norm"),
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector plumbing check: dimension + L2 norm per embedding."""
    e = load_table(spark, sf_dir, "embeddings")
    v = _as_double(F.col("embedding"))
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        stable_round(l2_norm(v), 4).alias("l2"),
    )


@register(
    "cosine_topk_bruteforce",
    oracle="""
WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
sims AS (
  SELECT q_id, c_id,
         floor(list_dot_product(qv, cv) /
               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
               * 10000 + 0.5) / 10000 AS cos_sim
  FROM q CROSS JOIN c
  WHERE q_id <> c_id
)
SELECT q_id, c_id, cos_sim
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY q_id ORDER BY cos_sim DESC, c_id
  ) AS rn
  FROM sims
) WHERE rn <= 3
""",
    tags=("vector", "knn", "bruteforce"),
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: top-3 cosine neighbors for each query vector
    (vec_id < 5). The small query side is broadcast, so the corpus
    streams through one map stage — no corpus shuffle; top-k per query
    via window. Deterministic tie-break on candidate id."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), _as_double(F.col("embedding")).alias("qv")
    )
    c = e.select(
        F.col("vec_id").alias("c_id"), _as_double(F.col("embedding")).alias("cv")
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            stable_round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos_sim"),
        )
    )
    from firstamerican_etl_spark.operators.relational import top_k_per_group

    return top_k_per_group(
        sims,
        partition_by=["q_id"],
        order_by=[F.col("cos_sim").desc(), F.col("c_id")],
        k=3,
        rank_col="__rn",
    ).select("q_id", "c_id", "cos_sim")


@register(
    "knn_lsh_bucketed",
    oracle=None,  # random-hyperplane LSH buckets aren't ANSI-SQL-expressible
    tags=("vector", "knn", "lsh"),
)
def knn_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN: random-hyperplane (sign) LSH.

    8 deterministic pseudo-random hyperplanes (seeded per-index via
    xxhash64 of (dim_index, plane)) → 8-bit bucket signature; vectors
    meet only within a bucket. Candidate generation = equi-join on
    bucket, so cost is Σ bucket² instead of N². Returns per-bucket
    occupancy plus intra-bucket top-1 neighbor for vec_id < 5.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = _as_double(F.col("embedding"))

    def plane_proj(vec: Column, plane: int) -> Column:
        # pseudo-random ±1 weights per (position, plane), derived from
        # xxhash64 — deterministic across runs and partitionings
        weighted = F.zip_with(
            vec,
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda x, i: x
            * F.when(F.xxhash64(i, F.lit(plane)).bitwiseAND(F.lit(1)) == 1, 1.0).otherwise(-1.0),
        )
        return F.aggregate(weighted, F.lit(0.0), lambda acc, x: acc + x)

    sig = sum(
        (F.when(plane_proj(v, p) > 0, F.lit(1 << p)).otherwise(F.lit(0)) for p in range(1, 8)),
        F.when(plane_proj(v, 0) > 0, F.lit(1)).otherwise(F.lit(0)),
    )
    bucketed = e.select("vec_id", v.alias("vd"), sig.alias("bucket"))
    a = bucketed.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("vd").alias("qv"), "bucket"
    )
    b = bucketed.select(
        F.col("vec_id").alias("c_id"), F.col("vd").alias("cv"), "bucket"
    )
    sims = (
        a.join(b, on="bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            "bucket",
            stable_round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos_sim"),
        )
    )
    from firstamerican_etl_spark.operators.relational import top_k_per_group

    return top_k_per_group(
        sims,
        partition_by=["q_id"],
        order_by=[F.col("cos_sim").desc(), F.col("c_id")],
        k=1,
        rank_col="__rn",
    ).select("q_id", "c_id", "bucket", "cos_sim")


@register(
    "dedup_embedding_cosine_vectorized",
    oracle="""
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       floor(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE) * 10000 + 0.5) / 10000 AS cosine
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE floor(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE) * 10000 + 0.5) / 10000 >= 0.5
""",
    tags=("dedup", "embedding", "cosine", "pandas-udf", "vectorized", "contrast"),
)
def dedup_embedding_cosine_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs, BLAS path: same semantics (and the
    same oracle) as extplans.dedup_embedding_cosine, but the per-block
    pair scoring runs as one numpy matmul per label block inside
    applyInPandas instead of a self-join with interpreted per-element
    array folds.

    **CONTRAST ROW (r10)**, same verdict as its zip_with sibling: the
    `label` blocking key has FIXED cardinality, so the per-block
    G @ G.T is (N/|labels|)^2 — a faster kernel on a quadratic plan is
    still quadratic (the 10x probe measured the sibling at
    17.0x/decade; BLAS only moves the constant). Worse here, each label
    block must FIT IN ONE TASK, so at 100 TB a block is an OOM, not
    just slow. Kept as the documented Arrow-kernel trade anchor;
    excluded from the driver window and headline bench. Production
    paths: ``semdedup_cluster_prune_sqrtk`` (sqrt(N) cells keep blocks
    task-sized by construction), ``multimodal_knn_bucketed`` /
    ``knn_lsh_bucketed`` for bucketed candidates."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("vec_id_a", T.LongType()),
            T.StructField("vec_id_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        g = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(g, axis=1)
        sims = (g @ g.T) / np.outer(norms, norms)
        iu, ju = np.triu_indices(len(ids), k=1)
        # canonical (smaller id, larger id) orientation, like the join
        ia, ib = ids[iu], ids[ju]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        # the repo's stable_round form, floor(x*1e4+0.5)/1e4 — the
        # IDENTICAL expression the JVM twin and both oracles now use
        # (np.round is half-to-even and engine round-on-double is the
        # shortest-string divergence class; either could flip keep at
        # the 0.5 threshold against the other engine)
        s = sims[iu, ju]
        cos = np.floor(s * 1e4 + 0.5) / 1e4
        keep = cos >= 0.5
        return pd.DataFrame(
            {"vec_id_a": lo[keep], "vec_id_b": hi[keep], "cosine": cos[keep]}
        )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    return e.groupBy("label").applyInPandas(block_pairs, schema=out_schema)


@register(
    "knn_ivf_cells",
    oracle="""
WITH cents AS (
  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 8
),
assigned AS (  -- nearest centroid per vector (L2, ties -> lowest cent_id)
  SELECT vec_id, label, embedding, cent_id AS cell FROM (
    SELECT v.vec_id, v.label, v.embedding, c.cent_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY round(CAST(list_distance(v.embedding, c.cvec) AS DOUBLE), 4), c.cent_id
           ) AS rn
    FROM embeddings v CROSS JOIN cents c
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS probe_id, embedding AS pvec, cell
  FROM assigned WHERE vec_id >= 8 AND vec_id < 18
)
SELECT probe_id, neighbor_id, cell, cosine FROM (
  SELECT p.probe_id, a.vec_id AS neighbor_id, p.cell,
         round(CAST(list_cosine_similarity(p.pvec, a.embedding) AS DOUBLE), 4) AS cosine,
         row_number() OVER (
           PARTITION BY p.probe_id
           ORDER BY round(CAST(list_cosine_similarity(p.pvec, a.embedding) AS DOUBLE), 4) DESC,
                    a.vec_id
         ) AS rn
  FROM probes p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.probe_id
) WHERE rn <= 3
""",
    tags=("knn", "ivf", "ann", "vector"),
)
def knn_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate nearest neighbor: a coarse quantizer
    (8 deterministic centroids — the first 8 vectors; production would
    train k-means) assigns every vector to its nearest-L2 cell; a query
    searches ONLY its own cell (nprobe=1) with exact cosine re-ranking.

    Scale shape: assignment is a broadcast cross join vs k centroids
    (k rows — free) + min-per-vector; the search join keys on cell, so
    its shuffle moves each vector once into its cell bucket — the
    inverted-file layout. Candidate count per probe drops from N to
    N/k; recall is traded via nprobe, never by scanning less than a
    full cell. Distances rounded before comparison so the argmin/top-k
    tie-breaks are engine-stable."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cvec")
    )
    l2 = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(F.col("v"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        4,
    )
    assigned = top_k_per_group(
        e.crossJoin(F.broadcast(cents)).withColumn("dist", l2),
        partition_by=["vec_id"],
        order_by=[F.col("dist"), F.col("cent_id")],
        k=1,
        rank_col="__rn",
    ).select("vec_id", F.col("cent_id").alias("cell"), "v")

    probes = assigned.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 18)).select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("pvec"), "cell"
    )
    cands = assigned.select(F.col("vec_id").alias("neighbor_id"), "cell", "v")
    dot = F.aggregate(
        F.zip_with("pvec", "v", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    nrm = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))  # noqa: E731
    scored = (
        probes.join(cands, on="cell")
        .filter(F.col("neighbor_id") != F.col("probe_id"))
        .withColumn("cosine", F.round(dot / (nrm(F.col("pvec")) * nrm(F.col("v"))), 4))
    )
    return top_k_per_group(
        scored,
        partition_by=["probe_id"],
        order_by=[F.col("cosine").desc(), F.col("neighbor_id")],
        k=3,
        rank_col="__rn",
    ).select("probe_id", "neighbor_id", "cell", "cosine")


@register(
    "kmeans_embedding_clusters",
    oracle=None,  # Lloyd iterations over floats are engine-specific;
    # determinism (fixed seed + partitioning) is the contract, checked
    # by the rows-only double-run test.
    tags=("vector", "ml", "kmeans", "iterative"),
)
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded spark.ml KMeans over the embedding column: cluster
    cardinalities + mean intra-cluster cosine-to-centroid — the
    coarse-quantization step an IVF index trains (knn_ivf_cells uses
    fixed grid cells; this is the learned-centroid upgrade). KMeans in
    Spark is the canonical iterative-MLlib workload: each Lloyd round
    is one aggregate over the points with broadcast centroids — the
    same shuffle structure our connected-components loop uses."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = load_table(spark, sf_dir, "embeddings")
    feats = emb.select(
        "vec_id",
        array_to_vector(_as_double(F.col("embedding"))).alias("features"),
    )
    if feats.limit(1).count() == 0:
        # spark.ml KMeans.fit throws on an empty dataset; an empty
        # corpus has no clusters — return the empty report with the
        # stable output schema (same recipe as the quantile/codebook
        # collect guards).
        return spark.createDataFrame(
            [], "cluster_id int, n_vecs bigint, avg_cos_to_centroid double"
        )
    model = KMeans(k=8, seed=1, maxIter=10, tol=1e-6).fit(feats)
    pred = model.transform(feats).select(
        "vec_id", F.col("prediction").alias("cluster_id"),
        vector_to_array("features").alias("v"),
    )
    centers = local_df(
        spark,
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster_id int, c array<double>",
    )
    j = pred.join(F.broadcast(centers), "cluster_id")
    cos = cosine(F.col("v"), F.col("c"))
    return (
        j.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            stable_round(F.avg(cos), 3).alias("avg_cos_to_centroid"),
        )
    )


_PQ_M, _PQ_D, _PQ_K = 8, 8, 16  # 64-dim → 8 subspaces × 8 dims, 16 codes
_PQ_QUERIES = (0, 100, 200)


@register(
    "pq_adc_topk",
    oracle=f"""
WITH qz AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qe
  FROM embeddings
),
ms AS (SELECT unnest(range({_PQ_M})) AS m),
cb AS (SELECT vec_id AS k, qe FROM qz WHERE vec_id < {_PQ_K}),
dists AS (
  SELECT c.vec_id, ms.m, cb.k,
         list_sum(list_transform(range({_PQ_D}), j ->
           (c.qe[ms.m * {_PQ_D} + j + 1] - cb.qe[ms.m * {_PQ_D} + j + 1])
         * (c.qe[ms.m * {_PQ_D} + j + 1] - cb.qe[ms.m * {_PQ_D} + j + 1]))) AS d
  FROM qz c CROSS JOIN ms CROSS JOIN cb
),
codes AS (
  SELECT vec_id, m, k AS code
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d, k) AS rn
        FROM dists)
  WHERE rn = 1
),
qd AS (
  SELECT q_id, m, k, d FROM dists d0(q_id, m, k, d)
  WHERE q_id IN {_PQ_QUERIES}
),
adc AS (
  SELECT qd.q_id, codes.vec_id, CAST(sum(qd.d) AS BIGINT) AS adc_dist
  FROM codes JOIN qd ON qd.m = codes.m AND qd.k = codes.code
  GROUP BY 1, 2
)
SELECT q_id, vec_id AS c_id, adc_dist
FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc_dist, vec_id) AS rn
      FROM adc)
WHERE rn <= 5
""",
    tags=("vector", "knn", "pq", "adc"),
)
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (Jégou et al., "Product Quantization for Nearest Neighbor Search"):
    64-dim vectors split into M=8 subspaces; each subvector is encoded
    as the id of its nearest of K=16 codebook centroids (here the
    deterministic first-16 vectors, standing in for trained k-means
    centroids); a query precomputes an M×K distance table and scores
    any compressed vector with M table lookups instead of 64 float ops
    — 8 bytes per vector instead of 256 at serving time.

    Scale shape: the codebook and the query distance tables are
    driver-collected (K·dim and |Q|·M·K values — metadata-sized) and
    broadcast; ENCODING is an Arrow-batched numpy block kernel
    (mapInPandas — the (n, M, K, D) distance tensor is one broadcasted
    subtract-square-sum, exactly the BLAS-block pattern of
    dedup_embedding_cosine_vectorized; the equivalent 1024-term
    Catalyst expression tree falls out of whole-stage codegen and runs
    ~10x slower interpreted). ADC scoring stays JVM: per-corpus-row it
    is M table lookups against the broadcast literal tables, then one
    per-query top-k window — the only shuffle. Everything runs on an
    integer grid (floor(x·1000+½)) so distances are exact int64 sums —
    argmin and ranking are bit-reproducible across numpy, Catalyst, and
    the DuckDB oracle, which re-derives the codes relationally."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def _quantize_py(vec) -> list[int]:
        import math

        return [int(math.floor(float(x) * 1000.0 + 0.5)) for x in vec]

    small = {
        int(r["vec_id"]): _quantize_py(r["embedding"])
        for r in e.filter(
            (F.col("vec_id") < _PQ_K) | F.col("vec_id").isin(list(_PQ_QUERIES))
        ).collect()
    }
    if any(k not in small for k in range(_PQ_K)) or any(
        q not in small for q in _PQ_QUERIES
    ):  # corpus too small for a codebook / queries absent: empty report
        return e.select(
            F.lit(0).cast("long").alias("q_id"),
            F.lit(0).cast("long").alias("c_id"),
            F.lit(0).cast("long").alias("adc_dist"),
        ).limit(0)
    cb = [small[k] for k in range(_PQ_K)]

    def encode_batches(batches):
        import numpy as np
        import pandas as pd

        # (K, M, D) int64 codebook, broadcast once per task
        cbt = np.asarray(cb, dtype=np.int64).reshape(_PQ_K, _PQ_M, _PQ_D)
        for pdf in batches:
            if not len(pdf):
                continue
            emb = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            q = np.floor(emb * 1000.0 + 0.5).astype(np.int64)
            sub = q.reshape(len(pdf), 1, _PQ_M, _PQ_D)  # (n, 1, M, D)
            d = ((sub - cbt[None, :, :, :]) ** 2).sum(axis=3)  # (n, K, M)
            codes = d.argmin(axis=1).astype(np.int32)  # first-min ties
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "codes": [c.tolist() for c in codes],
                }
            )

    enc = e.mapInPandas(encode_batches, schema="vec_id long, codes array<int>")

    def table_for(qv: list[int]) -> list[list[int]]:
        return [
            [
                sum(
                    (qv[m * _PQ_D + j] - cb[k][m * _PQ_D + j]) ** 2
                    for j in range(_PQ_D)
                )
                for k in range(_PQ_K)
            ]
            for m in range(_PQ_M)
        ]

    queries = local_df(
        spark,
        [(q, table_for(small[q])) for q in _PQ_QUERIES],
        "q_id bigint, dt array<array<bigint>>",
    )
    adc = None
    for m in range(_PQ_M):
        term = F.element_at(
            F.element_at("dt", m + 1), F.element_at("codes", m + 1) + 1
        )
        adc = term if adc is None else adc + term
    scored = enc.crossJoin(F.broadcast(queries)).select(
        "q_id", F.col("vec_id").alias("c_id"), adc.alias("adc_dist")
    )
    return top_k_per_group(
        scored, partition_by=["q_id"], order_by=[F.col("adc_dist"), F.col("c_id")], k=5
    ).select("q_id", "c_id", "adc_dist")


@register(
    "knn_ivf_recall_eval",
    oracle="""
WITH cents AS (
  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 8
),
assigned AS (
  SELECT vec_id, embedding, cent_id AS cell FROM (
    SELECT v.vec_id, v.embedding, c.cent_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY round(CAST(list_distance(v.embedding, c.cvec) AS DOUBLE), 4), c.cent_id
           ) AS rn
    FROM embeddings v CROSS JOIN cents c
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS probe_id, embedding AS pvec, cell
  FROM assigned WHERE vec_id >= 8 AND vec_id < 18
),
ivf AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT p.probe_id, a.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY p.probe_id
             ORDER BY round(CAST(list_cosine_similarity(p.pvec, a.embedding) AS DOUBLE), 4) DESC,
                      a.vec_id
           ) AS rn
    FROM probes p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.probe_id
  ) WHERE rn <= 3
),
exact AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT p.probe_id, a.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY p.probe_id
             ORDER BY round(CAST(list_cosine_similarity(p.pvec, a.embedding) AS DOUBLE), 4) DESC,
                      a.vec_id
           ) AS rn
    FROM probes p CROSS JOIN assigned a
    WHERE a.vec_id <> p.probe_id
  ) WHERE rn <= 3
)
SELECT e.probe_id,
       count(*) AS n_exact,
       count(i.neighbor_id) AS n_hits,
       floor(CAST(count(i.neighbor_id) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS recall_at_3
FROM exact e
LEFT JOIN ivf i ON e.probe_id = i.probe_id AND e.neighbor_id = i.neighbor_id
GROUP BY 1
""",
    tags=("knn", "ivf", "ann", "recall", "evaluation"),
)
def knn_ivf_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN QUALITY gate: recall@3 of the IVF nprobe=1 search against
    the exact brute-force ground truth, per probe — the measurement
    that turns "approximate" from a hope into a number (the eval every
    production ANN deployment runs before trading recall for nprobe).

    Both sides share the rounded-cosine + id tie-break discipline, so
    the hit set is engine-stable and the oracle exact. Scale shape:
    ground truth is the expensive side (full scan per probe) — run it
    over a fixed probe SAMPLE, as here; the IVF side reuses the
    inverted-file layout. The eval join is |probes|·k rows — metadata."""
    from firstamerican_etl_spark.operators.relational import top_k_per_group

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cvec")
    )
    l2 = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(F.col("v"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        4,
    )
    # localCheckpoint (r14): FOUR consumers read this frame (probes,
    # the IVF candidate join's both-use, and the exact brute-force
    # side) and Catalyst replans the crossJoin+top-1-window subtree
    # per branch — the before-plan shows the assignment computed 4×
    # (8 parquet scans, plans/r14/knn_ivf_recall_eval_before.txt).
    # One materialization serves all branches (9→5 Exchanges). At
    # production scale the assignment is STAGED (ann_build writes it
    # cell-partitioned); this is the in-query analogue.
    assigned = top_k_per_group(
        e.crossJoin(F.broadcast(cents)).select(
            "vec_id", "v", "cent_id", l2.alias("d")
        ),
        partition_by=["vec_id"],
        order_by=[F.col("d"), F.col("cent_id")],
        k=1,
        rank_col="__rn",
    ).select(
        "vec_id", "v", F.col("cent_id").alias("cell")
    ).localCheckpoint(eager=True)
    probes = assigned.filter(
        (F.col("vec_id") >= 8) & (F.col("vec_id") < 18)
    ).select(
        F.col("vec_id").alias("probe_id"),
        F.col("v").alias("pv"),
        F.col("cell").alias("pcell"),
    )
    cos4 = F.round(cosine(F.col("pv"), F.col("v")), 4)

    def top3(cands):
        return top_k_per_group(
            cands.filter(F.col("vec_id") != F.col("probe_id")).select(
                "probe_id", F.col("vec_id").alias("neighbor_id"), cos4.alias("s")
            ),
            partition_by=["probe_id"],
            order_by=[F.col("s").desc(), F.col("neighbor_id")],
            k=3,
            rank_col="__rn",
        ).select("probe_id", "neighbor_id")

    ivf = top3(assigned.join(F.broadcast(probes), assigned.cell == probes.pcell))
    exact = top3(assigned.crossJoin(F.broadcast(probes)))
    hit = F.col("i_neighbor").isNotNull().cast("long")
    return (
        exact.join(
            ivf.select(
                F.col("probe_id").alias("i_probe"),
                F.col("neighbor_id").alias("i_neighbor"),
            ),
            (F.col("probe_id") == F.col("i_probe"))
            & (F.col("neighbor_id") == F.col("i_neighbor")),
            "left",
        )
        .groupBy("probe_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(hit).alias("n_hits"),
            (
                F.floor(
                    F.sum(hit).cast("double") / F.count(F.lit(1)) * F.lit(10000.0)
                    + F.lit(0.5)
                )
                / F.lit(10000.0)
            ).alias("recall_at_3"),
        )
    )


_GRAM_SCALE = 10_000  # element quantization grid (1e-4)
_GRAM_DIM = 64


@register(
    "embedding_gram_matrix",
    oracle=f"""
WITH q AS (
  SELECT list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {_GRAM_SCALE} + 0.5) AS BIGINT)) AS v
  FROM embeddings
),
idx AS (SELECT unnest(generate_series(1, {_GRAM_DIM})) AS i),
jdx AS (SELECT unnest(generate_series(1, {_GRAM_DIM})) AS j)
SELECT i, j, CAST(sum(v[i] * v[j]) AS BIGINT) AS gram_int
FROM q, idx, jdx
WHERE j >= i
GROUP BY 1, 2
""",
    tags=("vector", "linalg", "gram", "pca"),
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix XᵀX over the embedding column — the
    d×d statistic PCA / whitening / ridge regression start from, and
    the canonical distributed-linear-algebra shape: per-partition
    numpy matmul produces a d×d PARTIAL (metadata-sized — d²=4096
    values regardless of row count), partials sum under a shuffle of
    |partitions|·d² rows, the corpus itself never moves. The naive
    relational plan (explode i × explode j = N·d² rows) is the
    100 TB faceplant this shape replaces — the oracle takes exactly
    that route, which is fine at oracle scale.

    Elements are quantized to a 1e-4 grid as int64 BEFORE multiplying
    (functions/stable.py discipline): every partial and the final sum
    are exact integer arithmetic — associative, partitioning-proof,
    bit-identical to the oracle, and within int64 headroom up to
    ~10⁹ rows at this grid (|x|≤1 ⇒ per-term ≤ {_GRAM_SCALE}²).
    Upper triangle only (the matrix is symmetric)."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings").select("embedding")

    def gram_partials(batches):
        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].values).astype("float64")
            xq = np.floor(x * _GRAM_SCALE + 0.5).astype("int64")
            g = xq.T @ xq
            acc = g if acc is None else acc + g
        if acc is not None:
            iu = np.triu_indices(acc.shape[0])
            yield pd.DataFrame(
                {
                    "i": (iu[0] + 1).astype("int32"),
                    "j": (iu[1] + 1).astype("int32"),
                    "p": acc[iu].astype("int64"),
                }
            )

    partials = e.mapInPandas(gram_partials, schema="i int, j int, p long")
    return partials.groupBy("i", "j").agg(F.sum("p").alias("gram_int"))


@register(
    "embedding_pca_project",
    oracle=None,  # eigendecomposition is not ANSI-SQL-expressible;
    # orthogonality/variance accuracy pinned in tests/test_approx_accuracy.py
    tags=("vector", "linalg", "pca", "projection"),
)
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA end-to-end on the distributed-linalg stack: the exact
    integer Gram matrix (see ``embedding_gram_matrix``) collects as
    d²-row metadata, the driver eigendecomposes the 64×64 matrix
    (numpy ``eigh`` — micro work), and every embedding projects onto
    the top-2 principal directions as a pure JVM expression (zip_with
    dot product against the broadcast literal eigenvectors). The
    corpus is touched exactly twice, map-only both times: once for
    Gram partials, once for projection — no shuffle of vectors, ever.

    Eigenvector sign is fixed by convention (largest-|component|
    positive) so the projection is reproducible; the Gram is exact
    integer arithmetic, so the eigenbasis is identical under any
    partitioning. Non-SQL-expressible (rows-only check); variance
    ordering and orthogonality are pinned in
    tests/test_approx_accuracy.py."""
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    gram_rows = embedding_gram_matrix(spark, sf_dir).collect()
    if not gram_rows:
        return e.select(
            "vec_id", F.lit(0.0).alias("pc1"), F.lit(0.0).alias("pc2")
        ).limit(0)
    d = _GRAM_DIM
    g = np.zeros((d, d))
    for r in gram_rows:
        g[r["i"] - 1, r["j"] - 1] = r["gram_int"]
        g[r["j"] - 1, r["i"] - 1] = r["gram_int"]
    g /= float(_GRAM_SCALE) ** 2
    w, vecs = np.linalg.eigh(g)
    comps = []
    for k in (1, 2):
        vec = vecs[:, -k]
        if abs(vec[np.argmax(np.abs(vec))]) != vec[np.argmax(np.abs(vec))]:
            vec = -vec  # sign convention: largest-|component| positive
        comps.append(vec)

    def project(vec: list[float]):
        lit = F.array(*[F.lit(float(x)) for x in vec])
        return F.aggregate(
            F.zip_with(F.col("v"), lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return e.select(
        "vec_id",
        stable_round(project(list(comps[0])), 6).alias("pc1"),
        stable_round(project(list(comps[1])), 6).alias("pc2"),
    )


def _lsh_weights(planes: int = 8, dim: int = 64) -> list[list[float]]:
    """Deterministic ±1 hyperplane weights, seeded from md5 of
    '(pos):(plane)' — computed ONCE at plan-build time and inlined as
    literals on BOTH the Spark and the oracle side, so the twin's
    buckets are identical by construction (the weights are
    data-independent constants; no RNG, no engine hash involved)."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{i}:{p}".encode()).hexdigest()[:8], 16) & 1
            else -1.0
            for i in range(dim)
        ]
        for p in range(planes)
    ]


def _lsh_oracle() -> str:
    ws = _lsh_weights()
    projs = []
    for p, w in enumerate(ws):
        chain = " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * {w[i]:.1f}" for i in range(64)
        )
        projs.append(f"CASE WHEN ({chain}) > 0 THEN {1 << p} ELSE 0 END")
    bucket = " + ".join(projs)
    return f"""
WITH b AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
),
sims AS (
  SELECT a.vec_id AS q_id, c.vec_id AS c_id, a.bucket,
         round(CAST(list_cosine_similarity(a.embedding, c.embedding) AS DOUBLE), 4) AS cos_sim
  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
  WHERE a.vec_id < 5
)
SELECT q_id, c_id, bucket, cos_sim FROM (
  SELECT *, row_number() OVER (
    PARTITION BY q_id ORDER BY cos_sim DESC, c_id
  ) AS rn FROM sims
) WHERE rn <= 1
"""


@register(
    "knn_lsh_bucketed_oracled",
    oracle=_lsh_oracle(),
    tags=("vector", "knn", "lsh", "verification-twin"),
)
def knn_lsh_bucketed_oracled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH VERIFICATION TWIN (same pattern as the MinHash and
    SimHash twins): identical 8-hyperplane bucket + intra-bucket
    top-1 search as ``knn_lsh_bucketed``, with the ±1 hyperplane
    weights precomputed as md5-seeded literals inlined on both sides —
    bucket assignments, candidate sets and cosines all value-check
    against DuckDB. Projections are sequential left folds (bit-stable
    addition order); the production path derives weights JVM-side from
    xxhash64 instead of carrying d×planes literals in the plan."""
    e = load_table(spark, sf_dir, "embeddings")
    v = _as_double(F.col("embedding"))
    ws = _lsh_weights()
    bucket = None
    for p, w in enumerate(ws):
        lit_w = F.array(*[F.lit(x) for x in w])
        proj = F.aggregate(
            F.zip_with(v, lit_w, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        term = F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    bucketed = e.select("vec_id", v.alias("vd"), bucket.alias("bucket"))
    a = bucketed.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("vd").alias("qv"), "bucket"
    )
    c = bucketed.select(
        F.col("vec_id").alias("c_id"), F.col("vd").alias("cv"), "bucket"
    )
    sims = (
        a.join(c, on="bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            "bucket",
            stable_round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos_sim"),
        )
    )
    from firstamerican_etl_spark.operators.relational import top_k_per_group

    return top_k_per_group(
        sims,
        partition_by=["q_id"],
        order_by=[F.col("cos_sim").desc(), F.col("c_id")],
        k=1,
        rank_col="__rn",
    ).select("q_id", "c_id", "bucket", "cos_sim")


@register(
    "kmeans_lloyd_step_oracled",
    oracle="""
WITH cents AS (
  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings WHERE vec_id < 8
),
assigned AS (
  SELECT vec_id, embedding, cent_id AS cell FROM (
    SELECT v.vec_id, v.embedding, c.cent_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY round(CAST(list_distance(v.embedding, c.cvec) AS DOUBLE), 4), c.cent_id
           ) AS rn
    FROM embeddings v CROSS JOIN cents c
  ) WHERE rn = 1
),
dims AS (
  SELECT cell, d AS dim,
         CAST(floor(CAST(embedding[d] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS q
  FROM assigned, (SELECT unnest(generate_series(1, 64)) AS d) g
)
SELECT cell, dim,
       count(*) AS n_members,
       CAST(sum(q) AS DOUBLE) / count(*) / 1000000 AS centroid
FROM dims GROUP BY 1, 2
""",
    tags=("vector", "kmeans", "lloyd", "verification-twin"),
)
def kmeans_lloyd_step_oracled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration, fully value-oracled (the k-means companion
    to the hashing verification twins): assign every vector to its
    nearest of 8 fixed coarse centroids (the ``knn_ivf_cells``
    assignment, rounded-distance + id tie-break), then recompute each
    cell's centroid as the per-dimension MEAN on the quantized-int64
    grid — sums of exact integers divided by exact counts, so the new
    centroids are bit-identical to DuckDB under any partitioning (a
    raw double mean would be summation-order-dependent). The full
    training loop (``kmeans_embedding_clusters``, spark.ml, stays
    rows-only) is this step iterated with re-broadcast centroids; one
    verified step proves the update arithmetic.

    Scale shape: assignment is a broadcast cross join vs k centroids;
    the update is one (cell, dim)-keyed aggregate — k·d output rows,
    map-side combined, corpus shuffled once."""
    from firstamerican_etl_spark.operators.relational import top_k_per_group

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cvec")
    )
    l2 = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(F.col("v"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        4,
    )
    assigned = top_k_per_group(
        e.crossJoin(F.broadcast(cents)).select(
            "vec_id", "v", "cent_id", l2.alias("d")
        ),
        partition_by=["vec_id"],
        order_by=[F.col("d"), F.col("cent_id")],
        k=1,
        rank_col="__rn",
    ).select("v", F.col("cent_id").alias("cell"))
    dims = assigned.select(
        "cell",
        F.posexplode(
            F.transform(
                "v",
                lambda x: F.floor(x * F.lit(1000000.0) + F.lit(0.5)).cast("long"),
            )
        ).alias("dim0", "q"),
    ).select("cell", (F.col("dim0") + 1).alias("dim"), "q")
    return dims.groupBy("cell", "dim").agg(
        F.count(F.lit(1)).alias("n_members"),
        (F.sum("q").cast("double") / F.count(F.lit(1)) / F.lit(1000000.0)).alias(
            "centroid"
        ),
    )


_SEMDEDUP_K = 8  # coarse cells (deterministic centroids: vec_id < K)
_SEMDEDUP_TAU = (2, 5)  # cosine threshold τ = 2/5 as an exact rational


def _semdedup_oracle(k_sql: str) -> str:
    """SemDeDup oracle parameterized on the centroid-count expression:
    the fixed-K twin inlines a literal, the sqrt-K scale twin derives
    K from the data in SQL (subquery against the same CTE), so BOTH
    variants carry full value oracles."""
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q
  FROM embeddings
),
cents AS (SELECT vec_id AS cent_id, v AS cvec FROM e WHERE vec_id < {k_sql}),
assigned AS (
  SELECT vec_id, q, cell FROM (
    SELECT e.vec_id, e.q, c.cent_id AS cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(CAST(list_distance(e.v, c.cvec) AS DOUBLE), 4), c.cent_id
           ) AS rn
    FROM e CROSS JOIN cents c
  ) WHERE rn = 1
),
n2 AS (
  SELECT vec_id, cell, q,
         CAST(list_aggregate(list_transform(q, x -> x * x), 'sum') AS BIGINT) AS nn
  FROM assigned
),
dups AS (
  SELECT b.vec_id, min(a.vec_id) AS dup_of
  FROM n2 a JOIN n2 b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE CAST(list_dot_product(a.q, b.q) AS BIGINT) > 0
    AND {_SEMDEDUP_TAU[1] ** 2} * CAST(list_dot_product(a.q, b.q) AS BIGINT)
                               * CAST(list_dot_product(a.q, b.q) AS BIGINT)
        >= {_SEMDEDUP_TAU[0] ** 2} * a.nn * b.nn
  GROUP BY 1
)
SELECT n2.vec_id, n2.cell, d.dup_of,
       CAST(CASE WHEN d.dup_of IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup
FROM n2 LEFT JOIN dups d ON n2.vec_id = d.vec_id
"""


_SEMDEDUP_ORACLE = _semdedup_oracle(str(_SEMDEDUP_K))
#: K = max(8, isqrt(N)//2) derived IN SQL from the same embeddings CTE
#: the rest of the oracle reads — data-dependent K is still one static
#: SQL string (VERDICT r7 task 2).
_SEMDEDUP_SQRTK_ORACLE = _semdedup_oracle(
    f"(SELECT greatest({_SEMDEDUP_K}, "
    "CAST(floor(sqrt(count(*))) AS BIGINT) // 2) FROM e)"
)


def _semdedup(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by cluster-then-prune — coarse-cluster the embedding
    space, then within each cluster mark every vector whose cosine
    similarity to a LOWER-id cluster-mate exceeds τ as a semantic
    duplicate (the lower id is the kept representative). This is the
    web-scale recipe for pruning paraphrases/re-renders that exact and
    MinHash dedup cannot see, at Σ|cell|² cost instead of N².

    Exactness: pairwise similarity is tested on 1e-3-quantized int64
    vectors via the cross-multiplied inequality
    25·dot² ≥ 4·‖a‖²·‖b‖² (τ = 2/5) — all-integer arithmetic, no sqrt,
    no float accumulation, so the oracle matches bit-for-bit under any
    partitioning (same discipline as the Gram/PageRank operators).
    Overflow-safe under ANSI: |x|≤0.578 ⇒ dot ≤ 64·578² ≈ 2.1e7,
    25·dot² ≈ 1.1e16 < 2⁶³.

    Scale shape: assignment is a broadcast cross join vs K centroids +
    top-1 (the IVF pattern); the pairing join keys on cell, so each
    vector moves ONCE into its cell bucket and candidate pairs are
    Σ|cell|² — bound K to keep cells task-sized (production: k-means
    with √N cells, same plan). The dup report re-joins doc-keyed."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        _as_double("embedding").alias("v"),
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000 + F.lit(0.5)).cast("long"),
        ).alias("q"),
    )
    cents = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cvec")
    )
    l2 = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(F.col("v"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        4,
    )
    from firstamerican_etl_spark.operators.scale import stage_once

    # Stage the assignment once: three join branches (both pair sides +
    # the final report) reference it, and Catalyst would re-run the
    # centroid cross join + window per branch. Staging is also the real
    # IVF build artifact — assign once, search many.
    assigned = stage_once(
        top_k_per_group(
            e.crossJoin(F.broadcast(cents)).select(
                "vec_id", "q", "cent_id", l2.alias("d")
            ),
            partition_by=["vec_id"],
            order_by=[F.col("d"), F.col("cent_id")],
            k=1,
            rank_col="__rn",
        ).select(
            "vec_id",
            F.col("cent_id").alias("cell"),
            "q",
        ),
        "semdedup_assigned",
        reuse_key=f"{staging_tag(sf_dir, 'embeddings')}_{k}",
    )
    # Pair scoring: one shuffle by cell into an EXACT int64 BLAS kernel
    # (numpy int64 matmul — modular semantics never engaged, values
    # ≤2.1e7 — so Q·Qᵀ is bit-identical to the oracle's list_dot_product
    # over the same quantized ints). A join-based variant (zip_with +
    # aggregate fold per pair) is value-identical but pays interpreted-
    # lambda cost per element; the BLAS path scores all Σ|cell|² pairs
    # of a cell in one matmul, same trade as
    # dedup_embedding_cosine_vectorized.
    import math

    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    t_num, t_den = _SEMDEDUP_TAU
    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("cell", T.LongType()),
            T.StructField("dup_of", T.LongType()),
            T.StructField("is_dup", T.LongType()),
        ]
    )

    def cell_prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        q = np.stack(pdf["q"].to_numpy()).astype(np.int64)
        # OVERFLOW GUARD: the exactness claim below rests on every
        # intermediate staying inside int64 — numpy wraps silently (no
        # ANSI throw), so an unnormalized embedding slipping through
        # quantization would yield silently wrong dup verdicts. The
        # worst intermediate is t² · dot² with dot ≤ dim · qmax², so
        # require dim · qmax² ≤ isqrt(int64max / max(t_num², t_den²)).
        qmax = int(np.abs(q).max()) if q.size else 0
        t_sq = max(t_num * t_num, t_den * t_den)
        bound = math.isqrt((2**63 - 1) // t_sq)
        if q.size and q.shape[1] * qmax * qmax > bound:
            raise ValueError(
                f"cell_prune int64 overflow risk: dim*qmax^2 = "
                f"{q.shape[1] * qmax * qmax} > {bound} (qmax={qmax}); "
                "input embeddings exceed the quantization contract "
                "(|coord| small after scaling) — refusing to wrap."
            )
        d = q @ q.T
        nn = np.diagonal(d)
        ok = (d > 0) & (
            (t_den * t_den) * d * d >= (t_num * t_num) * np.outer(nn, nn)
        )
        # only LOWER-id mates count as representatives: row i, col j, i<j
        iu = np.triu_indices(len(ids), k=1)
        ok_pairs = ok[iu]
        dup_of = np.full(len(ids), -1, dtype=np.int64)
        for i, j in zip(iu[0][ok_pairs], iu[1][ok_pairs]):
            if dup_of[j] < 0 or ids[i] < dup_of[j]:
                dup_of[j] = ids[i]
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": pdf["cell"],
                "dup_of": pd.array(
                    [None if v < 0 else int(v) for v in dup_of], dtype="Int64"
                ),
                "is_dup": (dup_of >= 0).astype(np.int64),
            }
        )

    return assigned.groupBy("cell").applyInPandas(cell_prune, schema=out_schema)


@register(
    "semdedup_cluster_prune",
    oracle=_SEMDEDUP_ORACLE,
    tags=("dedup", "embedding", "semdedup", "cluster", "training-data", "contrast"),
)
def semdedup_cluster_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup at fixed K=8 — kept as the deliberate QUADRATIC
    CONTRAST row (per-cell pair work N²/K) next to the production
    `_sqrtk` twin below, which since r8 carries its own full value
    oracle (K derived in SQL) and owns the driver-window slot. Use the
    twin for anything that grows; this row exists so the 10×/100×
    probes can show WHY cell sizing matters (4.5× vs 1.2× per decade,
    SCALING.md). See ``_semdedup`` for the algorithm and exactness
    analysis."""
    return _semdedup(spark, sf_dir, _SEMDEDUP_K)


@register(
    "semdedup_cluster_prune_sqrtk",
    oracle=_SEMDEDUP_SQRTK_ORACLE,
    tags=("dedup", "embedding", "semdedup", "cluster", "scale"),
)
def semdedup_cluster_prune_sqrtk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup scale path: K grows as √N (the paper's cell sizing), so
    per-cell candidate pairs stay Σ|cell|² ≈ N·√N-bounded instead of
    N²/K — the measured fixed-K probe ratio was 3.2× per 10× data vs
    2.2× for this variant (SCALING.md; both still floor-dominated).
    Deterministic: centroids are the first K vectors by vec_id, ties
    in assignment break by cent_id, so a double run is bit-identical.
    FULL value oracle since r8: the data-dependent K is derived IN the
    oracle SQL (greatest(8, isqrt(N)//2) as a subquery over the same
    embeddings CTE), matching ``math.isqrt`` here exactly — double
    sqrt of an exact-in-double count floors identically below 2^53."""
    import math

    n = load_table(spark, sf_dir, "embeddings").count()  # metadata scalar
    k = max(_SEMDEDUP_K, math.isqrt(n) // 2)
    return _semdedup(spark, sf_dir, k)


_SWEEP_TAUS = ((1, 5), (3, 10), (2, 5), (1, 2))  # τ = 0.2, 0.3, 0.4, 0.5


@register(
    "semdedup_threshold_sweep",
    oracle=f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q
  FROM embeddings
),
cents AS (SELECT vec_id AS cent_id, v AS cvec FROM e
          WHERE vec_id < (SELECT greatest({_SEMDEDUP_K}, CAST(floor(sqrt(count(*))) AS BIGINT) // 2) FROM e)),
assigned AS (
  SELECT vec_id, q, cell FROM (
    SELECT e.vec_id, e.q, c.cent_id AS cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(CAST(list_distance(e.v, c.cvec) AS DOUBLE), 4), c.cent_id
           ) AS rn
    FROM e CROSS JOIN cents c
  ) WHERE rn = 1
),
n2 AS (
  SELECT vec_id, cell, q,
         CAST(list_aggregate(list_transform(q, x -> x * x), 'sum') AS BIGINT) AS nn
  FROM assigned
),
pd AS (
  SELECT CAST(list_dot_product(a.q, b.q) AS BIGINT) AS d, a.nn AS nna, b.nn AS nnb
  FROM n2 a JOIN n2 b ON a.cell = b.cell AND a.vec_id < b.vec_id
),
taus AS (
  {" UNION ALL ".join(f"SELECT {n} AS t_num, {d} AS t_den" for n, d in _SWEEP_TAUS)}
)
SELECT CAST(floor(t_num * 1000000.0 / t_den + 0.5) AS BIGINT) AS tau_ppm,
       CAST(count(*) AS BIGINT) AS n_candidate_pairs,
       CAST(sum(CASE WHEN d > 0 AND t_den * t_den * d * d >= t_num * t_num * nna * nnb
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_pairs
FROM pd CROSS JOIN taus
GROUP BY 1
""",
    tags=("dedup", "semdedup", "eval", "tuning"),
)
def semdedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup threshold tuning table: within-cell candidate pairs
    scored ONCE (exact int64 dot products over the same staged
    assignment the dedup query uses) and counted against a τ sweep
    (0.2 / 0.3 / 0.4 / 0.5, cross-multiplied integer inequalities — no
    sqrt, no floats). This is the one-pass table an operator reads to
    pick τ before committing a full-corpus prune: how many pairs (and
    therefore documents) each threshold would remove.

    Scale shape: √N cells (K = max(8, isqrt(N)//2), derived in the
    oracle SQL exactly like semdedup_cluster_prune_sqrtk) bound the
    within-cell pair work at ~N·√N — the fixed-K=8 formulation
    measured 45× per decade at the 100× probe before r8. Reuses the
    staged cell assignment (same content key as the sqrt-K prune —
    invoking both stages once); the sweep is a CASE per τ over the
    SAME dot product, so four thresholds cost one pass."""
    from firstamerican_etl_spark.operators.scale import stage_once
    from firstamerican_etl_spark.sources.io import staging_tag

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        _as_double("embedding").alias("v"),
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000 + F.lit(0.5)).cast("long"),
        ).alias("q"),
    )
    # sqrt-N cells, same rule (and same in-SQL oracle derivation) as
    # semdedup_cluster_prune_sqrtk: the r8 100x probe caught the fixed
    # K=8 sweep at 45x per decade (sum(cell^2) = N^2/8 pair work, 243 s
    # at derived sf10) - the tuning table must run on the SAME cell
    # sizing the production prune uses anyway, which bounds pair work
    # at ~N*sqrt(N) and keeps the tau counts comparable to what the
    # prune will actually remove.
    import math as _math

    n = e.count()  # metadata scalar
    k_cells = max(_SEMDEDUP_K, _math.isqrt(n) // 2)
    cents = e.filter(F.col("vec_id") < k_cells).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cvec")
    )
    l2 = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(F.col("v"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        4,
    )
    assigned = stage_once(
        top_k_per_group(
            e.crossJoin(F.broadcast(cents)).select(
                "vec_id", "q", "cent_id", l2.alias("d")
            ),
            partition_by=["vec_id"],
            order_by=[F.col("d"), F.col("cent_id")],
            k=1,
            rank_col="__rn",
        ).select("vec_id", F.col("cent_id").alias("cell"), "q"),
        "semdedup_assigned",
        reuse_key=f"{staging_tag(sf_dir, 'embeddings')}_{k_cells}",
    )
    # Pair scoring: the SAME exact int64 BLAS kernel as cell_prune —
    # NOT a cell self-join with interpreted zip_with/aggregate dot
    # products. The join formulation materialized Σ|cell|² pair ROWS
    # and paid an interpreted 64-element fold per row: value-identical
    # but 27× wall per 10× data in the 10× probe (the quadratic row
    # count times lambda interpretation). Here each cell's pairs are
    # scored inside one Arrow batch with BLOCKED integer matmuls
    # (block × cell, never cell × cell in memory), and only 4·|cells|
    # count rows leave Python. Same int64 overflow analysis as
    # cell_prune (guard asserted identically).
    import math

    import numpy as np
    import pandas as pd_

    from pyspark.sql import types as T

    sweep_taus = list(_SWEEP_TAUS)
    out_schema = T.StructType(
        [
            T.StructField("tau_ppm", T.LongType()),
            T.StructField("n_pairs", T.LongType()),
            T.StructField("n_dup", T.LongType()),
        ]
    )
    t_sq_max = max(max(tn * tn, td * td) for tn, td in sweep_taus)
    bound = math.isqrt((2**63 - 1) // t_sq_max)

    def cell_sweep(pdf: pd_.DataFrame) -> pd_.DataFrame:
        q = np.stack(pdf["q"].to_numpy()).astype(np.int64)
        m = len(q)
        qmax = int(np.abs(q).max()) if q.size else 0
        if q.size and q.shape[1] * qmax * qmax > bound:
            raise ValueError(
                f"threshold_sweep int64 overflow risk: dim*qmax^2 = "
                f"{q.shape[1] * qmax * qmax} > {bound} (qmax={qmax})"
            )
        nn = np.einsum("ij,ij->i", q, q)
        n_pairs = m * (m - 1) // 2
        dup = [0] * len(sweep_taus)
        blk = 1024
        for s in range(0, m, blk):
            e2 = min(s + blk, m)
            d = q[s:e2] @ q.T  # (block, m) int64
            # strict upper triangle: global column j > global row i
            cols = np.arange(m)[None, :]
            rows = np.arange(s, e2)[:, None]
            upper = cols > rows
            npr = np.outer(nn[s:e2], nn)
            pos = d > 0
            d2 = d * d
            for k, (tn, td) in enumerate(sweep_taus):
                hit = pos & ((td * td) * d2 >= (tn * tn) * npr) & upper
                dup[k] += int(hit.sum())
        return pd_.DataFrame(
            {
                "tau_ppm": [
                    int(tn * 1000000.0 / td + 0.5) for tn, td in sweep_taus
                ],
                "n_pairs": [n_pairs] * len(sweep_taus),
                "n_dup": dup,
            }
        )

    per_cell = assigned.groupBy("cell").applyInPandas(cell_sweep, schema=out_schema)
    return (
        per_cell.groupBy("tau_ppm")
        .agg(
            F.sum("n_pairs").alias("n_candidate_pairs"),
            F.sum("n_dup").alias("n_dup_pairs"),
        )
        # the oracle's pairs-CTE cross join emits tau rows only when at
        # least ONE candidate pair exists corpus-wide; the kernel's
        # per-cell rows exist for singleton cells too (n_pairs = 0), so
        # an all-singleton corpus would otherwise emit four zero rows
        # the oracle doesn't have. n_candidate_pairs is tau-independent,
        # so this drops either all four rows or none.
        .filter(F.col("n_candidate_pairs") > 0)
    )


@register(
    "int8_recon_fidelity",
    oracle="""
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS xv FROM embeddings
),
s AS (
  SELECT vec_id, label, xv,
         list_max(list_transform(xv, x -> abs(x))) AS maxabs
  FROM v
),
c AS (
  SELECT vec_id, label, xv, maxabs,
         list_transform(xv, x -> CAST(floor(x / maxabs * 127 + 0.5) AS BIGINT)) AS codes
  FROM s
  WHERE maxabs > 0
)
SELECT vec_id, label,
       CAST(len(xv) AS BIGINT) AS dim,
       CAST(list_sum(list_transform(codes, c -> c * c)) AS BIGINT) AS sum_sq_codes,
       floor(list_dot_product(xv, list_transform(codes, c -> CAST(c AS DOUBLE))) /
             (sqrt(list_dot_product(xv, xv)) *
              sqrt(CAST(list_sum(list_transform(codes, c -> c * c)) AS DOUBLE)))
             * 10000 + 0.5) / 10000 AS recon_cos
FROM c
""",
    tags=("vector", "quantization", "int8", "fidelity"),
)
def int8_recon_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization FIDELITY audit for the int8 storage op
    (corpusplans.embedding_quantize_int8 emits the codes; this grades
    them): per vector, the reconstruction cosine between the original
    float vector and its int8 codes. The scale factor cancels in
    cosine, so recon_cos IS the retrieval fidelity an int8-quantized
    ANN index keeps — the number a 4× index-size reduction is judged
    by before swapping the PQ/IVF index over to integer codes.

    Exactness: maxabs is a float max (no arithmetic); the code grid is
    floor(x/maxabs·127+½) — division and multiplication are correctly
    rounded IEEE ops, identical in both engines (unlike transcendental
    log/exp, which this discipline avoids); the squared code norm is
    an exact integer; the cosine is the same left-fold + 1e-4
    stable-round contract as cosine_topk_bruteforce. Zero vectors
    (maxabs=0) are excluded on both sides rather than special-cased
    to a 0/0 NaN.

    Scale shape: a pure map stage — per-row array expressions behind
    one scan, zero shuffles, trivially linear at 100 TB; codes clip to
    [-127, 127] by construction so sum_sq ≤ dim·127² never overflows
    int64. Generate barriers pin maxabs and codes to scalars/arrays —
    without them projection collapse re-inlines the array_max
    (resp. the code transform) into every per-element lambda use,
    O(dim²) work per row (same hazard embedding_quantize_int8
    documents)."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("xv")
    )
    # Generate barrier #1: bind the scalar maxabs.
    s = v.select(
        "vec_id", "label", "xv",
        F.explode(F.array(F.array_max(F.transform("xv", F.abs)))).alias("maxabs"),
    ).filter(F.col("maxabs") > 0)
    # Generate barrier #2: bind the code array.
    c = s.select(
        "vec_id", "label", "xv",
        F.explode(
            F.array(
                F.transform(
                    "xv",
                    lambda x: F.floor(
                        x / F.col("maxabs") * F.lit(127.0) + F.lit(0.5)
                    ).cast("long"),
                )
            )
        ).alias("codes"),
    )
    sum_sq = F.aggregate(
        "codes", F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )
    recon = dot(F.col("xv"), F.transform("codes", lambda x: x.cast("double"))) / (
        l2_norm(F.col("xv")) * F.sqrt(sum_sq.cast("double"))
    )
    return c.select(
        "vec_id",
        "label",
        F.size("xv").cast("long").alias("dim"),
        sum_sq.alias("sum_sq_codes"),
        stable_round(recon, 4).alias("recon_cos"),
    )


@register(
    "matryoshka_truncation_recall",
    oracle="""
WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
full_sims AS (
  SELECT q_id, c_id,
         floor(list_dot_product(qv, cv) /
               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
               * 10000 + 0.5) / 10000 AS cos_sim
  FROM q CROSS JOIN c WHERE q_id <> c_id
),
trunc_sims AS (
  SELECT q_id, c_id,
         floor(list_dot_product(qv[1:len(qv)//2], cv[1:len(cv)//2]) /
               (sqrt(list_dot_product(qv[1:len(qv)//2], qv[1:len(qv)//2])) *
                sqrt(list_dot_product(cv[1:len(cv)//2], cv[1:len(cv)//2])))
               * 10000 + 0.5) / 10000 AS cos_sim
  FROM q CROSS JOIN c WHERE q_id <> c_id
),
truth AS (
  SELECT q_id, c_id FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY cos_sim DESC, c_id) AS rn FROM full_sims
  ) WHERE rn <= 5
),
got AS (
  SELECT q_id, c_id FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY cos_sim DESC, c_id) AS rn FROM trunc_sims
  ) WHERE rn <= 5
)
SELECT t.q_id,
       CAST(count(g.c_id) AS BIGINT) AS n_hits,
       CAST(floor(CAST(count(g.c_id) AS DOUBLE) / 5 * 1000000 + 0.5)
            AS BIGINT) AS recall_ppm
FROM truth t LEFT JOIN got g ON t.q_id = g.q_id AND t.c_id = g.c_id
GROUP BY 1
""",
    tags=("vector", "matryoshka", "recall", "eval"),
)
def matryoshka_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation eval (Kusupati et al. 2022): recall@5 of
    half-dimension cosine retrieval against full-dimension ground
    truth, per query. THE go/no-go number for serving MRL-trained
    embeddings at a truncated dimension — a 2× index-size and
    dot-product-FLOPs cut is free exactly when this recall stays ≈1.

    Both rankings quantize the cosine to 1e-4 and tie-break on
    candidate id (the cosine_topk_bruteforce discipline), so the two
    top-5 sets are deterministic cross-engine; the hit count is an
    exact integer and recall is one ppm-quantized division.

    Scale shape: the |Q|-row query frame broadcasts twice (full and
    truncated scoring are two independent map stages over the corpus —
    the corpus never shuffles); each top-5 is a per-query window over
    |Q|×N scored rows; the final hit-join is |Q|×5 against |Q|×5.
    At 100 TB the two scoring passes fuse into one corpus scan each;
    IVF/LSH candidate generation (the knn_* family) would cut the
    scored pairs, kept brute-force here because the eval needs exact
    ground truth."""
    e = load_table(spark, sf_dir, "embeddings")
    half = lambda col: F.slice(col, 1, (F.size(col) / 2).cast("int"))
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), _as_double(F.col("embedding")).alias("qv")
    )
    c = e.select(
        F.col("vec_id").alias("c_id"), _as_double(F.col("embedding")).alias("cv")
    )

    def top5(score_qv, score_cv) -> DataFrame:
        sims = (
            c.crossJoin(F.broadcast(q))
            .filter(F.col("q_id") != F.col("c_id"))
            .select(
                "q_id",
                "c_id",
                stable_round(cosine(score_qv, score_cv), 4).alias("cos_sim"),
            )
        )
        return top_k_per_group(
            sims,
            partition_by=["q_id"],
            order_by=[F.col("cos_sim").desc(), F.col("c_id")],
            k=5,
            rank_col="__rn",
        ).select("q_id", "c_id")

    truth = top5(F.col("qv"), F.col("cv"))
    # Rename BOTH join keys on the truncated side: truth and got share
    # lineage (same q/c parents), so joining on same-named attributes
    # would resolve to a trivially-true self-comparison.
    got = (
        top5(half(F.col("qv")), half(F.col("cv")))
        .withColumnRenamed("q_id", "g_q_id")
        .withColumnRenamed("c_id", "g_c_id")
    )
    hits = truth.join(
        got,
        (F.col("q_id") == F.col("g_q_id")) & (F.col("c_id") == F.col("g_c_id")),
        "left",
    ).select("q_id", F.col("g_c_id").alias("hit"))
    return hits.groupBy("q_id").agg(
        F.count("hit").alias("n_hits"),
        F.floor(
            F.count("hit").cast("double") / F.lit(5.0) * F.lit(1000000.0) + F.lit(0.5)
        )
        .cast("long")
        .alias("recall_ppm"),
    )


@register(
    "hard_negative_mining",
    oracle="""
WITH q AS (SELECT vec_id AS q_id, label AS q_label,
                  CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS c_id, label AS c_label,
             CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
sims AS (
  SELECT q_id, q_label, c_id, c_label,
         floor(list_dot_product(qv, cv) /
               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
               * 10000 + 0.5) / 10000 AS cos_sim
  FROM q CROSS JOIN c WHERE q_id <> c_id
),
pos AS (
  SELECT q_id, max(cos_sim) AS cos_pos
  FROM sims WHERE c_label = q_label GROUP BY 1
),
neg AS (
  SELECT q_id, c_id, c_label, cos_sim AS cos_neg FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY cos_sim DESC, c_id) AS rn
    FROM sims WHERE c_label <> q_label
  ) WHERE rn <= 3
)
SELECT n.q_id, n.c_id, n.c_label, n.cos_neg, p.cos_pos,
       CAST(floor((n.cos_neg - p.cos_pos) * 10000 + 0.5) AS BIGINT)
         AS margin_bp
FROM neg n JOIN pos p ON n.q_id = p.q_id
""",
    tags=("vector", "hard-negatives", "contrastive"),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    top-3 most-similar DIFFERENT-label vectors (the negatives a
    triplet/InfoNCE loss actually learns from) alongside the best
    same-label positive, with the negative-minus-positive margin. A
    positive margin_bp flags a violated triplet — the exact rows a
    curriculum sampler feeds back first.

    Exactness: cosines quantize at 1e-4 before ranking (tie-break
    c_id), the positive is a max over quantized values, and the margin
    is integer basis-point arithmetic on two already-quantized
    doubles — scale by 1e4 turns them into exact integers.

    Scale shape: one broadcast of the query frame, one corpus scan
    scoring all pairs, then two tiny per-query reductions (max over
    positives, top-3 window over negatives) that share the scored
    frame via a single shuffle on q_id. At 100 TB the scan dominates;
    the knn_ivf_cells candidate generator is the drop-in to bound
    scored pairs per query."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        _as_double(F.col("embedding")).alias("qv"),
    )
    c = e.select(
        F.col("vec_id").alias("c_id"),
        F.col("label").alias("c_label"),
        _as_double(F.col("embedding")).alias("cv"),
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "q_label",
            "c_id",
            "c_label",
            stable_round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos_sim"),
        )
    )
    pos = (
        sims.filter(F.col("c_label") == F.col("q_label"))
        .groupBy("q_id")
        .agg(F.max("cos_sim").alias("cos_pos"))
    )
    neg = top_k_per_group(
        sims.filter(F.col("c_label") != F.col("q_label")),
        partition_by=["q_id"],
        order_by=[F.col("cos_sim").desc(), F.col("c_id")],
        k=3,
        rank_col="__rn",
    ).select("q_id", "c_id", "c_label", F.col("cos_sim").alias("cos_neg"))
    return neg.join(F.broadcast(pos), "q_id").select(
        "q_id",
        "c_id",
        "c_label",
        "cos_neg",
        "cos_pos",
        F.floor((F.col("cos_neg") - F.col("cos_pos")) * F.lit(10000.0) + F.lit(0.5))
        .cast("long")
        .alias("margin_bp"),
    )


import math as _ndcg_math

#: Integer DCG position weights: floor(1e6 / log2(i+1) + 0.5) for
#: ranks 1..10, PRECOMPUTED in Python and inlined as the same literals
#: on both engines — no runtime log anywhere, so the quantization-
#: boundary ULP risk of engine log2 never arises.
_NDCG_W = tuple(round(1_000_000 / _ndcg_math.log2(i + 1)) for i in range(1, 11))
#: Ideal DCG is a CONSTANT by construction: the exact top-10's graded
#: gains are always the multiset {3,3,3,2,2,2,1,1,1,1} (grades are
#: DEFINED from exact rank), so IDCG = Σ ideal_gain[i]·W[i].
_NDCG_IDEAL = sum(g * w for g, w in zip((3, 3, 3, 2, 2, 2, 1, 1, 1, 1), _NDCG_W))


def _ndcg_oracle() -> str:
    ws = _lsh_weights()
    projs = []
    for p, w in enumerate(ws):
        chain = " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * {w[i]:.1f}" for i in range(64)
        )
        projs.append(f"CASE WHEN ({chain}) > 0 THEN {1 << p} ELSE 0 END")
    bucket = " + ".join(projs)
    w_case = " ".join(
        f"WHEN {i + 1} THEN {w}" for i, w in enumerate(_NDCG_W)
    )
    sv = """CASE WHEN d >= 0 THEN
         CAST(floor(CAST(d AS DOUBLE) * CAST(d AS DOUBLE)
                    / (CAST(nna AS DOUBLE) * CAST(nnb AS DOUBLE))
                    * 1000000000) AS BIGINT)
       ELSE
         -CAST(floor(CAST(d AS DOUBLE) * CAST(d AS DOUBLE)
                     / (CAST(nna AS DOUBLE) * CAST(nnb AS DOUBLE))
                     * 1000000000) AS BIGINT)
       END"""
    return f"""
WITH e AS (
  SELECT vec_id, embedding, {bucket} AS bucket,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q
  FROM embeddings
),
n2 AS (
  SELECT vec_id, bucket, q,
         CAST(list_aggregate(list_transform(q, x -> x * x), 'sum') AS BIGINT) AS nn
  FROM e
),
exact AS (
  SELECT a.vec_id AS q_id, b.vec_id AS c_id,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY (SELECT {sv} FROM (SELECT
                       CAST(list_dot_product(a.q, b.q) AS BIGINT) AS d,
                       a.nn AS nna, b.nn AS nnb)) DESC, b.vec_id
         ) AS xrank
  FROM n2 a JOIN n2 b ON a.vec_id < 5 AND b.vec_id <> a.vec_id
),
gains AS (
  SELECT q_id, c_id,
         CASE WHEN xrank <= 3 THEN 3 WHEN xrank <= 6 THEN 2
              WHEN xrank <= 10 THEN 1 ELSE 0 END AS gain
  FROM exact
),
sys AS (
  SELECT q_id, c_id, srank FROM (
    SELECT a.vec_id AS q_id, b.vec_id AS c_id,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY (SELECT {sv} FROM (SELECT
                         CAST(list_dot_product(a.q, b.q) AS BIGINT) AS d,
                         a.nn AS nna, b.nn AS nnb)) DESC, b.vec_id
           ) AS srank
    FROM n2 a JOIN n2 b ON a.bucket = b.bucket AND b.vec_id <> a.vec_id
    WHERE a.vec_id < 5
  ) WHERE srank <= 10
),
dcg AS (
  SELECT s.q_id,
         CAST(count(*) AS BIGINT) AS n_sys,
         CAST(sum(g.gain * (CASE s.srank {w_case} END)) AS BIGINT) AS dcg
  FROM sys s JOIN gains g ON g.q_id = s.q_id AND g.c_id = s.c_id
  GROUP BY 1
)
SELECT q_id, n_sys, dcg,
       CAST(floor(CAST(dcg AS DOUBLE) * 1000000 / {_NDCG_IDEAL}) AS BIGINT)
         AS ndcg_ppm
FROM dcg
""";


@register(
    "ndcg_at_k_eval",
    oracle=_ndcg_oracle(),
    tags=("vector", "retrieval", "eval", "ndcg", "lsh"),
)
def ndcg_at_k_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-QUALITY eval for the ANN family: NDCG@10 of the sign-LSH
    bucketed retrieval against exact-cosine graded relevance — the
    metric that distinguishes "found the right set" (recall, already
    measured by knn_ivf/minhash recall evals) from "put them in the
    right ORDER".

    Graded relevance is DEFINED from the exact ranking (rank ≤3 → 3,
    ≤6 → 2, ≤10 → 1, else 0), which makes the ideal DCG a compile-time
    CONSTANT and every term integer: gains are ints, position
    discounts are precomputed integer weights floor(1e6/log2(i+1))
    inlined as literals on BOTH engines, and the ranking key is the
    signed quantized cosine-square floor(sign(d)·d²·1e9/(nna·nnb)) on
    1e-3-quantized int64 vectors — every intermediate ≤2^53 so the one
    float division is exactly rounded and bit-identical in DuckDB (the
    semdedup exactness analysis, applied to ordering). No engine log,
    no float summation, no rounded-cosine ties.

    Scale shape: probes broadcast (5 rows) against the corpus for the
    truth pass (one map + per-probe top-k — the cosine_topk shape);
    the system pass meets candidates through the LSH bucket equi-join;
    the DCG is a 5-group integer aggregate."""
    e = load_table(spark, sf_dir, "embeddings")
    v = _as_double(F.col("embedding"))
    q = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 1000 + F.lit(0.5)).cast("long"),
    )
    ws = _lsh_weights()
    bucket = None
    for p, w in enumerate(ws):
        lit_w = F.array(*[F.lit(x) for x in w])
        proj = F.aggregate(
            F.zip_with(v, lit_w, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        term = F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    nn = F.aggregate(
        F.transform(q, lambda x: x * x), F.lit(0).cast("long"), lambda a, x: a + x
    )
    base = e.select("vec_id", q.alias("q"), bucket.alias("bucket"), nn.alias("nn"))

    probes = base.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("q").alias("qq"),
        F.col("bucket").alias("qbucket"),
        F.col("nn").alias("qnn"),
    )
    dot = F.aggregate(
        F.zip_with("qq", "q", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )

    def signed_ratio(d_col):
        mag = F.floor(
            d_col.cast("double")
            * d_col.cast("double")
            / (F.col("qnn").cast("double") * F.col("nn").cast("double"))
            * F.lit(1000000000.0)
        ).cast("long")
        return F.when(d_col >= 0, mag).otherwise(-mag)

    exact_pairs = (
        F.broadcast(probes)
        .crossJoin(base)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("c_id"), signed_ratio(dot).alias("sv"))
    )
    from pyspark.sql.window import Window

    wx = Window.partitionBy("q_id").orderBy(F.col("sv").desc(), "c_id")
    # gain for EVERY candidate (0 beyond exact rank 10): the system
    # top-10 joins against this without dropping zero-gain retrievals,
    # so n_sys counts what the system returned, not what scored
    gains = exact_pairs.withColumn("xrank", F.row_number().over(wx)).select(
        "q_id",
        "c_id",
        F.when(F.col("xrank") <= 3, 3)
        .when(F.col("xrank") <= 6, 2)
        .when(F.col("xrank") <= 10, 1)
        .otherwise(0)
        .alias("gain"),
    )
    sys_pairs = (
        F.broadcast(probes)
        .join(base, probes.qbucket == base.bucket)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("c_id"), signed_ratio(dot).alias("sv"))
    )
    sys10 = (
        sys_pairs.withColumn("srank", F.row_number().over(wx))
        .filter(F.col("srank") <= 10)
        .select("q_id", "c_id", "srank")
    )
    w_expr = F.element_at(F.array(*[F.lit(w) for w in _NDCG_W]), F.col("srank"))
    return (
        sys10.join(gains, ["q_id", "c_id"])
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sys"),
            F.sum(F.col("gain") * w_expr).cast("long").alias("dcg"),
        )
        .select(
            "q_id",
            "n_sys",
            "dcg",
            F.floor(
                F.col("dcg").cast("double") * F.lit(1000000.0) / F.lit(float(_NDCG_IDEAL))
            )
            .cast("long")
            .alias("ndcg_ppm"),
        )
    )
