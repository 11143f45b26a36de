"""Retrieval & corpus-statistics operators: BM25 ranked retrieval,
inverted-index posting lists, exact per-label embedding centroids, and
a chi-square independence audit over the (lang, source) mix.

These extend the LLM-data-pipeline surface past dedup/ANN into the
*retrieval* half of a training-data stack — the pieces a team needs to
mine a 100 TB corpus for query-relevant subsets (BM25), to build the
term → documents index that powers decontamination lookups at scale
(posting lists), and to monitor corpus composition drift (centroids,
chi-square).

Scale notes baked into each plan:
- BM25 never materializes a full doc×term matrix: the query-term set
  filters the exploded term table FIRST (predicate on the generated
  column, so the explode's output is pruned immediately), the
  document-frequency side is |query| rows broadcast, and doc length
  comes from one aggregate over the same exploded scan. Two shuffles
  total (doclen agg + per-doc score agg), each keyed on doc_id.
- Posting lists cap each list with slice() AFTER sort_array, so the
  aggregate state per term is bounded by the distinct-doc count per
  term, and the emitted row stays index-entry sized. At 100 TB the
  same plan shape holds with the cap as the posting-block length.
- Centroids use the quantized-int64 fast_avg path per (label, dim):
  exact under any partitioning, whole-stage-codegen throughout, and
  the shuffle key (label, dim) is perfectly uniform by construction.
- Chi-square is three tiny aggregates (cells, row totals, column
  totals) joined back — contingency tables are KB-sized at any corpus
  scale, so every join side broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firstamerican_etl_spark.functions.stable import (
    fast_avg,
    fast_sum,
    sql_fast_avg,
    sql_fast_sum,
    stable_round,
)
from firstamerican_etl_spark.plans.registry import register
from firstamerican_etl_spark.sources.io import load_table

# Query-term set for the BM25 demo query (synthetic-vocabulary terms
# present at every SF). Literal in both the plan and the oracle.
_BM25_TERMS = ("vector", "hash", "join")
_BM25_K1 = 1.2
_BM25_B = 0.75

# Shared oracle core: per-doc BM25 scores for the fixed query terms.
# bm25_topk_retrieval ranks it directly; hybrid_rrf_fusion reuses it
# as the lexical leg so the two oracles can never drift apart.
_BM25_SCORES_SQL = f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
doclen AS (SELECT doc_id, count(*) AS dl FROM words GROUP BY 1),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclen),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM words
  WHERE term IN ('vector', 'hash', 'join') GROUP BY 1, 2
),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM words
  WHERE term IN ('vector', 'hash', 'join') GROUP BY 1
)
SELECT doc_id,
       {sql_fast_sum(
           "floor(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * 1000000 + 0.5) / 1000000"
           f" * tf * {_BM25_K1 + 1.0}"
           f" / (tf + {_BM25_K1} * ({1.0 - _BM25_B} + {_BM25_B} * dl / avgdl))",
           round_to=4,
       )} AS bm25
FROM tf
JOIN dfreq USING (term)
JOIN doclen USING (doc_id)
CROSS JOIN stats
GROUP BY doc_id
"""


@register(
    "bm25_topk_retrieval",
    oracle=f"""
{_BM25_SCORES_SQL}
ORDER BY bm25 DESC, doc_id
LIMIT 20
""",
    tags=("retrieval", "bm25", "text"),
)
def bm25_topk_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) top-20 documents for a fixed
    query-term set. idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (the
    Lucene/Robertson-Sparck-Jones form, always positive), stably
    rounded to 6 decimals on BOTH sides so a last-ulp ln() divergence
    between JVM and C libm can never cross a quantization boundary;
    per-term scores are quantized-int64 summed per doc (``fast_sum``)
    so the result is bit-stable under any partitioning, and the top-k
    sort tie-breaks on doc_id. The query-term filter lands directly on
    the exploded term column, so the big scan only carries matching
    terms into the score aggregate; dfreq and the (n_docs, avgdl)
    stats row are metadata-sized and broadcast."""
    return (
        _bm25_scores(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc BM25 scores for the fixed query terms — the Spark twin
    of ``_BM25_SCORES_SQL`` (kept side-by-side so plan and oracle share
    one definition of the score).

    ONE corpus pass (r10 review): the old formulation hung doclen, tf
    and dfreq off the same exploded-words subtree, and Catalyst does
    not CSE across join branches — the corpus was re-tokenized and
    re-exploded 3-4 times per invocation. Because the query-term set is
    a fixed literal, per-doc length AND per-term counts fold into one
    conditional aggregate over a single explode; everything after it
    (stats, df, the unpivot back to (doc, term, tf) rows) runs on the
    one-row-per-doc frame, which is localCheckpointed once for its
    three consumers."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ", -1)).alias("term")
    )
    per_doc = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"tf_{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    ).localCheckpoint(eager=True)
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # document frequency per term: one |terms|-column aggregate over
    # the per-doc frame, unpivoted to (term, df) — metadata-sized
    df_row = per_doc.agg(
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0))
            .cast("long")
            .alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ]
    )
    stack_df = ", ".join(
        f"'{t}', df_{i}" for i, t in enumerate(_BM25_TERMS)
    )
    dfreq = df_row.select(
        F.expr(f"stack({len(_BM25_TERMS)}, {stack_df}) AS (term, df)")
    )
    stack_tf = ", ".join(
        f"'{t}', tf_{i}" for i, t in enumerate(_BM25_TERMS)
    )
    tf = per_doc.select(
        "doc_id",
        "dl",
        F.expr(f"stack({len(_BM25_TERMS)}, {stack_tf}) AS (term, tf)"),
    ).filter(F.col("tf") > 0)
    idf = stable_round(
        F.log(
            1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ),
        6,
    )
    score = (
        idf
        * F.col("tf")
        * (_BM25_K1 + 1.0)
        / (
            F.col("tf")
            + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(fast_sum(score, round_to=4).alias("bm25"))
    )


@register(
    "inverted_index_postings",
    oracle="""
WITH words AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
)
SELECT term,
       count(*) AS df,
       array_to_string(list(doc_id ORDER BY doc_id)[1:10], ' ') AS postings_head
FROM words
GROUP BY term
ORDER BY term
""",
    tags=("retrieval", "index", "text"),
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term → (document frequency, first posting block) inverted
    index. The DISTINCT collapses repeated in-doc occurrences before
    the per-term aggregate (one shuffle on term), collect_set bounds
    state by per-term distinct docs, and slice(sort_array(...), 1, 10)
    emits a fixed-width posting head — the index-entry layout a
    decontamination or retrieval service would store per block. The
    whole plan is two hash aggregates; no window, no join. The head is
    emitted as a space-joined string, not a raw array: the r11 driver
    round proved the harness canonicalizer rejects list cells, and the
    ids are already canonically sorted so the string loses nothing."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ", -1)).alias("term")
    ).distinct()
    return (
        words.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.transform(
                    F.slice(F.sort_array(F.collect_set("doc_id")), 1, 10),
                    lambda x: x.cast("string"),
                ),
                " ",
            ).alias("postings_head"),
        )
        .orderBy("term")
    )


@register(
    "embedding_centroid_per_label",
    oracle=f"""
WITH dims AS (
  SELECT label,
         unnest(embedding) AS v,
         unnest(range(1, len(embedding) + 1)) AS dim
  FROM embeddings
)
SELECT label, dim, {sql_fast_avg("v", round_to=4, scale=8)} AS centroid_v
FROM dims
GROUP BY label, dim
ORDER BY label, dim
""",
    tags=("embeddings", "stats"),
)
def embedding_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-label centroid of the embedding column, one row per
    (label, dimension). posexplode unrolls the vectors (DuckDB's
    parallel-unnest zip is the oracle twin); the per-(label, dim) mean
    runs on the quantized-int64 ``fast_avg`` path at scale 8 (floats
    in [-1, 1]: no overflow until ~10^10 rows per cell), so the value
    is independent of partitioning and engine. This is the monitoring
    twin of the KMeans quantizer: exact class centroids for drift
    dashboards and seed initialization."""
    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).select("label", (F.col("pos") + 1).alias("dim"), "v")
    return (
        dims.groupBy("label", "dim")
        .agg(fast_avg(F.col("v"), round_to=4, scale=8).alias("centroid_v"))
        .orderBy("label", "dim")
    )


@register(
    "chi2_lang_source",
    oracle=f"""
WITH obs AS (
  SELECT lang, source, CAST(count(*) AS DOUBLE) AS o
  FROM documents GROUP BY 1, 2
),
rt AS (SELECT lang, sum(o) AS rl FROM obs GROUP BY 1),
ct AS (SELECT source, sum(o) AS cs FROM obs GROUP BY 1),
n AS (SELECT sum(o) AS total FROM obs)
SELECT
  {sql_fast_sum(
      "(o - rl * cs / total) * (o - rl * cs / total) / (rl * cs / total)",
      round_to=4,
  )} AS chi2,
  count(*) AS observed_cells
FROM obs
JOIN rt USING (lang)
JOIN ct USING (source)
CROSS JOIN n
""",
    tags=("stats", "quality"),
)
def chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square statistic for independence of (lang, source)
    — the corpus-composition drift audit: a spike means one source's
    language mix shifted. Three aggregates over the contingency table
    (cells, row totals, column totals); every side after the first
    groupBy is contingency-table sized, so the joins broadcast and the
    final sum is a handful of rows on the fast quantized path."""
    d = load_table(spark, sf_dir, "documents")
    obs = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("double").alias("o")
    )
    rt = obs.groupBy("lang").agg(F.sum("o").alias("rl"))
    ct = obs.groupBy("source").agg(F.sum("o").alias("cs"))
    n = obs.agg(F.sum("o").alias("total"))
    expected = F.col("rl") * F.col("cs") / F.col("total")
    contrib = (F.col("o") - expected) * (F.col("o") - expected) / expected
    return (
        obs.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(n))
        .agg(
            fast_sum(contrib, round_to=4).alias("chi2"),
            F.count(F.lit(1)).alias("observed_cells"),
        )
    )


_RRF_K = 60


def _ranked(top: DataFrame, score: str, rank_name: str) -> DataFrame:
    """rank = 1 + |{strictly-better rows}| over a LIMIT-bounded frame —
    no global-ORDER-BY WindowExec (whose single-partition alarm the
    bench contract treats as a plan regression); the self-join is a
    bounded broadcast nested loop, and the total order (rounded score
    desc, doc_id) makes it row_number-exact.

    The ≤k-row ``top`` frame is localCheckpoint-ed first (r14): both
    self-join sides replanned the WHOLE leg upstream (BM25 scoring /
    corpus cosine) — the before-plan ran each leg twice
    (plans/r14/hybrid_rrf_fusion_before.txt, 4 doc scans). One
    bounded materialization (k rows) halves every leg at any scale."""
    top = top.localCheckpoint(eager=True)
    a, b = top.alias("a"), top.alias("b")
    better = (F.col(f"b.{score}") > F.col(f"a.{score}")) | (
        (F.col(f"b.{score}") == F.col(f"a.{score}"))
        & (F.col("b.doc_id") < F.col("a.doc_id"))
    )
    return (
        a.join(F.broadcast(b), better, "left")
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg((F.count(F.col("b.doc_id")) + 1).cast("int").alias(rank_name))
    )


@register(
    "hybrid_rrf_fusion",
    oracle=f"""
WITH bm25_scores AS ({_BM25_SCORES_SQL}),
lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
  FROM bm25_scores
  ORDER BY bm25 DESC, doc_id LIMIT 20
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
sims AS (
  SELECT vec_id AS doc_id,
         floor(list_dot_product(qv, cv) /
               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
               * 10000 + 0.5) / 10000 AS cos_sim
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings)
  CROSS JOIN q
),
sem AS (
  SELECT doc_id, row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS sem_rank
  FROM sims
  ORDER BY cos_sim DESC, doc_id LIMIT 20
)
SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
       floor((COALESCE(1.0 / ({_RRF_K} + lex_rank), 0.0)
              + COALESCE(1.0 / ({_RRF_K} + sem_rank), 0.0)) * 1000000 + 0.5)
           / 1000000 AS rrf,
       lex_rank,
       sem_rank
FROM lex FULL OUTER JOIN sem USING (doc_id)
ORDER BY rrf DESC, doc_id
LIMIT 15
""",
    tags=("retrieval", "hybrid", "vector", "text"),
)
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+semantic retrieval via reciprocal-rank fusion
    (k=60, the Cormack/Clarke constant): the BM25 top-20 (shared
    ``_bm25_scores`` leg) fused with the cosine top-20 against a fixed
    query embedding (vec_id 0), score = Σ 1/(k + rank) over the legs a
    doc appears in. Both legs end in a top-k, so the fusion join is
    over two ≤20-row frames — whatever the corpus size, the fusion
    stage is constant-sized and broadcastable; the heavy lifting stays
    in the legs, each of which is independently scale-shaped (BM25:
    pruned explode + two aggs; cosine: broadcast query, one map over
    the corpus, TakeOrdered top-k). Ranks are over stably-ROUNDED
    scores with id tie-breaks, so rank assignment is engine-exact;
    they are computed as 1 + count-of-better over the bounded legs
    (broadcast nested loop), never a global-ORDER-BY window."""
    from firstamerican_etl_spark.plans.vectorplans import _as_double, cosine

    lex = _ranked(
        _bm25_scores(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20),
        "bm25",
        "lex_rank",
    )
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        _as_double(F.col("embedding")).alias("qv")
    )
    sims = e.crossJoin(F.broadcast(q)).select(
        F.col("vec_id").alias("doc_id"),
        stable_round(
            cosine(_as_double(F.col("embedding")), F.col("qv")), 4
        ).alias("cos_sim"),
    )
    sem = _ranked(
        sims.orderBy(F.col("cos_sim").desc(), "doc_id").limit(20),
        "cos_sim",
        "sem_rank",
    )
    leg = lambda r: F.coalesce(1.0 / (F.lit(_RRF_K) + F.col(r)), F.lit(0.0))  # noqa: E731
    return (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            stable_round(leg("lex_rank") + leg("sem_rank"), 6).alias("rrf"),
            "lex_rank",
            "sem_rank",
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(15)
    )


@register(
    "retrieval_eval_ndcg",
    oracle=f"""
WITH bm25_scores AS ({_BM25_SCORES_SQL}),
rel AS (
  SELECT doc_id,
         len(list_intersect(list_distinct(string_split(text, ' ')),
                            ['vector', 'hash', 'join'])) AS rel
  FROM documents
),
retrieved AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
  FROM bm25_scores ORDER BY bm25 DESC, doc_id LIMIT 10
),
ideal AS (
  SELECT doc_id, rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS rnk
  FROM rel ORDER BY rel DESC, doc_id LIMIT 10
),
dcg_t AS (
  SELECT {sql_fast_sum(
      "(power(2, rel) - 1)"
      " * (floor(1.0 / log2(rnk + 1) * 1000000 + 0.5) / 1000000)",
      round_to=6,
  )} AS dcg
  FROM retrieved JOIN rel USING (doc_id)
),
idcg_t AS (
  SELECT {sql_fast_sum(
      "(power(2, rel) - 1)"
      " * (floor(1.0 / log2(rnk + 1) * 1000000 + 0.5) / 1000000)",
      round_to=6,
  )} AS idcg
  FROM ideal
)
SELECT dcg, idcg,
       floor(dcg / idcg * 1000000 + 0.5) / 1000000 AS ndcg
FROM dcg_t CROSS JOIN idcg_t
""",
    tags=("retrieval", "evaluation", "ndcg"),
)
def retrieval_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the BM25 ranking against graded relevance = number
    of distinct query terms present in the document (0-3) — the
    retrieval-evaluation leg that closes the loop: build the index,
    rank, MEASURE the ranking. DCG sums (2^rel - 1)·1/log2(rank+1)
    over the retrieved top-10; IDCG over the corpus-wide ideal
    ordering (rel desc); discounts are stably rounded at 6 so a
    last-ulp log2 divergence can't move the quantized sums, and both
    rank assignments tie-break on doc_id. Scale shape: relevance is a
    pure map over the corpus; both top-10s are TakeOrdered (local
    top-k, no global sort); everything after is ≤10-row arithmetic."""
    terms = F.array(*[F.lit(t) for t in _BM25_TERMS])
    d = load_table(spark, sf_dir, "documents")
    rel = d.select(
        "doc_id",
        F.size(
            F.array_intersect(
                F.array_distinct(F.split(F.col("text"), " ", -1)), terms
            )
        ).alias("rel"),
    )
    retrieved = _ranked(
        _bm25_scores(spark, sf_dir).orderBy(F.col("bm25").desc(), "doc_id").limit(10),
        "bm25",
        "rnk",
    )
    ideal = _ranked(
        rel.orderBy(F.col("rel").desc(), "doc_id").limit(10), "rel", "rnk"
    ).join(rel, "doc_id")
    discount = lambda: stable_round(  # noqa: E731
        F.lit(1.0) / F.log2(F.col("rnk") + 1), 6
    )
    gain = F.pow(F.lit(2.0), F.col("rel")) - 1.0
    dcg_t = (
        retrieved.join(rel, "doc_id")
        .agg(fast_sum(gain * discount(), round_to=6).alias("dcg"))
    )
    idcg_t = ideal.agg(fast_sum(gain * discount(), round_to=6).alias("idcg"))
    return (
        dcg_t.crossJoin(F.broadcast(idcg_t))
        .select(
            "dcg",
            "idcg",
            stable_round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
        )
    )
