"""LLM corpus-preparation operators over ``documents``/``embeddings``:
chunking documents into overlapping training windows, contiguous
sequence packing against a token budget, and int8 embedding
quantization. These are the steps between "cleaned corpus" (dedup,
quality — dedupplans/textplans) and "training batches", and each is a
pure Catalyst plan with a full DuckDB oracle.

Scale shape: chunking is explode-only (rows × windows, no shuffle
until the consumer aggregates); packing is one window pass over the
per-doc token counts (never the text); quantization is a map over the
embedding arrays. Nothing here touches Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firstamerican_etl_spark.operators.scale import global_running_sum
from firstamerican_etl_spark.plans.registry import register
from firstamerican_etl_spark.sources.io import load_table

_W = 40  # chunk window (words)
_S = 20  # stride
_B = 256  # packing token budget


@register(
    "doc_chunk_windows",
    oracle=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
starts AS (
  SELECT doc_id, words, len(words) AS n,
         unnest(generate_series(1, greatest(len(words) - {_W} + 1, 1), {_S})) AS start
  FROM w
)
SELECT doc_id,
       CAST(floor((start - 1) / {_S}.0) AS BIGINT) AS chunk_id,
       least({_W}, n - start + 1) AS n_tokens,
       words[start] AS first_word,
       words[start + least({_W}, n - start + 1) - 1] AS last_word
FROM starts
""",
    tags=("corpus", "chunking", "explode"),
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: every document becomes ⌈(n-W)/S⌉+1
    overlapping windows of W=40 words at stride S=20 — the standard
    context-window prep for LLM training. Emits per-chunk bounds
    (count, first/last word) rather than materializing the chunk text;
    a consumer slices the bound words array itself. The words array is
    bound behind a Generate barrier (see dedupplans.exploded_words) so
    interpreted lambdas never re-split the text; the explode multiplies
    rows map-side only — zero shuffle in this plan."""
    from firstamerican_etl_spark.plans.dedupplans import exploded_words

    d = exploded_words(load_table(spark, sf_dir, "documents"))
    n = F.size("words")
    starts = d.select(
        "doc_id",
        "words",
        n.alias("n"),
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(n - F.lit(_W - 1), F.lit(1)), F.lit(_S)
            )
        ).alias("start"),
    )
    n_tok = F.least(F.lit(_W), F.col("n") - F.col("start") + 1)
    return starts.select(
        "doc_id",
        F.floor((F.col("start") - 1) / float(_S)).alias("chunk_id"),
        n_tok.alias("n_tokens"),
        F.element_at("words", F.col("start")).alias("first_word"),
        F.element_at("words", F.col("start") + n_tok - 1).alias("last_word"),
    )


@register(
    "corpus_pack_contiguous",
    oracle=f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS tok_offset
  FROM t
)
SELECT CAST(floor(tok_offset / {_B}.0) AS BIGINT) AS bin_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM c
GROUP BY 1
""",
    tags=("corpus", "packing", "window"),
)
def corpus_pack_contiguous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing: lay documents end-to-end in
    deterministic doc_id order and cut bins every B=256 tokens (the
    concat-then-split packing used to fill fixed-length training
    contexts with minimal padding). The bin id is a pure function of
    the running token offset, computed with the DISTRIBUTED prefix-sum
    recipe (``operators/scale.global_running_sum``): range-partition by
    doc_id, per-shard cumsum over the per-doc token counts (integers,
    never text), driver prefix-sum of the |shards| shard totals, add
    the broadcast base offsets — no ``WindowExec: No Partition
    Defined`` single-task collapse; every shard packs in parallel and
    the seams are stitched by the exact base offsets."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.size(F.split("text", " ", -1)).alias("n_tokens")
    )
    c = global_running_sum(t, "doc_id", "n_tokens", out_col="run_tok")
    c = c.withColumn("tok_offset", F.col("run_tok") - F.col("n_tokens"))
    return (
        c.groupBy(
            F.floor(F.col("tok_offset") / float(_B)).alias("bin_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@register(
    "embedding_quantize_int8",
    oracle="""
WITH s AS (
  SELECT vec_id, embedding,
         CAST(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
              AS DOUBLE) AS sc
  FROM embeddings
)
SELECT vec_id,
       floor(sc * 1000000 + 0.5) / 1000000 AS scale,
       (SELECT CAST(sum(CAST(floor(CAST(x AS DOUBLE) / sc * 127 + 0.5) AS BIGINT)) AS BIGINT)
          FROM unnest(embedding) AS u(x)) AS q_checksum,
       len(embedding) AS dim
FROM s
""",
    tags=("corpus", "quantization", "array"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of embeddings: per-vector scale =
    max|x|, each element mapped to floor(x/scale·127+½) ∈ [-126, 127]
    (the storage-shrink step before ANN indexing — 4× smaller than
    float32, dot products in integer SIMD). Emitted as the per-vector
    scale plus the quantized checksum — exact integers, so the oracle
    is bit-tight. Pure map over the array column: transform for the
    scale, an integer aggregate() fold for the checksum, no shuffle."""
    e = load_table(spark, sf_dir, "embeddings")
    scale_raw = F.array_max(
        F.transform("embedding", lambda x: F.abs(x.cast("double")))
    )
    # Generate barrier binds the scalar scale: without it, projection
    # collapse would re-inline the array_max(transform(...)) into the
    # interpreted checksum lambda PER ELEMENT — O(dim²) work per row.
    s = e.select(
        "vec_id", "embedding", F.explode(F.array(scale_raw)).alias("sc")
    )
    q = lambda x: F.floor(
        x.cast("double") / F.col("sc") * F.lit(127.0) + F.lit(0.5)
    ).cast("long")
    checksum = F.aggregate(
        "embedding", F.lit(0).cast("long"), lambda acc, x: acc + q(x)
    )
    return s.select(
        "vec_id",
        (
            F.floor(F.col("sc") * F.lit(1000000.0) + F.lit(0.5))
            / F.lit(1000000.0)
        ).alias("scale"),
        checksum.alias("q_checksum"),
        F.size("embedding").alias("dim"),
    )


_SEG = 3  # boilerplate segment length (words)
_SEG_DOCS = 2  # a segment in more than this many distinct docs is boilerplate

# Conf key + default for the mark-back broadcast guard. The boilerplate
# hash set is staged to parquet (distributed write, small side only) and
# broadcast ONLY if its on-disk size is under this cap; otherwise the
# mark-back falls back to a shuffle hash join. "Tiny by construction"
# is false at web scale — common trigrams ("all rights reserved",
# function-word runs) put a large fraction of distinct shingles over the
# >2-docs threshold, and an unguarded broadcast of that set OOMs every
# executor. 16 MiB of snappy-parquet md5 hashes is ~4× that in-heap;
# past it, re-exchanging the corpus by segment hash is the honest cost.
_BOILER_CAP_KEY = "spark.firstamerican.boilerplate.broadcastCapBytes"
_BOILER_CAP_DEFAULT = str(16 << 20)



@register(
    "boilerplate_segment_dedup",
    oracle=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
segs AS (
  SELECT doc_id,
         md5(array_to_string(words[s*{_SEG}+1 : least(s*{_SEG}+{_SEG}, len(words))], ' ')) AS h
  FROM (
    SELECT doc_id, words,
           unnest(generate_series(0, CAST(ceil(len(words)/{_SEG}.0) AS BIGINT) - 1)) AS s
    FROM w
  ) t
),
boiler AS (
  SELECT h AS bh FROM (
    SELECT h, count(DISTINCT doc_id) AS nd FROM segs GROUP BY 1
  ) f WHERE nd > {_SEG_DOCS}
)
SELECT s.doc_id,
       count(*) AS n_segments,
       CAST(sum(CASE WHEN b.bh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate,
       floor((count(*) - sum(CASE WHEN b.bh IS NOT NULL THEN 1 ELSE 0 END))
             / CAST(count(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS keep_ratio
FROM segs s LEFT JOIN boiler b ON s.h = b.bh
GROUP BY 1
""",
    tags=("corpus", "dedup", "boilerplate", "training-data"),
)
def boilerplate_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style cross-corpus segment dedup: cut every document into
    non-overlapping 3-word segments, hash each, and mark segments
    whose hash appears in more than 2 distinct documents as
    boilerplate (headers, navigation chrome, license blurbs — text
    repeated verbatim across a web corpus). Emits per-doc segment
    counts and the keep ratio a reassembly pass would retain.

    Scale shape: the corpus is shuffled ONLY inside the segment
    frequency aggregate (map-side partials collapse each partition to
    its distinct hashes before the exchange). The resulting boilerplate
    set is then staged to parquet (a distributed write of the SMALL
    side — the corpus never moves for this) and its measured on-disk
    size decides the mark-back strategy: under the cap
    (``spark.firstamerican.boilerplate.broadcastCapBytes``, default
    16 MiB) it is broadcast and the per-doc report is a second
    map-side-partial aggregate with zero extra corpus movement; over
    the cap — which WILL happen on a web corpus, where common trigrams
    push a large share of shingles past the >2-docs threshold — the
    mark-back is a shuffle hash join, the honest cost when the
    boilerplate set itself is too big for executor memory. Measured,
    not hoped: the earlier unconditional broadcast OOMs at 100 TB."""
    from firstamerican_etl_spark.plans.dedupplans import exploded_words

    w = exploded_words(load_table(spark, sf_dir, "documents"))
    n_segs = F.ceil(F.size("words") / float(_SEG)).cast("long")
    seg_hash = lambda s: F.md5(  # noqa: E731
        F.concat_ws(" ", F.slice(F.col("words"), s * _SEG + 1, _SEG))
    )
    segs = w.select(
        "doc_id",
        F.explode(
            F.transform(F.sequence(F.lit(0), n_segs - 1), seg_hash)
        ).alias("h"),
    )
    boiler = (
        segs.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") > _SEG_DOCS)
        .select(F.col("h").alias("bh"))
    )
    # Stage the (aggregated, filtered) boilerplate set once (content-
    # keyed: repeated invocations on unchanged inputs reuse the staged
    # set), measure it, then pick the join strategy from the
    # measurement. The frequency agg — the one unavoidable corpus
    # shuffle — runs at most once per input generation.
    import os

    from firstamerican_etl_spark.operators.scale import stage_once
    from firstamerican_etl_spark.sources.io import staging_tag

    boiler_staged, stage = stage_once(
        boiler,
        "boilerplate_set",
        reuse_key=staging_tag(sf_dir, "documents"),
        return_path=True,
    )
    staged_bytes = sum(
        e.stat().st_size
        for e in os.scandir(stage)
        if e.is_file() and e.name.endswith(".parquet")
    )
    cap = int(spark.conf.get(_BOILER_CAP_KEY, _BOILER_CAP_DEFAULT))
    if staged_bytes <= cap:
        build = F.broadcast(boiler_staged)
    else:
        # too big to broadcast: shuffle hash join (no sort — the build
        # side hashes, the corpus side exchanges by segment hash once)
        build = boiler_staged.hint("shuffle_hash")
    hit = F.col("bh").isNotNull().cast("long")
    return (
        segs.join(build, segs.h == F.col("bh"), "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(hit).alias("n_boilerplate"),
            (
                F.floor(
                    (F.count(F.lit(1)) - F.sum(hit))
                    / F.count(F.lit(1)).cast("double")
                    * F.lit(1000000.0)
                    + F.lit(0.5)
                )
                / F.lit(1000000.0)
            ).alias("keep_ratio"),
        )
    )


_BUCKETS = (8, 16, 32, 64, 128, 256, 512)


def _bucket_case_sql() -> str:
    whens = " ".join(
        f"WHEN n_tokens <= {b} THEN {b}" for b in _BUCKETS[:-1]
    )
    return f"CASE {whens} ELSE {_BUCKETS[-1]} END"


@register(
    "length_bucket_batching",
    oracle=f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
b AS (
  SELECT doc_id, n_tokens, {_bucket_case_sql()} AS bucket_len FROM t
)
SELECT bucket_len,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(bucket_len - n_tokens) AS BIGINT) AS padding_waste,
       (count(*) + greatest({_B} // bucket_len, 1) - 1) // greatest({_B} // bucket_len, 1) AS n_batches
FROM b GROUP BY 1
""",
    tags=("corpus", "batching", "length-bucket"),
)
def length_bucket_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching plan: assign each document to its
    power-of-two token bucket, then report per-bucket doc counts, the
    padding waste of padding every sequence to the bucket length, and
    how many fixed-budget (B=256-token) batches the bucket fills at
    ⌊B/bucket_len⌋ sequences per batch — the standard
    bucketing-by-length strategy that keeps padding below the naive
    pad-to-max batch layout. All integer arithmetic (bit-tight oracle);
    the bucket id is a scan-side CASE, so the only shuffle is the
    ≤|buckets|-row report aggregate."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ", -1))
    bucket = None
    for b in _BUCKETS[:-1]:
        clause = F.when(n_tokens <= b, F.lit(b))
        bucket = clause if bucket is None else bucket.when(n_tokens <= b, F.lit(b))
    bucket = bucket.otherwise(F.lit(_BUCKETS[-1]))
    t = d.select(n_tokens.alias("n_tokens"), bucket.alias("bucket_len"))
    seqs_per_batch = F.greatest(
        F.floor(F.lit(_B) / F.col("bucket_len")).cast("long"), F.lit(1).cast("long")
    )
    return (
        t.groupBy("bucket_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(F.col("bucket_len") - F.col("n_tokens")).alias("padding_waste"),
        )
        .withColumn(
            "n_batches",
            F.floor(
                (F.col("n_docs") + seqs_per_batch - 1) / seqs_per_batch
            ).cast("long"),
        )
    )


@register(
    "ngram_diversity_ratio",
    oracle="""
WITH w AS (
  SELECT string_split(text, ' ') AS ws FROM documents
),
grams AS (
  SELECT 1 AS n, g.x AS gram
  FROM w, LATERAL unnest(ws) AS g(x)
  UNION ALL
  SELECT 2, ws[g.i] || ' ' || ws[g.i + 1]
  FROM w, LATERAL unnest(range(1, len(ws))) AS g(i)
  UNION ALL
  SELECT 3, ws[g.i] || ' ' || ws[g.i + 1] || ' ' || ws[g.i + 2]
  FROM w, LATERAL unnest(range(1, len(ws) - 1)) AS g(i)
)
SELECT n,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct,
       CAST(floor(CAST(count(DISTINCT gram) AS DOUBLE) / count(*)
            * 1000000 + 0.5) AS BIGINT) AS distinct_ppm
FROM grams
GROUP BY 1
""",
    tags=("corpus", "diversity", "ngram"),
)
def ngram_diversity_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram diversity (distinct-n): distinct/total ratio for
    1/2/3-grams — the standard repetitiveness diagnostic (Li et al.
    2016's distinct-n): a templated or model-generated corpus shows
    collapsed distinct-2/distinct-3 long before humans notice, and the
    three ratios together are the cheapest corpus-health dashboard
    row alongside the Zipf spectrum.

    Exactness: all counts are integers over exact string grams; the
    ratio is one ppm-quantized division.

    Scale shape: ONE tokenize pass fanned into three gram streams. The
    split lands in its own projection and the gram arrays reference it
    as an ATTRIBUTE — CollapseProject keeps non-cheap expressions with
    multiple references un-inlined, so the text is split once per row
    (the pre-r10 form unioned three separate scans, each re-splitting
    up to 4x per row — r10 review). The struct-array explode emits the
    three (n, grams) rows per doc in the same pass; each stream is
    then a map-side-combined (n, gram) distinct + count — the same
    two-phase distinct-count recipe as count_distinct_two_phase, so no
    Expand and the shuffle carries distinct grams, not gram
    instances."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split("text", " ").alias("ws"))

    def grams_of(n: int) -> F.Column:
        if n == 1:
            return F.col("ws")
        m = F.greatest(F.size("ws") - (n - 1), F.lit(0))
        cols = [F.slice("ws", i + 1, m) for i in range(n)]
        grams = cols[0]
        for c in cols[1:]:
            grams = F.zip_with(grams, c, lambda a, b: F.concat_ws(" ", a, b))
        return grams

    streams = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("n"), grams_of(n).alias("grams")
                    )
                    for n in (1, 2, 3)
                ]
            )
        ).alias("s")
    ).select("s.n", F.explode("s.grams").alias("gram"))
    per_gram = streams.groupBy("n", "gram").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy("n").agg(
        F.sum("c").alias("n_total"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.floor(
            F.count(F.lit(1)).cast("double") / F.sum("c") * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("distinct_ppm"),
    )


@register(
    "corpus_snapshot_diff",
    oracle="""
WITH a AS (
  SELECT doc_id, md5(text) AS fp, n_chars
  FROM documents WHERE doc_id % 10 != 9
),
b AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 17 = 3 THEN text || ' v2' ELSE text END) AS fp,
         n_chars + CASE WHEN doc_id % 17 = 3 THEN 3 ELSE 0 END AS n_chars
  FROM documents WHERE doc_id % 13 != 5
),
d AS (
  SELECT CASE WHEN a.doc_id IS NULL THEN 'added'
              WHEN b.doc_id IS NULL THEN 'removed'
              WHEN a.fp <> b.fp THEN 'changed'
              ELSE 'unchanged' END AS status,
         COALESCE(a.n_chars, 0) AS ca,
         COALESCE(b.n_chars, 0) AS cb
  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
)
SELECT status,
       count(*) AS n_docs,
       CAST(sum(ca) AS BIGINT) AS chars_a,
       CAST(sum(cb) AS BIGINT) AS chars_b
FROM d GROUP BY status
""",
    tags=("corpus", "versioning", "audit", "training-data"),
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-release audit: diff two corpus versions by content
    fingerprint and report added / removed / changed / unchanged
    document counts with per-status char mass — the reproducibility
    check a training-data pipeline runs between crawl releases before
    retraining (what changed, and how much of the token budget it
    touches). Version A is the prior release (the incremental-ingest
    convention: doc_id % 10 == 9 rows are the NEW arrivals, absent
    from A); version B is the next release, with doc_id % 13 == 5
    rows retired and doc_id % 17 == 3 rows re-crawled with mutated
    content (' v2' appended — fingerprint AND char mass shift
    together, so the oracle cross-checks both signals).

    Scale shape: one parquet scan per version (column-pruned to
    doc_id/text/n_chars; the fingerprint is computed scan-side inside
    WholeStageCodegen), then ONE full-outer sort-merge join keyed on
    the unique doc_id — both sides exchange-partitioned on the same
    key, no skew possible on a unique key — feeding a map-side-partial
    aggregate over the four status groups. Nothing document-sized
    moves after the join's own exchange, and the output is 4 rows at
    any corpus size. At 100 TB the two versions are separate snapshot
    paths; here both derive from `documents` so the oracle can state
    the exact expected partition of doc_ids."""
    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 10 != 9).select(
        "doc_id",
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("fp"),
        "n_chars",
    )
    mut = F.col("doc_id") % 17 == 3
    b = docs.filter(F.col("doc_id") % 13 != 5).select(
        "doc_id",
        F.md5(
            F.encode(
                F.when(mut, F.concat(F.col("text"), F.lit(" v2"))).otherwise(
                    F.col("text")
                ),
                "UTF-8",
            )
        ).alias("fp"),
        (F.col("n_chars") + F.when(mut, F.lit(3)).otherwise(F.lit(0))).alias(
            "n_chars"
        ),
    )
    j = a.alias("a").join(
        b.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"), "full_outer"
    )
    status = (
        F.when(F.col("a.doc_id").isNull(), F.lit("added"))
        .when(F.col("b.doc_id").isNull(), F.lit("removed"))
        .when(F.col("a.fp") != F.col("b.fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            status.alias("status"),
            F.coalesce(F.col("a.n_chars"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("b.n_chars"), F.lit(0)).alias("cb"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ca").alias("chars_a"),
            F.sum("cb").alias("chars_b"),
        )
    )
