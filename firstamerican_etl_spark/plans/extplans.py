"""Extended relational surface: operators a general engine needs that
the reference never uses (SURVEY.md §7.2 step 6) plus the remaining
training-data-pipeline ops — as-of / range joins, grouping sets, exact
percentiles, pivot/unpivot, positional explode, RANGE window frames,
unionByName, embedding-cosine near-dup, and four more TPC-H-shaped
queries. Every entry carries a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from firstamerican_etl_spark.functions.stable import (
    fast_avg,
    fast_sum,
    sql_fast_sum,
    stable_round,
    stable_sum,
)

from firstamerican_etl_spark.plans.registry import register
from firstamerican_etl_spark.sources.io import load_table, local_df, staging_tag


# ----------------------------------------------------------- as-of join

@register(
    "asof_join_events_orders",
    oracle="""
WITH o AS (  -- one row per (custkey, orderdate): deterministic as-of target
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts,
       o.o_orderkey AS matched_orderkey, o.o_orderdate AS matched_orderdate
FROM events e
ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
""",
    tags=("join", "asof", "events"),
)
def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native operator): each event picks the
    most recent order at-or-before its timestamp for the same user.

    Union-merge formulation — the scale path: tag both sides, union on
    a common layout, sort per key by (ts, side) and forward-fill the
    order fields with last(ignorenulls); event rows then carry their
    as-of match. ONE shuffle + sort over |events| + |orders| rows,
    versus the naive range-predicate join whose intermediate is
    sum-over-events(#earlier orders) rows (~10x slower at sf0.1, and
    quadratic-ish for dense per-key history). Orders are pre-deduped
    per (custkey, date) so the winner is unique; orders sort before
    events at equal timestamps, making the match inclusive (<=) like
    the oracle's ASOF."""
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_ev")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _asof_tagged_union(spark, sf_dir)
        .withColumn("mk", F.last("okr", ignorenulls=True).over(w))
        .withColumn("md", F.last("odr", ignorenulls=True).over(w))
        .filter(F.col("is_ev") == 1)
        .select(
            "event_id", "user_id", "ts",
            F.col("mk").alias("matched_orderkey"),
            F.col("md").alias("matched_orderdate"),
        )
    )


def _asof_tagged_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared construction for the as-of family (backward / forward /
    nearest): orders deduped to one row per (custkey, orderdate) so the
    as-of winner is unique, then both sides projected onto ONE tagged
    layout (k, t, is_ev, event payload, order payload) and unioned.
    The directional operators differ only in window frame direction,
    fill function (last-preceding vs first-following), and the equal-ts
    tie order of is_ev."""
    ev = load_table(spark, sf_dir, "events")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    null_l = lambda t: F.lit(None).cast(t)  # noqa: E731
    left = ev.select(
        F.col("user_id").alias("k"), F.col("ts").alias("t"),
        F.lit(1).alias("is_ev"), "event_id", "user_id", "ts",
        null_l("long").alias("okr"), null_l("timestamp_ntz").alias("odr"),
    )
    right = o.select(
        F.col("o_custkey").alias("k"), F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_ev"), null_l("long").alias("event_id"),
        null_l("long").alias("user_id"), null_l("timestamp_ntz").alias("ts"),
        F.col("o_orderkey").alias("okr"), F.col("o_orderdate").alias("odr"),
    )
    return left.unionByName(right)


# ---------------------------------------------------------- range join

# Int literals to match the declared "lo BIGINT, hi BIGINT" DDL below:
# float literals here passed locally only because Arrow silently cast
# float64→int64, and failed on the driver's Arrow-off session (r10 red
# row). local_df now coerces dtypes either way; keep these exact.
_BANDS = [
    ("tiny", 0, 10),
    ("small", 10, 25),
    ("medium", 25, 40),
    ("large", 40, 10**9),
]


@register(
    "range_join_quantity_bands",
    oracle="""
WITH bands(band, lo, hi) AS (
  VALUES ('tiny', 0.0, 10.0), ('small', 10.0, 25.0),
         ('medium', 25.0, 40.0), ('large', 40.0, 1e9)
)
SELECT b.band,
       count(*) AS n_items,
       floor((CAST(sum(CAST(floor((l_extendedprice) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS revenue
FROM lineitem l JOIN bands b ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
GROUP BY 1
""",
    tags=("join", "range", "broadcast"),
)
def range_join_quantity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join against a banding dimension. The dim is rows,
    not data — broadcast it and the range join becomes a broadcast
    nested-loop with zero shuffle of the fact side; never let a theta
    join against a small dim plan as a cartesian over a shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    bands = local_df(spark, _BANDS, "band STRING, lo BIGINT, hi BIGINT")
    return (
        li.join(
            F.broadcast(bands),
            (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            fast_sum(F.col("l_extendedprice")).alias("revenue"),
        )
    )


# ------------------------------------------------------- grouping sets

@register(
    "grouping_sets_agg",
    oracle="""
SELECT n_name, r_name,
       CAST(grouping(n_name) AS INTEGER) AS g_nation,
       CAST(grouping(r_name) AS INTEGER) AS g_region,
       count(*) AS n_customers,
       floor((CAST(sum(CAST(floor((c_acctbal) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS sum_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((n_name), (r_name), ())
""",
    tags=("agg", "grouping-sets"),
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer than cube/rollup, already covered):
    per-nation, per-region, and grand-total aggregates in one pass —
    one shuffle, Spark expands the sets map-side."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    base = c.join(n, c.c_nationkey == n.n_nationkey).join(
        r, n.n_regionkey == r.r_regionkey
    )
    return base.groupingSets(
        [["n_name"], ["r_name"], []], "n_name", "r_name"
    ).agg(
        F.grouping("n_name").cast("int").alias("g_nation"),
        F.grouping("r_name").cast("int").alias("g_region"),
        F.count(F.lit(1)).alias("n_customers"),
        fast_sum(F.col("c_acctbal")).alias("sum_bal"),
    )


# --------------------------------------------------- exact percentiles

@register(
    "exact_percentiles",
    oracle="""
SELECT l_returnflag,
       floor(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE) * 10000 + 0.5) / 10000 AS p50_price,
       floor(CAST(quantile_cont(l_extendedprice, 0.9) AS DOUBLE) * 10000 + 0.5) / 10000 AS p90_price,
       floor(CAST(quantile_cont(l_discount, 0.5) AS DOUBLE) * 10000 + 0.5) / 10000 AS p50_discount
FROM lineitem
GROUP BY 1
""",
    tags=("agg", "percentile"),
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (linear interpolation — same
    definition as DuckDB's quantile_cont). Exact percentile sorts per
    group; at 100 TB switch callers to approx_percentile (t-digest,
    mergeable, one pass) — kept exact here because the oracle is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    # stable_round, not engine ROUND-on-double: interpolated
    # percentiles can land anywhere, and Spark's shortest-string
    # HALF_UP vs DuckDB's binary rounding diverge near 1e-4 ties
    return li.groupBy("l_returnflag").agg(
        stable_round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50_price"),
        stable_round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
        stable_round(F.percentile("l_discount", F.lit(0.5)), 4).alias("p50_discount"),
    )


# ------------------------------------------------------- pivot/unpivot

@register(
    "pivot_status_by_year",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       floor((CAST(sum(CAST(floor((CASE WHEN o_orderstatus='O' THEN o_totalprice END) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS status_O,
       floor((CAST(sum(CAST(floor((CASE WHEN o_orderstatus='F' THEN o_totalprice END) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS status_F,
       floor((CAST(sum(CAST(floor((CASE WHEN o_orderstatus='P' THEN o_totalprice END) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS status_P
FROM orders
GROUP BY 1
""",
    tags=("pivot", "agg"),
)
def pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide reshape): revenue per year × order status. The value
    list is DECLARED — an undeclared pivot triggers a driver-side
    distinct scan to discover columns, a hidden extra job at scale."""
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(fast_sum(F.col("o_totalprice")))
    )
    return piv.select(
        "order_year",
        F.col("O").alias("status_O"),
        F.col("F").alias("status_F"),
        F.col("P").alias("status_P"),
    )


@register(
    "unpivot_part_attrs",
    oracle="""
SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS attr, CAST(p_retailprice AS DOUBLE) AS val FROM part
""",
    tags=("unpivot", "melt"),
)
def unpivot_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (long reshape) — the relational form of the
    reference's manual 3-projection unpivot of ValHist (fa-etl.py:
    325-346): one narrow pass, no join, no shuffle."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "attr", "val")


# -------------------------------------------------- positional explode

@register(
    "posexplode_tokens",
    oracle="""
SELECT d.doc_id, CAST(g.i - 1 AS INTEGER) AS pos, list_extract(d.words, g.i) AS token
FROM (SELECT doc_id, string_split(text, ' ') AS words
      FROM documents WHERE doc_id < 50) d,
     LATERAL unnest(generate_series(1, len(d.words))) AS g(i)
""",
    tags=("explode", "array", "text"),
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode of tokenized text — the array⇄rows bridge
    (generator expression, pipelined in whole-stage codegen: no shuffle,
    no state)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )


# ----------------------------------------------------- RANGE frame window

@register(
    "window_range_frame",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       floor((CAST(sum(CAST(floor((o_totalprice) * 100 + 0.5) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE) / 100) * 100 + 0.5) / 100
       AS spend_30d
FROM orders
""",
    tags=("window", "range-frame"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: per-customer trailing-30-day spend.
    Spark's rangeBetween needs a numeric ordering key → order by epoch
    seconds with a ±seconds frame (identical semantics to the SQL
    interval frame, peers included)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        stable_round(
            F.sum(
                F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
                    "long"
                )
            )
            .over(w)
            .cast("double")
            / 100
        ).alias("spend_30d"),
    )


@register(
    "global_row_index_scalable",
    oracle="""
SELECT o_orderkey, o_custkey,
       row_number() OVER (ORDER BY o_orderkey) - 1 AS row_idx
FROM orders
""",
    tags=("sort", "zipwithindex", "scale"),
)
def global_row_index_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global row numbering the scalable way (operators/scale.py
    global_row_index): range-partition + sort, per-partition counts
    prefix-summed into offsets, Arrow-batched local ordinals — one
    range exchange instead of the single-task global-window sort the
    naive row_number() OVER (ORDER BY ...) plans. The oracle IS that
    naive form — fine single-node, a faceplant at 100 TB."""
    from firstamerican_etl_spark.operators.scale import global_row_index

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return global_row_index(o, "o_orderkey")


@register(
    "global_running_sum_scalable",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       CAST(sum(len(string_split(text, ' '))) OVER (
         ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS running_tokens
FROM documents
""",
    tags=("sort", "prefix-sum", "scale"),
)
def global_running_sum_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global running sum the scalable way (operators/scale.py
    global_running_sum — the recipe behind corpus_pack_contiguous):
    range-partition + per-shard cumsum + driver prefix-sum of shard
    totals, one range exchange total. The oracle IS the naive
    unpartitioned running window — fine single-node, a single-task
    collapse at 100 TB. Registered standalone so the driver checks the
    primitive itself, row for row, not only its packed aggregate."""
    from firstamerican_etl_spark.operators.scale import global_running_sum

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ", -1)).alias("n_tokens")
    )
    return global_running_sum(d, "doc_id", "n_tokens", out_col="running_tokens")


# --------------------------------------------------------- unionByName

@register(
    "union_by_name",
    oracle="""
SELECT o_orderstatus, count(*) AS n, count(DISTINCT o_custkey) AS n_custs
FROM orders GROUP BY 1
""",
    tags=("setop", "unionByName"),
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName across differently-ordered column layouts — the
    multi-county staging union the reference left as a TODO
    (fa-etl.py:581-582): files from different vintages present columns
    in different orders; positional union would silently cross-wire
    them, name-based union is the correct operator."""
    o = load_table(spark, sf_dir, "orders")
    even = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    odd = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderstatus", "o_orderkey", "o_custkey"  # different order
    )
    return (
        even.unionByName(odd)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("o_custkey").alias("n_custs"),
        )
    )


# -------------------------------------------- embedding cosine near-dup

@register(
    "dedup_embedding_cosine",
    oracle="""
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       floor(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE) * 10000 + 0.5) / 10000 AS cosine
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE floor(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE) * 10000 + 0.5) / 10000 >= 0.5
""",
    tags=("dedup", "embedding", "cosine", "blocked", "contrast"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, label-blocked.

    **CONTRAST ROW (r10)** — the 10x probe measured this at
    17.0x/decade, the probe's third real super-linear catch. The
    blocking key (`label`) has FIXED cardinality (10 distinct values in
    the corpus), so 10x vectors means 10x members per block and ~100x
    within-block pair evaluations: Sigma k^2 with k ~ N/|labels| is
    quadratic no matter how cheap the kernel is. Kept registered as the
    exact-semantics oracle anchor at window scale and for the
    anti-pattern table (SCALING.md); excluded from the driver window
    and the headline bench. The production paths are the measured
    scale-safe twins whose candidate volume grows with CONTENT, not
    corpus size: ``semdedup_cluster_prune_sqrtk`` (sqrt(N) kmeans
    cells, 1.2x/decade) for embedding near-dup pruning and
    ``multimodal_knn_bucketed``/``knn_lsh_bucketed`` for bucketed
    candidate generation.

    The original scale note claimed "block first, never all-pairs" —
    true, but insufficient: blocking only helps if the block-key
    cardinality GROWS with N (sqrt(N) cells, LSH buckets sized to the
    corpus). A fixed-cardinality key merely delays the quadratic."""
    # norms are computed ONCE PER VECTOR before the join: folding
    # sqrt(sum(x^2)) on the post-join pair rows would re-evaluate each
    # vector's fold k-1 times inside a k-sized label block (pairs ~
    # k^2/2) — on dense blocks the dominant cost of the operator
    nrm_of = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn("nrm", nrm_of(F.col("v")))
    a = e.select(
        F.col("vec_id").alias("vec_id_a"), "label",
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_id_b"), "label",
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    # stable_round, never engine round-on-double: Spark's ROUND goes
    # through the shortest decimal string (HALF_UP on the printed
    # digits) while DuckDB rounds the binary value — a cosine printing
    # as '0.49995' would be KEPT by Spark and dropped by the oracle at
    # the 0.5 threshold (functions/stable.py header class)
    pairs = (
        a.join(b, on="label")
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .withColumn(
            "cosine",
            stable_round(dot / (F.col("na") * F.col("nb")), 4),
        )
        .filter(F.col("cosine") >= 0.5)
    )
    return pairs.select("vec_id_a", "vec_id_b", "cosine")


# ------------------------------------------------------------ TPC-H 4/6/10/12

@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY 1
""",
    tags=("tpch", "semi-join"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join (no row multiplication,
    build side shrinks to distinct keys) then count by priority."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qualified = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return qualified.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q6_revenue_forecast",
    oracle="""
SELECT floor((CAST(sum(CAST(floor((l_extendedprice * l_discount) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= DATE '2023-01-01' AND l_shipdate < DATE '2024-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
""",
    tags=("tpch", "scan-agg", "pushdown"),
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate. All three predicates
    push to the parquet reader (row-group stats skip); the agg is a
    map-side partial + single-row final — the minimal-shuffle query."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("2023-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("2024-01-01").cast("date"))
            & F.col("l_discount").between(0.02, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            fast_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, n_name,
       {sql_fast_sum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("tpch", "multijoin", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue, top 20 customers.
    lineitem filters before the join (predicate pushdown), nation
    broadcasts, global top-k is a TakeOrdered (no full sort)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            fast_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q12_priority_by_status",
    oracle="""
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1
""",
    tags=("tpch", "join-agg", "conditional"),
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional counts (the CASE-inside-sum
    idiom compiles to a single-pass codegen'd aggregate)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ------------------------------------------------- bucketed co-located join

@register(
    "bucketed_join_colocated",
    oracle="""
SELECT o_orderstatus,
       count(*) AS n_lines,
       floor((CAST(sum(CAST(floor((l_extendedprice) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
""",
    tags=("scale", "bucketing", "join"),
)
def bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join over tables bucketed on the join key (operators/scale.py):
    the shuffle happened once at write time; the join itself is
    verified shuffle-free (join_is_colocated asserts it — a silently
    re-shuffling "bucketed" join is a bug, not a slow path). This is
    the staging layout the 100 TB join cascade assumes: staged tables
    bucketed by PropertyID, every downstream (PropertyID, Year) join
    exchange-free."""
    from firstamerican_etl_spark.operators.scale import (
        join_is_colocated,
        stage_bucketed_tables,
        write_bucketed,
    )

    # shared bucketed-staging protocol (operators/scale.
    # stage_bucketed_tables): both tables restage together unless the
    # tag matches AND both are catalogued AND both data dirs are on
    # disk — a crash between the two writes (or OS tmp cleanup under
    # the persistent derby metastore) used to leave a half-staged
    # state the old single-table existence check treated as complete.
    # Per-process stage dirs also end the cross-process hazard the old
    # shared-/tmp layout had (one process's restage deleting the dir
    # another process's catalog still points at).
    tag = staging_tag(sf_dir, "orders", "lineitem")
    ob, lb = f"orders_bk_{tag}", f"lineitem_bk_{tag}"
    stage_bucketed_tables(
        spark,
        "bucketed_join",
        tag,
        [
            (
                ob,
                lambda path: write_bucketed(
                    load_table(spark, sf_dir, "orders"),
                    ob, ["o_orderkey"], 8, path=path,
                    sort_by=["o_orderkey"],
                ),
            ),
            (
                lb,
                lambda path: write_bucketed(
                    load_table(spark, sf_dir, "lineitem"),
                    lb, ["l_orderkey"], 8, path=path,
                    sort_by=["l_orderkey"],
                ),
            ),
        ],
    )
    o = spark.table(ob)
    li = spark.table(lb)
    # MERGE hint, not a session-conf flip: at test scale the planner
    # would broadcast the small side and hide the bucket co-location
    # this query exists to prove. The hint is plan-scoped — no mutation
    # of spark.sql.autoBroadcastJoinThreshold, so concurrent queries in
    # the same session are unaffected (the old conf set/restore was not
    # thread-safe).
    joined = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
    assert join_is_colocated(joined), "bucketed join re-shuffled"
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        fast_sum(F.col("l_extendedprice")).alias("revenue"),
    )


# ------------------------------------------- correlated-subquery shapes

@register(
    "q2_min_cost_supplier",
    oracle="""
WITH costs AS (
  SELECT p_partkey, s_suppkey, s_name, s_acctbal, p_retailprice * 0.9 AS supply_cost
  FROM part JOIN supplier ON p_partkey % 10 = s_suppkey
)
SELECT c.p_partkey, c.s_name,
       floor(CAST(c.supply_cost AS DOUBLE) * 100 + 0.5) / 100 AS supply_cost
FROM costs c
JOIN (SELECT p_partkey, min(supply_cost) AS mc FROM costs GROUP BY 1) m
  ON c.p_partkey = m.p_partkey AND c.supply_cost = m.mc
""",
    tags=("tpch", "correlated-subquery", "min-per-group"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the correlated min-subquery ('supplier with the
    minimum cost for the part') decorrelated into agg + self-join —
    exactly how Catalyst rewrites the correlated form, expressed
    directly so the shuffle story is visible: both sides key on
    p_partkey, one exchange each."""
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    costs = p.join(s, p.p_partkey % 10 == s.s_suppkey).select(
        "p_partkey", "s_suppkey", "s_name",
        (F.col("p_retailprice") * 0.9).alias("supply_cost"),
    )
    mins = costs.groupBy("p_partkey").agg(F.min("supply_cost").alias("mc"))
    return (
        costs.join(mins, on="p_partkey")
        .filter(F.col("supply_cost") == F.col("mc"))
        .select(
            "p_partkey",
            "s_name",
            stable_round(F.col("supply_cost")).alias("supply_cost"),
        )
    )


@register(
    "q18_large_orders",
    oracle="""
SELECT c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_date, sum_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150
) big
JOIN orders   ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
""",
    tags=("tpch", "having", "in-subquery"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery over a HAVING aggregate, expressed
    as agg→filter→join (the semi-join collapses into the equi-join
    since the aggregate already has one row per key)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_date"),
            "sum_qty",
        )
    )


# -------------------------------------------------- data-quality profile

@register(
    "table_profile",
    oracle="""
SELECT count(*) AS n_rows,
       count(o_custkey) AS custkey_nonnull,
       count(DISTINCT o_custkey) AS custkey_distinct,
       count(DISTINCT o_orderstatus) AS status_distinct,
       CAST(min(o_orderdate) AS DATE) AS min_date,
       CAST(max(o_orderdate) AS DATE) AS max_date,
       floor((CAST(sum(CAST(floor((o_totalprice) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 / count(o_totalprice)) * 100 + 0.5) / 100 AS avg_price
FROM orders
""",
    tags=("profile", "quality", "agg"),
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profile (the QA stage every training-data
    pipeline runs before ingest): row count, per-column null/distinct
    cardinality, ranges. One job, one reduce — at 100 TB swap the
    exact distincts for approx_count_distinct and keep the pass
    single."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("custkey_nonnull"),
        F.countDistinct("o_custkey").alias("custkey_distinct"),
        F.countDistinct("o_orderstatus").alias("status_distinct"),
        F.min(F.col("o_orderdate").cast("date")).alias("min_date"),
        F.max(F.col("o_orderdate").cast("date")).alias("max_date"),
        fast_avg(F.col("o_totalprice")).alias("avg_price"),
    )


# ------------------------------------------------------ text normalize

@register(
    "text_normalize",
    oracle="""
SELECT doc_id,
       lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm_text,
       regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS alnum_only,
       md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS norm_hash
FROM documents WHERE doc_id < 100
""",
    tags=("text", "normalize"),
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization (whitespace collapse, casefold, alnum
    filter, canonical hash) — the pre-dedup cleaning stage; pure
    codegen'd string expressions, zero shuffle."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return d.select(
        "doc_id",
        norm.alias("norm_text"),
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "").alias("alnum_only"),
        F.md5(norm).alias("norm_hash"),
    )


# ------------------------------------------------------------- ntile

@register(
    "ntile_price_quartiles",
    oracle="""
SELECT o_orderkey, quartile, count(*) OVER (PARTITION BY quartile) AS n_in_quartile
FROM (
  SELECT o_orderkey, ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
  FROM orders
)
""",
    tags=("window", "ntile"),
)
def ntile_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile binning via ntile — global ORDER BY window (single
    partition: the one window shape that does NOT scale horizontally.
    Registered as the documented CONTRAST to ``quantile_bins_scalable``
    below, which computes the same family of bins with distributed
    cutpoints + a broadcast range assignment — reach for that at
    100 TB; this one exists because users will type ntile)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    binned = o.select(
        "o_orderkey", F.ntile(4).over(w).alias("quartile")
    )
    wq = Window.partitionBy("quartile")
    return binned.select(
        "o_orderkey", "quartile", F.count(F.lit(1)).over(wq).alias("n_in_quartile")
    )


@register(
    "quantile_bins_scalable",
    oracle="""
WITH r AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS v,
         row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
),
cut AS (
  SELECT max(CASE WHEN rn = greatest(n // 4, 1) THEN v END) AS c1,
         max(CASE WHEN rn = greatest((2 * n) // 4, 1) THEN v END) AS c2,
         max(CASE WHEN rn = greatest((3 * n) // 4, 1) THEN v END) AS c3
  FROM r
)
SELECT CASE WHEN CAST(o_totalprice AS DOUBLE) <= c1 THEN 1
            WHEN CAST(o_totalprice AS DOUBLE) <= c2 THEN 2
            WHEN CAST(o_totalprice AS DOUBLE) <= c3 THEN 3
            ELSE 4 END AS quartile,
       count(*) AS n_orders,
       floor(CAST(min(o_totalprice) AS DOUBLE) * 100 + 0.5) / 100 AS lo,
       floor(CAST(max(o_totalprice) AS DOUBLE) * 100 + 0.5) / 100 AS hi
FROM orders, cut
GROUP BY 1
""",
    tags=("window", "quantile", "scale", "range-join"),
)
def quantile_bins_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile binning WITHOUT a global ORDER BY window — the 100 TB
    shape the ``ntile_price_quartiles`` docstring promises:

    1. exact quartile CUTPOINTS via the rank-targeted recipe
       (``operators/scale.values_at_global_ranks``: literal-cutpoint
       shard ids + a |shards|-row count prefix-sum locating each
       boundary rank ⌊i·n/4⌋, then ONE partitioned-window pass
       filtered to those 3 ordinals — never one task, never a full
       row-index materialization);
    2. bin ASSIGNMENT as a pure broadcast range comparison against the
       3 literal cutpoints (the degenerate broadcast range join — for
       k≫4 bins this becomes a real broadcast non-equi join on a bins
       table), then one ordinary aggregate per bin.

    Ties at a cutpoint value fall into the lower bin by VALUE on both
    engines, so the oracle matches bit-exactly (comparisons only, no
    arithmetic on the cutpoints). At sketch-tolerant scale, step 1
    swaps for a one-pass ``approx_percentile``; step 2 is unchanged."""
    from firstamerican_etl_spark.operators.scale import quartile_cutpoints

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("v")
    )
    # exact boundary values via the shared rank-targeted quartile
    # helper (shard counts + a PARTITIONED window filtered to the 3
    # boundary ordinals) — the input is a deterministic parquet scan,
    # so no staging pin is needed, and the row count is read off the
    # pass's own shard sizes (no separate count() action).
    vals = quartile_cutpoints(o, ["v", "o_orderkey"])
    if vals is None:  # empty input: no cutpoints to take — empty report
        return o.select(
            F.lit(1).alias("quartile"),
            F.lit(0).cast("long").alias("n_orders"),
            F.lit(0.0).alias("lo"),
            F.lit(0.0).alias("hi"),
        ).limit(0)
    c1, c2, c3 = (float(v) for v in vals)
    quartile = (
        F.when(F.col("v") <= F.lit(c1), 1)
        .when(F.col("v") <= F.lit(c2), 2)
        .when(F.col("v") <= F.lit(c3), 3)
        .otherwise(4)
    )
    return (
        o.groupBy(quartile.alias("quartile"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            stable_round(F.min("v")).alias("lo"),
            stable_round(F.max("v")).alias("hi"),
        )
    )


@register(
    "quantile_bins_approx",
    oracle=None,  # sketch cutpoints are engine-specific → rows-only;
    # tests/test_approx_accuracy.py pins bin balance vs the exact path
    tags=("window", "quantile", "sketch", "scale"),
)
def quantile_bins_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ONE-PASS sibling of ``quantile_bins_scalable``: cutpoints
    from ``approx_percentile`` (a mergeable GK/KLL-style sketch — one
    aggregate over the table, 3 numbers out, NO range exchange at all)
    instead of exact distributed ranks; the broadcast-literal CASE
    assignment and the per-bin report are identical. This is the shape
    to reach for first at 100 TB when rank-exact boundaries aren't
    required: the exact variant pays a full range shuffle for its
    cutpoints, this one pays a scan. Sketch values are engine-specific
    so there is no SQL oracle; the accuracy contract (each bin within
    a few percent of N/4) is pinned in tests/test_approx_accuracy.py."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("v")
    )
    cuts = o.agg(
        F.percentile_approx(
            "v", [0.25, 0.5, 0.75], accuracy=10_000
        ).alias("c")
    ).collect()[0]["c"]
    if not cuts:  # empty input
        return o.select(
            F.lit(1).alias("quartile"),
            F.lit(0).cast("long").alias("n_orders"),
            F.lit(0.0).alias("lo"),
            F.lit(0.0).alias("hi"),
        ).limit(0)
    c1, c2, c3 = (float(c) for c in cuts)
    quartile = (
        F.when(F.col("v") <= F.lit(c1), 1)
        .when(F.col("v") <= F.lit(c2), 2)
        .when(F.col("v") <= F.lit(c3), 3)
        .otherwise(4)
    )
    return (
        o.groupBy(quartile.alias("quartile"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            stable_round(F.min("v")).alias("lo"),
            stable_round(F.max("v")).alias("hi"),
        )
    )


@register(
    "histogram_width_bucket",
    oracle="""
SELECT CAST(least(floor(o_totalprice / 25000) + 1, 21) AS BIGINT) AS bin,
       count(*) AS n_orders,
       floor(CAST(min(o_totalprice) AS DOUBLE) * 100 + 0.5) / 100 AS bin_min,
       floor(CAST(max(o_totalprice) AS DOUBLE) * 100 + 0.5) / 100 AS bin_max
FROM orders
GROUP BY 1
""",
    tags=("agg", "histogram", "width-bucket"),
)
def histogram_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket (SQL:2016) — the
    one-pass distribution profile used for skew detection and range
    partition planning. A single aggregate on the bucket id; the
    per-bin min/max bounds come along free in the same pass. The
    oracle spells the equivalent floor-arithmetic (DuckDB has no
    width_bucket) INCLUDING width_bucket's overflow clamp — values at
    or above the upper bound land in bin num_buckets+1 = 21 on both
    engines, so the formulations agree for ANY price range (TPC-H
    o_totalprice exceeds 500k at larger SFs; nothing enforces the
    histogram's nominal range)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket(F.col("o_totalprice"), F.lit(0), F.lit(500000), F.lit(20)).alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            stable_round(F.min("o_totalprice").cast("double")).alias("bin_min"),
            stable_round(F.max("o_totalprice").cast("double")).alias("bin_max"),
        )
    )


@register(
    "hll_mergeable_rollup",
    oracle=None,  # Datasketches HLL binary sketches have no DuckDB equivalent;
    # determinism + the exactness-vs-truth property are pinned in tests.
    tags=("agg", "sketch", "hll", "mergeable"),
)
def hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (Apache DataSketches HLL): per-day
    sketches of distinct users, unioned upward for the global
    estimate. THE pattern for distinct-counts at 100 TB: sketches are
    a few KB, merge associatively (partial agg map-side), and —
    unlike exact countDistinct — re-aggregate to coarser grains
    without rescanning raw data. Emits per-day estimates plus a
    'total' row from the sketch union."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", F.col("ts")).alias("day_b")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    per_day = daily.select(
        F.col("day_b").cast("string").alias("grain"),
        F.hll_sketch_estimate("sk").alias("approx_users"),
        "n_events",
    )
    total = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.sum("n_events").alias("n_events"),
    ).select(F.lit("total").alias("grain"), "approx_users", "n_events")
    return per_day.unionByName(total)


@register(
    "approx_percentiles_sketch",
    oracle=None,  # KLL-style quantile sketches are engine-specific;
    # accuracy-vs-exact bounds are pinned in tests.
    tags=("agg", "sketch", "percentile"),
)
def approx_percentiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via percentile_approx (Greenwald-Khanna
    style sketch, accuracy 10000): the single-pass mergeable
    alternative to exact percentile's full sort at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50"),
        F.percentile_approx("l_extendedprice", 0.9, 10000).alias("p90"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("p99"),
    )


@register(
    "asof_join_forward",
    oracle="""
WITH o AS (  -- one row per (custkey, orderdate): deterministic target
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts,
       o.o_orderkey AS next_orderkey, o.o_orderdate AS next_orderdate
FROM events e
ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
""",
    tags=("join", "asof", "forward", "events"),
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — each event picks the EARLIEST order
    at-or-after its timestamp for the same user: the attribution
    direction ("which conversion followed this touch?") where the
    backward twin answers state-as-of ("which order was live at this
    event?"). Same union-merge scale shape as the backward operator —
    ONE shuffle + per-key sort over |events| + |orders| rows, no
    range-predicate blow-up — mirrored: the running frame looks
    FORWARD (currentRow → unboundedFollowing) and takes
    first(ignorenulls); at equal timestamps events sort BEFORE orders
    (is_ev descending) so the match is inclusive (>=) exactly like
    the oracle's ASOF e.ts <= o.date."""
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t").asc(), F.col("is_ev").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        _asof_tagged_union(spark, sf_dir)
        .withColumn("mk", F.first("okr", ignorenulls=True).over(w))
        .withColumn("md", F.first("odr", ignorenulls=True).over(w))
        .filter(F.col("is_ev") == 1)
        .select(
            "event_id", "user_id", "ts",
            F.col("mk").alias("next_orderkey"),
            F.col("md").alias("next_orderdate"),
        )
    )


@register(
    "asof_join_nearest",
    oracle="""
WITH o AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY 1, 2
),
back AS (
  SELECT e.event_id, e.user_id, e.ts,
         o.o_orderkey AS bk, o.o_orderdate AS bd
  FROM events e
  ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
),
fwd AS (
  SELECT e.event_id, o.o_orderkey AS fk, o.o_orderdate AS fd
  FROM events e
  ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
)
SELECT b.event_id, b.user_id, b.ts,
       CASE
         WHEN b.bk IS NULL THEN f.fk
         WHEN f.fk IS NULL THEN b.bk
         WHEN CAST(floor(epoch(b.ts)) AS BIGINT) - CAST(floor(epoch(b.bd)) AS BIGINT)
              <= CAST(floor(epoch(f.fd)) AS BIGINT) - CAST(floor(epoch(b.ts)) AS BIGINT)
         THEN b.bk ELSE f.fk
       END AS nearest_orderkey
FROM back b JOIN fwd f USING (event_id)
""",
    tags=("join", "asof", "nearest", "events"),
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join — the third direction, completing the
    family (backward = state-as-of, forward = next-conversion,
    nearest = sensor-alignment: pair each event with the closest
    order in time either way, ties to the backward side like pandas
    merge_asof(direction='nearest')). Composed from the two
    union-merge passes — each is one shuffle + per-key sort — joined
    on event_id; the distance compare runs in epoch seconds (integer,
    engine-exact). No native engine has a nearest ASOF (DuckDB's is
    directional too — the oracle composes it the same way), so the
    composition IS the operator."""
    back = asof_join_events_orders(spark, sf_dir).select(
        "event_id", "user_id", "ts",
        F.col("matched_orderkey").alias("bk"),
        F.col("matched_orderdate").alias("bd"),
    )
    fwd = asof_join_forward(spark, sf_dir).select(
        "event_id",
        F.col("next_orderkey").alias("fk"),
        F.col("next_orderdate").alias("fd"),
    )
    j = back.join(fwd, "event_id")
    ts_s = F.unix_timestamp("ts")
    nearest = (
        F.when(F.col("bk").isNull(), F.col("fk"))
        .when(F.col("fk").isNull(), F.col("bk"))
        .when(
            ts_s - F.unix_timestamp("bd") <= F.unix_timestamp("fd") - ts_s,
            F.col("bk"),
        )
        .otherwise(F.col("fk"))
    )
    return j.select("event_id", "user_id", "ts", nearest.alias("nearest_orderkey"))
