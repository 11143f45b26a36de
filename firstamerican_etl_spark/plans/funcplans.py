"""Scalar/aggregate function breadth beyond the reference's F1-F14:
deterministic mode, median, sorted set aggregation (array-valued
results), regexp extract-all, and blocked Levenshtein string
similarity. All full DuckDB oracles — including the array-valued one
(the harness compares nested lists element-wise).

The reference uses no regex, no arrays, no string-distance functions
(SURVEY.md §2.8 "No math beyond division, no regex"); these are the
general-engine additions a data-cleaning workload reaches for first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from firstamerican_etl_spark.functions.stable import stable_round
from firstamerican_etl_spark.plans.registry import register
from firstamerican_etl_spark.sources.io import load_table


@register(
    "modal_quantity_per_flag",
    oracle="""
WITH counts AS (
  SELECT l_returnflag, l_quantity, count(*) AS n
  FROM lineitem GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY l_returnflag ORDER BY n DESC, l_quantity
  ) AS rn FROM counts
)
SELECT l_returnflag,
       floor(CAST(l_quantity AS DOUBLE) * 100 + 0.5) / 100 AS modal_quantity,
       n AS modal_count
FROM ranked WHERE rn = 1
""",
    tags=("agg", "mode"),
)
def modal_quantity_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode per group: value-count aggregate →
    row_number(count DESC, value ASC) — spelled out instead of the
    built-in mode() because engines break frequency ties differently;
    this formulation has ONE answer everywhere. Two hash aggregates +
    one window on the (tiny) distinct-value table."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("l_quantity")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            stable_round(F.col("l_quantity").cast("double")).alias("modal_quantity"),
            F.col("n").alias("modal_count"),
        )
    )


@register(
    "agg_collect_set_sorted",
    oracle="""
SELECT o_orderpriority,
       array_to_string(list_sort(list(DISTINCT o_orderstatus)), ' ') AS statuses,
       count(DISTINCT o_orderstatus) AS n_statuses,
       count(*) AS n_orders
FROM orders GROUP BY 1
""",
    tags=("agg", "collect-set", "array-result"),
)
def agg_collect_set_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-valued aggregation: the distinct status set per priority,
    SORTED so the set is canonical (collect_set order is partition-
    dependent — never emit it unsorted from a distributed engine), then
    joined to a single string: the r11 driver run showed the harness's
    pandas canonicalizer (sort_values over all columns) cannot hash
    list cells, so window-eligible queries emit only scalar columns
    (pinned registry-wide by tests/test_registry_window.py)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), " ").alias(
            "statuses"
        ),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "regexp_extract_numbers",
    oracle="""
SELECT event_id,
       len(regexp_extract_all(props, '[0-9]+')) AS n_numbers,
       regexp_extract_all(props, '[0-9]+')[1] AS first_number
FROM events
""",
    tags=("string", "regex"),
)
def regexp_extract_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all over the props payload: every numeric token
    plus the first one — the generic salvage path when a field is not
    clean JSON. Pure map stage, JVM regex, zero shuffles."""
    e = load_table(spark, sf_dir, "events")
    nums = F.regexp_extract_all("props", F.lit("([0-9]+)"), 1)
    return e.select(
        "event_id",
        F.size(nums).alias("n_numbers"),
        # try_element_at, not element_at: a digit-free props row yields
        # an EMPTY array, and under the driver's ANSI-on session
        # element_at(empty, 1) is INVALID_ARRAY_INDEX while the oracle's
        # [1] returns NULL (r10 review; latent — every fixture props
        # carries a digit today)
        F.try_element_at(nums, F.lit(1)).alias("first_number"),
    )


@register(
    "levenshtein_similar_parts",
    oracle="""
WITH names AS (
  SELECT DISTINCT p_name,
         string_split(p_name, ' ')[-1] AS block_key
  FROM part
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS dist
FROM names a JOIN names b
  ON a.block_key = b.block_key AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 3
""",
    tags=("string", "levenshtein", "blocked-join"),
)
def levenshtein_similar_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance matching: distinct part names self-joined
    ONLY within a blocking key (last word), then Levenshtein <= 3 —
    the standard entity-resolution shape. Blocking turns the O(n²)
    all-pairs into an equi-join; at 100 TB the block key is the
    shuffle key and skewed blocks get AQE-split."""
    p = load_table(spark, sf_dir, "part")
    names = (
        p.select("p_name").distinct()
        .withColumn("block_key", F.element_at(F.split("p_name", " ", -1), -1))
    )
    a = names.select(
        F.col("p_name").alias("name_a"), F.col("block_key").alias("ka")
    )
    b = names.select(
        F.col("p_name").alias("name_b"), F.col("block_key").alias("kb")
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, (F.col("ka") == F.col("kb")) & (F.col("name_a") < F.col("name_b")))
        .filter(dist <= 3)
        .select("name_a", "name_b", dist.alias("dist"))
    )


@register(
    "udtf_tokenize_lateral",
    oracle="""
SELECT doc_id, t.token, CAST(t.pos - 1 AS INTEGER) AS pos,
       CAST(length(t.token) AS INTEGER) AS token_len
FROM documents,
     LATERAL (SELECT unnest(string_split(text, ' ')) AS token,
                     generate_subscripts(string_split(text, ' '), 1) AS pos) t
WHERE doc_id < 50
""",
    tags=("udtf", "lateral", "python"),
)
def udtf_tokenize_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF in a lateral join — the table-function surface the
    reference has none of (SURVEY.md §2.10). One input row expands to
    N output rows with per-row position/length metadata. NOTE the
    engine guidance stands: a tokenize this simple belongs in
    posexplode (JVM, see posexplode_tokens) — the UDTF exists for
    logic that genuinely needs Python (custom tokenizers, model
    calls), so it's demonstrated on a bounded slice (doc_id < 50),
    and the oracle is the pure-SQL lateral unnest. useArrow=True takes
    the Arrow-serialization path (batch columnar transfer) instead of
    per-row pickling — the only acceptable Python transport in the
    engine (enforced repo-wide by tests/test_scale_hygiene.py)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, pos int, token_len int", useArrow=True)
    class TokenizeUdtf:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield tok, i, len(tok)

    spark.udtf.register("tokenize_udtf", TokenizeUdtf)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        """
        SELECT doc_id, t.token, t.pos, t.token_len
        FROM docs_for_udtf, LATERAL tokenize_udtf(text) t
        """
    )
