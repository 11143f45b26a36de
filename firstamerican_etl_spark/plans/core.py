"""Core relational operator queries (SURVEY.md §2.2-§2.8) over the
driver's TPC-H-ish tables, each paired with a DuckDB oracle.

The FA reference's operator inventory maps onto these tables per
/root/repo/FIXTURES.md §B: orders plays "deed" (amounts, dates,
multi-row-per-key), customer/nation/region play "prop" (dimension
joins), per-(custkey, year) aggregates play "taxhist".

Scale notes (100 TB): every query here is a declarative DataFrame plan
— Catalyst pushes filters/projections into the parquet scan, AQE picks
join strategies at runtime. Dimension joins (nation/region/supplier)
are explicitly broadcast; fact-fact joins shuffle on their keys and
rely on AQE skew handling (session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from firstamerican_etl_spark.functions.scalar import (
    coalesce_cascade,
    concat_with_fallback,
    domain_whitelist,
    flag_when,
    lpad_code,
)
from firstamerican_etl_spark.functions.stable import (
    fast_avg,
    fast_sum,
    sql_fast_avg,
    sql_fast_sum,
    sql_stable_avg,
    sql_stable_sum,
    stable_avg,
    stable_round,
    stable_sum,
)
from firstamerican_etl_spark.operators.relational import (
    dedup_top1_per_group,
    top_k_per_group,
)
from firstamerican_etl_spark.plans.registry import register
from firstamerican_etl_spark.sources.io import load_table, staging_tag


# ---------------------------------------------------------------- scans


@register(
    "scan_filter_project",
    oracle="""
SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem
WHERE l_returnflag IN ('A', 'R')
  AND l_quantity > 30
  AND l_discount > 0.02
  AND l_shipdate IS NOT NULL
""",
    tags=("scan", "P1", "P3", "P4", "P5", "P6"),
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P6: projection + not-null + comparison + set-membership
    predicates, all pushed into the parquet scan (fa-etl.py:61-64,74)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_quantity", "l_returnflag"
    ).filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_quantity") > 30)
        & (F.col("l_discount") > 0.02)
        & F.col("l_shipdate").isNotNull()
    )


@register(
    "distinct_projection",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("distinct",),
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct over a 2-column projection (extension §7.6; map-side
    partial dedup then a tiny shuffle)."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "sort_limit_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
    tags=("sort", "limit"),
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark runs this as TakeOrderedAndProject (per-
    partition top-20 then driver merge — no full sort at scale).
    Unique o_orderkey tie-break makes the row set deterministic."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


# ----------------------------------------------------------- aggregates


@register(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_fast_sum('l_quantity')}                                        AS sum_qty,
       {sql_fast_sum('l_extendedprice')}                                   AS sum_base_price,
       {sql_fast_sum('l_extendedprice * (1 - l_discount)')}                AS sum_disc_price,
       {sql_fast_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}  AS sum_charge,
       {sql_fast_avg('l_quantity')}                                        AS avg_qty,
       {sql_fast_avg('l_extendedprice')}                                   AS avg_price,
       {sql_fast_avg('l_discount', 4)}                                     AS avg_disc,
       count(*)                                                            AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("agg", "A1", "groupBy"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical groupBy-agg the reference lacks
    (SURVEY.md §2.5 extension). Partial aggregation happens map-side;
    the shuffle carries only 6 groups × 8 aggregates. Double sums ride
    the quantized-long fast path (functions.stable.fast_sum): exact
    int64 adds in codegen, bit-identical to the single-node oracle and
    ~5× cheaper than decimal accumulation — magnitudes here sit 6
    orders below the documented overflow bound."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fast_sum(F.col("l_quantity")).alias("sum_qty"),
            fast_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            fast_sum(disc_price).alias("sum_disc_price"),
            fast_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            fast_avg(F.col("l_quantity")).alias("avg_qty"),
            fast_avg(F.col("l_extendedprice")).alias("avg_price"),
            fast_avg(F.col("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_groupby_full",
    oracle=f"""
SELECT c_nationkey,
       count(*)                         AS n_customers,
       count(DISTINCT c_mktsegment)     AS n_segments,
       min(c_acctbal)                   AS min_bal,
       max(c_acctbal)                   AS max_bal,
       {sql_fast_avg('c_acctbal')}    AS avg_bal,
       {sql_fast_sum('c_acctbal')}    AS sum_bal
FROM customer
GROUP BY c_nationkey
""",
    tags=("agg", "count_distinct"),
)
def agg_groupby_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy with count / count-distinct / min / max / avg / sum
    (extension §7.6). countDistinct expands to a two-phase aggregate;
    min/max are order-independent as-is, sum/avg are decimal-stabilized."""
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            fast_avg(F.col("c_acctbal")).alias("avg_bal"),
            fast_sum(F.col("c_acctbal")).alias("sum_bal"),
        )
    )


@register(
    "having_filter",
    oracle=f"""
SELECT o_custkey, count(*) AS n_orders, {sql_fast_sum('o_totalprice')} AS spend
FROM orders
GROUP BY o_custkey
HAVING count(*) > 10
""",
    tags=("agg", "having"),
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter (extension §7.6)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            fast_sum(F.col("o_totalprice")).alias("spend"),
        )
        .filter(F.col("n_orders") > 10)
    )


@register(
    "rollup_agg",
    oracle="""
SELECT r_name, n_name, count(*) AS n_customers
FROM customer
JOIN nation  ON c_nationkey = n_nationkey
JOIN region  ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    tags=("agg", "rollup"),
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region → nation → grand total) over
    broadcast dimension joins (extension §7.6)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "cube_agg",
    oracle=f"""
SELECT l_returnflag, l_linestatus, {sql_fast_sum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    tags=("agg", "cube"),
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations (extension §7.6)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(fast_sum(F.col("l_quantity")).alias("sum_qty"))
    )


@register(
    "approx_count_distinct",
    oracle=None,  # HLL sketch values are engine-specific → rows-only check
    tags=("agg", "approx"),
)
def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the scale path for
    distinct counting — one pass, fixed memory, no exact-distinct
    shuffle explosion at 100 TB. rsd=0.01 (~2^14 registers, ~12 KB per
    group — still O(1) memory) keeps the estimate inside the ±2%
    envelope pinned by tests/test_approx_accuracy.py against the exact
    count. Engine-specific sketch → no SQL oracle."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        )
    )


# ---------------------------------------------------------------- joins


@register(
    "dim_join_broadcast",
    oracle="""
SELECT c_custkey, c_name, n_name, r_name
FROM customer
LEFT JOIN nation ON c_nationkey = n_nationkey
LEFT JOIN region ON n_regionkey = r_regionkey
""",
    tags=("join", "J3", "broadcast"),
)
def dim_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left join fact→dimension. nation/region are broadcast — at
    100 TB the customer side never shuffles for these joins."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@register(
    "left_join_null_filter",
    oracle="""
SELECT o_orderkey, o_custkey, c_name, o_totalprice
FROM orders
LEFT JOIN customer ON o_custkey = c_custkey
WHERE c_name IS NOT NULL
""",
    tags=("join", "J6"),
)
def left_join_null_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: left join + null-reject filter. Written literally as in the
    reference (fa-etl.py:467-479); Catalyst's EliminateOuterJoin rewrites
    it to an inner join — verified in the physical plan."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .filter(F.col("c_name").isNotNull())
        .select("o_orderkey", "o_custkey", "c_name", "o_totalprice")
    )


@register(
    "semi_join_exists",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    tags=("join", "semi"),
)
def semi_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join ≡ EXISTS: customers with at least one order.
    Semi joins ship only the key column of the probe side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "anti_join_not_exists",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    tags=("join", "anti"),
)
def anti_join_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join ≡ NOT EXISTS: customers with no orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "asymmetric_key_join",
    oracle=f"""
WITH yearly AS (
  SELECT o_custkey AS cust_id,
         CAST(year(o_orderdate) AS INTEGER) AS yr,
         {sql_fast_sum('o_totalprice')} AS year_spend
  FROM orders GROUP BY 1, 2
)
SELECT o_orderkey, o_custkey,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       o_totalprice, year_spend
FROM orders
LEFT JOIN yearly
  ON o_custkey = cust_id AND CAST(year(o_orderdate) AS INTEGER) = yr
""",
    tags=("join", "J4", "J5"),
)
def asymmetric_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/J5: left join with differing key names per side
    (fa-etl.py:467-476 ``left_on/right_on``). Both sides derive from
    orders, so AQE reuses one shuffle partitioning where possible."""
    from firstamerican_etl_spark.operators.relational import asymmetric_left_join

    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    yearly = o.groupBy(
        F.col("o_custkey").alias("cust_id"), F.col("order_year").alias("yr")
    ).agg(fast_sum(F.col("o_totalprice")).alias("year_spend"))
    joined = asymmetric_left_join(
        o, yearly, key_map={"o_custkey": "cust_id", "order_year": "yr"}
    )
    return joined.select(
        "o_orderkey", "o_custkey", "order_year", "o_totalprice", "year_spend"
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT o_orderkey,
       {sql_fast_sum('l_extendedprice * (1 - l_discount)')} AS revenue,
       o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, o_orderkey
LIMIT 10
""",
    tags=("join", "agg", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → 3-way join → agg → top-k.
    The mktsegment filter prunes customer before the join; top-k runs
    as TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            fast_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "o_orderkey")
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle=f"""
SELECT n_name, {sql_fast_sum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name
""",
    tags=("join", "agg", "multiway"),
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with a compound join predicate.
    supplier/nation/region broadcast; fact-fact join shuffles once on
    orderkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            fast_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


# -------------------------------------------------------------- windows


@register(
    "window_dedup_top1",
    oracle="""
SELECT o_custkey, order_year, o_orderkey, o_orderdate, o_totalprice
FROM (
  SELECT o_custkey, CAST(year(o_orderdate) AS INTEGER) AS order_year,
         o_orderkey, o_orderdate, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey, year(o_orderdate)
           ORDER BY o_orderdate DESC, o_orderkey
         ) AS rn
  FROM orders
) WHERE rn = 1
""",
    tags=("window", "W1"),
)
def window_dedup_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — the reference's semantic heart: most recent row per
    (key, year) with a deterministic tie-break (fa-etl.py:96-109 keeps
    the latest qualifying sale per property-year; tie contract
    documented in operators.relational.dedup_top1_per_group)."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    ranked = dedup_top1_per_group(
        o,
        partition_by=["o_custkey", "order_year"],
        order_by=[F.col("o_orderdate").desc()],
        tiebreak=["o_orderkey"],
    )
    return ranked.select(
        "o_custkey", "order_year", "o_orderkey", "o_orderdate", "o_totalprice"
    )


@register(
    "window_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ) AS rnk
  FROM orders
) WHERE rnk <= 3
""",
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per customer (generalized W1)."""
    o = load_table(spark, sf_dir, "orders")
    return top_k_per_group(
        o,
        partition_by=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rnk")


@register(
    "window_analytics",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       lag(o_totalprice)  OVER w AS prev_price,
       lead(o_totalprice) OVER w AS next_price,
       floor((CAST(sum(CAST(floor((o_totalprice) * 100 + 0.5) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100) * 100 + 0.5) / 100 AS running_spend,
       row_number() OVER w AS order_seq
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    tags=("window", "lag", "lead", "frame"),
)
def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window suite: lag/lead + running sum with an explicit
    ROWS frame + sequence numbering (extension §7.6 — the reference has
    no frames/lag/lead). One shuffle+sort per window spec; all four
    share one spec here, so one exchange total."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        stable_round(
            F.sum(
                F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
                    "long"
                )
            )
            .over(wf)
            .cast("double")
            / 100
        ).alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


# --------------------------------------------------------------- setops


@register(
    "setop_union",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
    tags=("setop", "union"),
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) across two projections (§2.7 — the reference's
    multi-county generalization is a unionByName, fa-etl.py:581-589)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@register(
    "setop_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
    tags=("setop", "intersect"),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "setop_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
    tags=("setop", "except"),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT has distinct-set semantics: a value present on both sides
    is removed entirely — DataFrame.subtract, not exceptAll."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


# ------------------------------------------------------ scalar functions


@register(
    "string_date_funcs",
    oracle="""
SELECT o_orderkey,
       lpad(CAST(o_custkey AS VARCHAR), 10, '0')        AS cust_code,
       strftime(o_orderdate, '%Y%m%d')                  AS date_str,
       substr(strftime(o_orderdate, '%Y%m%d'), 1, 4)    AS year_slice,
       CAST(strptime(strftime(o_orderdate, '%Y%m%d'), '%Y%m%d') AS DATE) AS parsed_date,
       CAST(year(o_orderdate) AS INTEGER)               AS order_year
FROM orders
""",
    tags=("scalar", "F1", "F3", "F4", "F5", "F6"),
)
def string_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3-F6: lpad zero-restore, YYYYMMDD round-trip (format → slice →
    parse), year extraction (fa-etl.py:65-79)."""
    o = load_table(spark, sf_dir, "orders")
    date_str = F.date_format("o_orderdate", "yyyyMMdd")
    return o.select(
        "o_orderkey",
        lpad_code("o_custkey", 10).alias("cust_code"),
        date_str.alias("date_str"),
        F.substring(date_str, 1, 4).alias("year_slice"),
        F.to_date(date_str, "yyyyMMdd").alias("parsed_date"),
        F.year("o_orderdate").alias("order_year"),
    )


@register(
    "conditional_flags",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderstatus IN ('O', 'F') THEN o_orderstatus END AS status_clean,
       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             AND o_orderstatus = 'O' THEN 1 ELSE 0 END AS urgent_flag
FROM orders
""",
    tags=("scalar", "F7", "F8"),
)
def conditional_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 domain whitelist (invalid codes → NULL, fa-etl.py:74,174) +
    F8 boolean flag (SaleFlag heuristic shape, fa-etl.py:80)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        domain_whitelist("o_orderstatus", ["O", "F"]).alias("status_clean"),
        flag_when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_orderstatus") == "O")
        ).alias("urgent_flag"),
    )


@register(
    "coalesce_cascade_q",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_discount IS NOT NULL AND l_discount <> 0 THEN l_discount
            WHEN l_tax      IS NOT NULL AND l_tax      <> 0 THEN l_tax
            WHEN l_quantity IS NOT NULL AND l_quantity <> 0 THEN l_quantity
       END AS val,
       CASE WHEN l_discount IS NOT NULL AND l_discount <> 0 THEN 'discount'
            WHEN l_tax      IS NOT NULL AND l_tax      <> 0 THEN 'tax'
            WHEN l_quantity IS NOT NULL AND l_quantity <> 0 THEN 'quantity'
       END AS used
FROM lineitem
""",
    tags=("scalar", "F9", "F10"),
)
def coalesce_cascade_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: predicated coalesce-cascade with provenance tag
    (fa-etl.py:397-413). NOT plain coalesce — zero values are skipped
    (zero discounts fall through to tax/quantity here, exactly like
    zero assessed values fall through to market/appraised)."""
    li = load_table(spark, sf_dir, "lineitem")
    val, used = coalesce_cascade(
        [("l_discount", "discount"), ("l_tax", "tax"), ("l_quantity", "quantity")]
    )
    return li.select(
        "l_orderkey", "l_linenumber", val.alias("val"), used.alias("used")
    )


@register(
    "concat_fallback",
    oracle="""
SELECT c_custkey,
       coalesce(
         CAST(c_nationkey AS VARCHAR) || '_' || nullif(c_mktsegment, 'BUILDING'),
         CAST(c_nationkey AS VARCHAR)
       ) AS nation_segment
FROM customer
""",
    tags=("scalar", "F11"),
)
def concat_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: null-propagating concat with fallback (fa-etl.py:175).
    nullif() synthesizes the null side; concat_ws would silently skip
    it and emit '15_' — the fallback-to-left semantics require
    concat + coalesce."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        concat_with_fallback(
            F.col("c_nationkey").cast("string"),
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")),
        ).alias("nation_segment"),
    )


# ------------------------------------------------------- SQL interface

@register(
    "sql_interface_passthrough",
    oracle="""
SELECT n_name,
       count(*) AS n_orders,
       floor((CAST(sum(CAST(floor((o_totalprice) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS total_spend
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY 1
""",
    tags=("sql", "interface"),
)
def sql_interface_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL surface: tables registered as temp views, the
    query itself a raw ANSI string through spark.sql — same Catalyst
    plan as the DataFrame formulation (the reference has no SQL parser;
    Spark gives us one for free, so users can bring either API)."""
    for t in ("orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql("""
        SELECT n_name,
               count(*) AS n_orders,
               floor((CAST(sum(CAST(floor((o_totalprice) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS total_spend
        FROM v_orders
        JOIN v_customer ON o_custkey = c_custkey
        JOIN v_nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
    """)


@register(
    "recursive_cte_hierarchy",
    oracle="""
WITH RECURSIVE anc AS (
  SELECT c_custkey, c_custkey AS root, 0 AS depth
  FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, anc.root, anc.depth + 1
  FROM customer c JOIN anc
    ON CAST(floor(c.c_custkey / 10.0) AS BIGINT) = anc.c_custkey
  WHERE c.c_custkey >= 10
)
SELECT root, depth, count(*) AS n_nodes, max(c_custkey) AS max_key
FROM anc GROUP BY 1, 2
""",
    tags=("sql", "recursive-cte", "hierarchy"),
)
def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): walk the implicit
    custkey decimal-digit hierarchy (parent = floor(key/10)) from the
    single-digit roots down, tracking root and depth — the iterative
    plan Spark lacked before 4.0 (each recursion level is one join
    stage; depth is log10(|keys|), so the loop terminates fast at any
    scale). Same SQL text runs on both engines; floor-division spelled
    portably (DuckDB's // vs Spark's div differ)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql("""
        WITH RECURSIVE anc AS (
          SELECT c_custkey, c_custkey AS root, 0 AS depth
          FROM customer_v WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey, anc.root, anc.depth + 1
          FROM customer_v c JOIN anc
            ON CAST(floor(c.c_custkey / 10.0) AS BIGINT) = anc.c_custkey
          WHERE c.c_custkey >= 10
        )
        SELECT root, depth, count(*) AS n_nodes, max(c_custkey) AS max_key
        FROM anc GROUP BY root, depth
    """)


@register(
    "events_from_jsonl",
    oracle="""
SELECT event_id, user_id, event_type,
       floor(CAST(value AS DOUBLE) * 100 + 0.5) / 100 AS value_r
FROM events
""",
    tags=("source", "json"),
)
def events_from_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source: the events table staged once as .jsonl and
    read back with an EXPLICIT schema (schema inference on JSON is a
    full extra pass at scale — never at 100 TB) in PERMISSIVE mode.
    Round-trips must preserve values exactly — which is what the
    oracle (reading the original parquet) checks."""
    from pyspark.sql import types as T

    from firstamerican_etl_spark.operators.scale import shared_stage

    base = shared_stage(
        "jsonl",
        staging_tag(sf_dir, "events"),
        lambda p: load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .coalesce(2)
        .write.mode("overwrite")
        .json(p),
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    ev = spark.read.schema(schema).option("mode", "PERMISSIVE").json(base)
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        (F.floor(F.col("value").cast("double") * 100 + 0.5) / 100).alias("value_r"),
    )


@register(
    "events_from_xml",
    oracle="""
SELECT event_id, user_id, event_type,
       floor(CAST(value AS DOUBLE) * 100 + 0.5) / 100 AS value_r
FROM events
""",
    tags=("source", "xml"),
)
def events_from_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source (built into Spark 4): the events table staged once as
    row-tagged XML and read back with an EXPLICIT schema — same
    contract as the JSONL source: schema declared (no inference pass),
    PERMISSIVE nulls on malformed rows, and an exact value round-trip
    (Double.toString/parseDouble are inverses), which the oracle
    (reading the original parquet) checks."""
    from pyspark.sql import types as T

    from firstamerican_etl_spark.operators.scale import shared_stage

    base = shared_stage(
        "xml",
        staging_tag(sf_dir, "events"),
        lambda p: load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .coalesce(2)
        .write.mode("overwrite")
        .format("xml")
        .option("rootTag", "events")
        .option("rowTag", "event")
        .save(p),
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    ev = (
        spark.read.schema(schema)
        .option("rowTag", "event")
        .option("mode", "PERMISSIVE")
        .format("xml")
        .load(base)
    )
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        (F.floor(F.col("value").cast("double") * 100 + 0.5) / 100).alias("value_r"),
    )


@register(
    "setop_except_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT ALL
SELECT s_nationkey AS nationkey FROM supplier
""",
    tags=("setop", "except-all", "bag-semantics"),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag semantics: each right-side occurrence cancels
    ONE left occurrence (multiplicity max(l-r, 0)), versus EXCEPT's
    remove-entirely. DataFrame.exceptAll plans as a count-aggregate
    diff + generate, one shuffle — not an anti join."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.exceptAll(s)


@register(
    "setop_intersect_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT ALL
SELECT s_nationkey AS nationkey FROM supplier
""",
    tags=("setop", "intersect-all", "bag-semantics"),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: each value survives with
    multiplicity min(l, r), versus INTERSECT's distinct output.
    DataFrame.intersectAll plans as a count-aggregate min + generate,
    one shuffle — completes the §2.7 bag/set family alongside
    exceptAll."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersectAll(s)


@register(
    "pagination_limit_offset",
    oracle="""
SELECT o_orderkey, o_custkey,
       floor(CAST(o_totalprice AS DOUBLE) * 100 + 0.5) / 100 AS total_r
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50 OFFSET 100
""",
    tags=("sort", "limit", "offset", "pagination"),
)
def pagination_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless pagination: ORDER BY (unique tie-break) + LIMIT/OFFSET.
    Spark plans offset+limit as a single TakeOrdered of the first
    offset+limit rows then drops the prefix — fine for UI pages;
    for deep scrolls use keyset pagination (WHERE key > last_seen)
    instead, which this same tie-broken ordering enables."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select(
            "o_orderkey",
            "o_custkey",
            stable_round(F.col("o_totalprice").cast("double")).alias("total_r"),
        )
        .offset(100)
        .limit(50)
    )


@register(
    "events_from_orc",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
FROM events
GROUP BY 1
""",
    tags=("source", "orc"),
)
def events_from_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source (the other columnar format a lake migration brings):
    the events table staged once as ORC and aggregated from the ORC
    scan. ORC round-trips doubles and timestamps exactly, carries
    min/max stride statistics for predicate pushdown like parquet, and
    Spark's reader is native + vectorized — the oracle (reading the
    original parquet) checks the round-trip is value-exact."""
    from firstamerican_etl_spark.operators.scale import shared_stage

    base = shared_stage(
        "orc",
        staging_tag(sf_dir, "events"),
        lambda p: load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .coalesce(2)
        .write.mode("overwrite")
        .orc(p),
    )
    ev = spark.read.orc(base)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
        ).alias("total_cents"),
    )


@register(
    "scan_merge_schema",
    oracle="""
SELECT o_orderstatus,
       count(*) AS n_rows,
       count(o_clerk_id) AS n_with_clerk,
       CAST(sum(coalesce(o_clerk_id, -1)) AS BIGINT) AS clerk_checksum
FROM (
  SELECT o_orderstatus, CAST(NULL AS BIGINT) AS o_clerk_id
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT o_orderstatus, o_orderkey % 100 AS o_clerk_id
  FROM orders WHERE o_orderkey % 2 = 1
)
GROUP BY 1
""",
    tags=("source", "schema-evolution", "mergeSchema"),
)
def scan_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet file generations: an old
    generation written WITHOUT ``o_clerk_id`` and a new generation
    WITH it, read back as ONE table via ``mergeSchema=true`` — Spark
    reconciles the footers and nulls the missing column for old files
    (the reference's world has this problem between county file
    vintages; fa-etl.py sidesteps it by hand-picking columns). The
    oracle reconstructs the same union shape from the original table.
    mergeSchema costs one footer read per file at planning time — at
    100 TB, pin the merged schema in a metastore instead; the READ
    path (per-file projection with null fill) is identical."""
    import os

    from firstamerican_etl_spark.operators.scale import shared_stage

    o = load_table(spark, sf_dir, "orders")

    def _write_generations(p: str) -> None:
        o.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_orderstatus"
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(p, "gen=old"))
        o.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey",
            "o_orderstatus",
            (F.col("o_orderkey") % 100).alias("o_clerk_id"),
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(p, "gen=new"))

    base = shared_stage(
        "evolve",
        staging_tag(sf_dir, "orders"),
        _write_generations,
        markers=("gen=old/_SUCCESS", "gen=new/_SUCCESS"),
    )
    gen_old = os.path.join(base, "gen=old")
    gen_new = os.path.join(base, "gen=new")
    merged = spark.read.option("mergeSchema", "true").parquet(gen_old, gen_new)
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_clerk_id").alias("n_with_clerk"),
        F.sum(F.coalesce(F.col("o_clerk_id"), F.lit(-1))).alias("clerk_checksum"),
    )
