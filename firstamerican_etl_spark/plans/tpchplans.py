"""TPC-H-shaped query suite, part 2 (q7/q11/q13/q14/q15/q17/q19/q22
adapted to the driver's column subset). These exercise the remaining
classic plan shapes: multi-dim join pairs, HAVING against a scalar
subquery, outer-join count distributions, conditional ratios,
max-scalar joins, decorrelated per-group averages, disjunctive DNF
predicates, and anti-join + scalar-subquery filters. Every entry has a
full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firstamerican_etl_spark.functions.stable import fast_sum, stable_round
from firstamerican_etl_spark.plans.registry import register
from firstamerican_etl_spark.sources.io import load_table


@register(
    "q7_nation_volume",
    oracle="""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       floor((CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
GROUP BY 1, 2, 3
""",
    tags=("tpch", "q7", "multijoin"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume between two nations. Both
    nation dims broadcast; the supplier/customer joins shuffle on their
    own keys — the nation-pair filter prunes before the aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == cn.c_nk)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == sn.s_nk)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            fast_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("revenue")
        )
    )


@register(
    "q11_important_types",
    oracle="""
WITH per_type AS (
  SELECT p_type, sum(CAST(floor((p_retailprice * p_size) * 100 + 0.5) AS BIGINT)) AS val
  FROM part GROUP BY 1
)
SELECT p_type,
       floor((CAST(val AS DOUBLE) / 100) * 100 + 0.5) / 100 AS type_value
FROM per_type
WHERE CAST(val AS DOUBLE) > (SELECT CAST(sum(val) AS DOUBLE) * 0.15 FROM per_type)
""",
    tags=("tpch", "q11", "having-scalar-subquery"),
)
def q11_important_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: groups whose value exceeds a fraction of the GLOBAL
    total — HAVING against a scalar subquery, decorrelated as
    agg → single-row global agg → broadcast cross join → filter (the
    one-row side costs nothing; never recompute the total per group)."""
    p = load_table(spark, sf_dir, "part")
    per_type = p.groupBy("p_type").agg(
        F.sum(
            F.floor(
                F.col("p_retailprice") * F.col("p_size") * F.lit(100.0) + F.lit(0.5)
            ).cast("long")
        ).alias("val")
    )
    total = per_type.agg(F.sum("val").alias("grand"))
    return (
        per_type.crossJoin(F.broadcast(total))
        .filter(F.col("val").cast("double") > F.col("grand").cast("double") * 0.15)
        .select("p_type", stable_round(F.col("val").cast("double") / 100).alias("type_value"))
    )


@register(
    "q13_order_count_distribution",
    oracle="""
SELECT c_count, count(*) AS n_customers
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY 1
)
GROUP BY 1
""",
    tags=("tpch", "q13", "outer-join-agg"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: per-customer order counts (left join keeps the
    zero-order customers — count(col) skips their nulls) re-grouped
    into a histogram. Two aggregations, two exchanges; the second input
    is |customers| rows, trivially small."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "q14_promo_revenue_share",
    oracle="""
SELECT floor((
         100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000 + 0.5) AS BIGINT) ELSE 0 END) AS DOUBLE)
         / CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
       ) * 100 + 0.5) / 100 AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
""",
    tags=("tpch", "q14", "conditional-ratio"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo revenue share — two conditional sums in ONE
    aggregate pass (never two jobs for a ratio); part broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev_q = F.floor(
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return joined.agg(
        stable_round(
            F.lit(100.0)
            * F.sum(
                F.when(F.col("p_type") == "PROMO", rev_q).otherwise(F.lit(0))
            ).cast("double")
            / F.sum(rev_q).cast("double")
        ).alias("promo_share_pct")
    )


@register(
    "q15_top_supplier",
    oracle="""
WITH srev AS (
  SELECT l_suppkey,
         floor((CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS total_rev
  FROM lineitem WHERE l_shipdate >= DATE '2023-01-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_rev
FROM srev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM srev)
""",
    tags=("tpch", "q15", "max-scalar"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) achieving the maximum revenue — scalar
    max broadcast back over the aggregate (ties kept, exactly like the
    SQL = comparison)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2023-01-01").cast("date")
    )
    s = load_table(spark, sf_dir, "supplier")
    srev = li.groupBy("l_suppkey").agg(
        fast_sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
            "total_rev"
        )
    )
    mx = srev.agg(F.max("total_rev").alias("mx"))
    return (
        srev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(s, srev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
WITH avgq AS (
  SELECT l_partkey, avg(l_quantity) AS aq FROM lineitem GROUP BY 1
)
SELECT floor((CAST(sum(CAST(floor((l_extendedprice) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 / 7.0) * 100 + 0.5) / 100 AS avg_yearly,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#1'
JOIN avgq ON lineitem.l_partkey = avgq.l_partkey
WHERE l_quantity < 0.2 * aq
""",
    tags=("tpch", "q17", "decorrelated-avg"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: rows below 20% of their group's average — the
    correlated scalar subquery decorrelated into a per-key aggregate
    joined back (one extra shuffle on the shared key instead of a
    per-row subquery)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avgq = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        F.avg("l_quantity").alias("aq")
    )
    return (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(avgq, li.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < 0.2 * F.col("aq"))
        .agg(
            stable_round(
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * F.lit(1000000.0) + F.lit(0.5)
                    ).cast("long")
                ).cast("double")
                / F.lit(1000000.0)
                / 7.0
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
SELECT floor((CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
""",
    tags=("tpch", "q19", "dnf"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: DNF predicate spanning both join sides. Catalyst
    extracts the common single-side conjuncts below the join; the
    cross-side residual evaluates post-join — check the plan, don't
    pre-split by hand."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    branch = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        j.filter(
            branch("Brand#1", 15, 1, 21)
            | branch("Brand#2", 25, 10, 30)
            | branch("Brand#3", 35, 20, 40)
        ).agg(
            fast_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q22_dormant_customers",
    oracle="""
WITH rich AS (
  SELECT * FROM customer
  WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
)
SELECT c_mktsegment,
       count(*) AS n_customers,
       floor((CAST(sum(CAST(floor((c_acctbal) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS total_bal
FROM rich
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY 1
""",
    tags=("tpch", "q22", "anti-join-scalar"),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers with no orders —
    scalar-subquery threshold (broadcast single row) + left-anti join
    (the NOT EXISTS physical form: no row multiplication, build side
    reduced to distinct keys)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    thresh = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = c.crossJoin(F.broadcast(thresh)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    dormant = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return dormant.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        fast_sum(F.col("c_acctbal")).alias("total_bal"),
    )
