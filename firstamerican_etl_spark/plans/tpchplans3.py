"""TPC-H-shaped query suite, part 3 (q8/q9/q16/q20/q21 adapted to the
driver's column subset — there is no partsupp table, so supply-cost is
proxied by ``p_retailprice`` and supplier-of-part relationships come
from ``lineitem``). These complete the 22-query suite and exercise the
remaining classic shapes: 8-way snowflake joins with a conditional
market-share ratio, profit aggregation over a derived expression,
count-distinct with NOT-IN exclusion, nested IN with a HAVING
threshold, and the dual EXISTS / NOT-EXISTS "waiting orders" pattern
decorrelated into one per-order aggregate. Every entry has a full
DuckDB oracle.

Reference parity note: the reference pipeline (fa-etl.py) contains only
left equi-joins and one window; this suite is the §7.6 general-
capability extension mandated by SURVEY.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firstamerican_etl_spark.functions.stable import (
    fast_sum,
    stable_round,
)
from firstamerican_etl_spark.plans.registry import register
from firstamerican_etl_spark.sources.io import load_table


@register(
    "q8_market_share",
    oracle="""
WITH sales AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
         CAST(floor((l_extendedprice * (1 - l_discount)) * 1000000 + 0.5) AS BIGINT) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN part     ON l_partkey = p_partkey
  WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
)
SELECT order_year,
       floor((
         CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END) AS DOUBLE)
         / CAST(sum(volume) AS DOUBLE)) * 10000 + 0.5) / 10000 AS mkt_share
FROM sales
GROUP BY 1
""",
    tags=("tpch", "q8", "snowflake-ratio"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: NATION_1's share of AMERICA's PROMO-part market per
    order year. An 8-way snowflake: every dimension (part, customer,
    nation x2, region, supplier) broadcasts; lineitem⋈orders is the
    only real shuffle. The share is two conditional sums in ONE
    aggregate pass — never two jobs for a ratio."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    cn = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    amer = r.filter(F.col("r_name") == "AMERICA").select("r_regionkey")
    vol = F.floor(
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    sales = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(amer), F.col("c_rk") == F.col("r_regionkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0)
    return sales.groupBy("order_year").agg(
        stable_round(
            F.sum(
                F.when(
                    F.col("supp_nation") == "NATION_1", F.col("volume")
                ).otherwise(zero)
            ).cast("double")
            / F.sum("volume").cast("double"),
            4,
        ).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    oracle="""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       floor((CAST(sum(CAST(floor((
         l_extendedprice * (1 - l_discount) - p_retailprice * 0.1 * l_quantity
       ) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%gear%'
GROUP BY 1, 2
""",
    tags=("tpch", "q9", "profit"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by supplier nation and year for parts matching
    a name pattern. Supply cost is proxied as 10% of retail price (the
    driver dataset has no partsupp). The LIKE filter prunes part BEFORE
    its broadcast; profit is one derived expression summed exactly in
    quantized int64 cents."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    profit = (
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        - F.col("p_retailprice") * F.lit(0.1) * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(fast_sum(profit).alias("profit"))
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'ECONOMY'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY 1, 2, 3
""",
    tags=("tpch", "q16", "count-distinct-not-in"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct supplier count per (brand, type, size) with
    a NOT-IN supplier exclusion. The supplier-of-part relation comes
    from lineitem (no partsupp in the driver dataset). NOT IN over a
    null-free key column is a left-anti join against the (tiny,
    broadcast) excluded-supplier set; countDistinct expands to the
    standard two-phase distinct aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "ECONOMY")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_promotion_suppliers",
    oracle="""
SELECT s_name, n_name AS nation,
       floor(CAST(s_acctbal AS DOUBLE) * 100 + 0.5) / 100 AS acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '%bolt%'
      AND l_shipdate >= DATE '1998-01-01' AND l_shipdate < DATE '1999-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 50
  )
""",
    tags=("tpch", "q20", "nested-in-having"),
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers who moved >50 units of some bolt-named
    part in 1998, with their nation. The nested IN (GROUP BY ...
    HAVING) becomes an aggregate → distinct-key projection →
    left-semi join; the supplier⋈nation dim pair broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("date"))
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey")
    )
    qualifying = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select(
            "s_name",
            F.col("n_name").alias("nation"),
            stable_round(F.col("s_acctbal").cast("double")).alias("acctbal"),
        )
    )


@register(
    "q21_waiting_orders",
    oracle="""
WITH ordstats AS (
  SELECT l_orderkey AS ok,
         count(DISTINCT l_suppkey) AS nsupp,
         count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS nsupp_r
  FROM lineitem GROUP BY 1
)
SELECT s_name, n_name AS nation, count(*) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN ordstats ON l1.l_orderkey = ok
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND nsupp > 1
  AND nsupp_r = 1
GROUP BY 1, 2
""",
    tags=("tpch", "q21", "exists-notexists"),
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the SOLE party at fault
    (returnflag R) on a finished multi-supplier order. The
    classic dual correlated EXISTS (another supplier participated) /
    NOT EXISTS (no other supplier at fault) is decorrelated into ONE
    per-order aggregate — and lineitem is shuffled exactly ONCE: the
    per-(order, supplier) rollup carries the at-fault flag, the
    R-row count, AND (via conditional max) the identity of the sole
    at-fault supplier, so the per-order stats table already holds
    everything the answer needs. No probe-side rejoin of lineitem —
    the old formulation shuffled the R-rows a second time against
    ordstats; at 100 TB that second lineitem exchange dwarfs the
    ~|orders|-row work this version does after the rollup.

    The distinct-supplier counts run as a TWO-LEVEL aggregation
    (per-(order, supplier) → per-order) rather than countDistinct:
    multi-distinct plans an Expand that doubles the shuffled rows."""
    # cpu_spread was TRIED here and reverted (r14, guide §1 measure
    # first): one probe measured −26% but the controlled interleaved
    # A/B (6 sweeps, alternating order) showed +25% on min and parity
    # on median — unlike stats_moments, the rollup's CPU-per-byte is
    # too low for the extra exchange to pay at any scan layout.
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    is_r = (F.col("l_returnflag") == "R").cast("int")
    per_pair = li.groupBy(F.col("l_orderkey").alias("ok"), "l_suppkey").agg(
        F.max(is_r).alias("has_r"),
        F.sum(is_r).alias("n_r"),
    )
    ordstats = per_pair.groupBy("ok").agg(
        F.count(F.lit(1)).alias("nsupp"),
        F.sum("has_r").alias("nsupp_r"),
        F.sum("n_r").alias("r_rows"),
        F.max(F.when(F.col("has_r") == 1, F.col("l_suppkey"))).alias("fault_supp"),
    )
    return (
        ordstats.filter((F.col("nsupp") > 1) & (F.col("nsupp_r") == 1))
        .join(o, F.col("ok") == o.o_orderkey)
        .join(F.broadcast(s), F.col("fault_supp") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("s_name", F.col("n_name").alias("nation"))
        .agg(F.sum("r_rows").cast("long").alias("numwait"))
    )
