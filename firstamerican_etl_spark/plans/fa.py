"""FA-pipeline-shaped queries over the oracle tables.

The reference's flagship query (fa-etl.py:429-483 ``join()``) is a
4-way left-join cascade over window-deduped inputs with a predicated
coalesce-cascade and a null-reject filter. Per /root/repo/FIXTURES.md
§B the FA entities map onto the TPC-H-ish tables:

- deed      → orders   (PropertyID=o_custkey, SaleAmt=o_totalprice,
                        RecordingDate=o_orderdate)
- prop      → customer ⋈ nation ⋈ region (dimension attributes)
- taxhist   → per-(custkey, year) aggregate of orders (asymmetric keys)
- valhist   → per-(custkey, year) value slices from lineitem revenue

This module is the *query-shape* parity proof; the byte-faithful FA
pipeline over real pipe-delimited FA files lives in
firstamerican_etl_spark/pipeline/ (tested against golden fixtures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firstamerican_etl_spark.functions.scalar import coalesce_cascade, flag_when
from firstamerican_etl_spark.functions.stable import fast_sum, stable_round, stable_sum
from firstamerican_etl_spark.operators.relational import (
    asymmetric_left_join,
    dedup_top1_per_group,
)
from firstamerican_etl_spark.plans.registry import register
from firstamerican_etl_spark.sources.io import load_table


def _ranked_deed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """convert_sales analogue (fa-etl.py:20-122): clean (not-null key,
    positive amount, qualifying flag) → window-dedup to the most recent
    row per (key, year)."""
    o = load_table(spark, sf_dir, "orders")
    deed = (
        o.filter(F.col("o_custkey").isNotNull() & (F.col("o_totalprice") > 0))
        .withColumn("sale_flag", flag_when(F.col("o_orderstatus").isin("O", "F")))
        .filter(F.col("sale_flag") == 1)
        .withColumn("sale_year", F.year("o_orderdate"))
    )
    return dedup_top1_per_group(
        deed,
        partition_by=["o_custkey", "sale_year"],
        order_by=[F.col("o_orderdate").desc()],
        tiebreak=["o_orderkey"],
    ).select(
        F.col("o_custkey").alias("property_id"),
        F.col("sale_year").alias("year"),
        F.col("o_totalprice").alias("sale_amt"),
        F.col("o_orderkey").alias("deed_key"),
    )


@register(
    "fa_ranked_deed",
    oracle="""
SELECT o_custkey AS property_id,
       CAST(year(o_orderdate) AS INTEGER) AS year,
       o_totalprice AS sale_amt,
       o_orderkey AS deed_key
FROM (
  SELECT *,
         row_number() OVER (
           PARTITION BY o_custkey, year(o_orderdate)
           ORDER BY o_orderdate DESC, o_orderkey
         ) AS rn
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_totalprice > 0
    AND o_orderstatus IN ('O', 'F')
) WHERE rn = 1
""",
    tags=("fa", "W1", "P3", "P4", "F8"),
)
def fa_ranked_deed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ranked-deed stage (fa-etl.py:96-109): filter to
    qualifying sales, keep the most recent per (property, year)."""
    return _ranked_deed(spark, sf_dir)


@register(
    "fa_valhist_cascade",
    oracle="""
WITH rev AS (
  SELECT o_custkey AS property_id,
         CAST(year(o_orderdate) AS INTEGER) AS year,
         floor((CAST(sum(CAST(floor((CASE WHEN l_returnflag = 'N' THEN l_extendedprice END) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS assd_value,
         floor((CAST(sum(CAST(floor((CASE WHEN l_returnflag = 'R' THEN l_extendedprice END) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS market_value,
         floor((CAST(sum(CAST(floor((CASE WHEN l_returnflag = 'A' THEN l_extendedprice END) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS appr_value
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY 1, 2
)
SELECT property_id, year, assd_value, market_value, appr_value,
       CASE WHEN assd_value   IS NOT NULL AND assd_value   <> 0 THEN assd_value
            WHEN market_value IS NOT NULL AND market_value <> 0 THEN market_value
            WHEN appr_value   IS NOT NULL AND appr_value   <> 0 THEN appr_value
       END AS value,
       CASE WHEN assd_value   IS NOT NULL AND assd_value   <> 0 THEN 'Assd'
            WHEN market_value IS NOT NULL AND market_value <> 0 THEN 'Market'
            WHEN appr_value   IS NOT NULL AND appr_value   <> 0 THEN 'Appr'
       END AS assessment_used
FROM rev
""",
    tags=("fa", "F9", "F10", "unpivot"),
)
def fa_valhist_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """convert_valhist analogue (fa-etl.py:250-426): build three value
    series per (property, year) and coalesce-cascade them with a
    provenance tag. The reference does this as 3 temp-file projections
    + 2 joins; here it is ONE aggregation with conditional sums — no
    temp files, one shuffle."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("property_id"),
            F.year("o_orderdate").alias("year"),
        )
        .agg(
            fast_sum(
                F.when(F.col("l_returnflag") == "N", F.col("l_extendedprice"))
            ).alias("assd_value"),
            fast_sum(
                F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice"))
            ).alias("market_value"),
            fast_sum(
                F.when(F.col("l_returnflag") == "A", F.col("l_extendedprice"))
            ).alias("appr_value"),
        )
    )
    value, used = coalesce_cascade(
        [("assd_value", "Assd"), ("market_value", "Market"), ("appr_value", "Appr")]
    )
    return rev.select(
        "property_id",
        "year",
        "assd_value",
        "market_value",
        "appr_value",
        value.alias("value"),
        used.alias("assessment_used"),
    )


@register(
    "fa_flagship_merged",
    oracle="""
WITH ranked_deed AS (
  SELECT o_custkey AS property_id,
         CAST(year(o_orderdate) AS INTEGER) AS year,
         o_totalprice AS sale_amt,
         o_orderkey AS deed_key
  FROM (
    SELECT *,
           row_number() OVER (
             PARTITION BY o_custkey, year(o_orderdate)
             ORDER BY o_orderdate DESC, o_orderkey
           ) AS rn
    FROM orders
    WHERE o_custkey IS NOT NULL AND o_totalprice > 0
      AND o_orderstatus IN ('O', 'F')
  ) WHERE rn = 1
),
valhist AS (
  SELECT property_id, year,
         CASE WHEN assd_value   IS NOT NULL AND assd_value   <> 0 THEN assd_value
              WHEN market_value IS NOT NULL AND market_value <> 0 THEN market_value
              WHEN appr_value   IS NOT NULL AND appr_value   <> 0 THEN appr_value
         END AS value,
         market_value, appr_value
  FROM (
    SELECT o_custkey AS property_id,
           CAST(year(o_orderdate) AS INTEGER) AS year,
           floor((CAST(sum(CAST(floor((CASE WHEN l_returnflag = 'N' THEN l_extendedprice END) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS assd_value,
           floor((CAST(sum(CAST(floor((CASE WHEN l_returnflag = 'R' THEN l_extendedprice END) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS market_value,
           floor((CAST(sum(CAST(floor((CASE WHEN l_returnflag = 'A' THEN l_extendedprice END) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS appr_value
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1, 2
  )
),
prop AS (
  SELECT c_custkey AS property_id, c_name, c_acctbal, n_name, r_name
  FROM customer
  LEFT JOIN nation ON c_nationkey = n_nationkey
  LEFT JOIN region ON n_regionkey = r_regionkey
),
taxhist AS (
  SELECT o_custkey AS tax_property_id,
         CAST(year(o_orderdate) AS INTEGER) AS tax_year,
         floor((CAST(sum(CAST(floor((o_totalprice) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 / 100) * 100 + 0.5) / 100 AS tax_amt_adjusted
  FROM orders GROUP BY 1, 2
)
SELECT v.property_id, v.year, v.value, v.market_value, v.appr_value,
       p.c_name, p.c_acctbal, p.n_name, p.r_name,
       d.sale_amt, t.tax_amt_adjusted
FROM valhist v
LEFT JOIN prop p        ON v.property_id = p.property_id
LEFT JOIN ranked_deed d ON v.property_id = d.property_id AND v.year = d.year
LEFT JOIN taxhist t     ON v.property_id = t.tax_property_id AND v.year = t.tax_year
WHERE d.sale_amt IS NOT NULL
""",
    tags=("fa", "flagship", "J3", "J4", "J5", "J6", "W1", "F9"),
)
def fa_flagship_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship query — the reference's ``join()`` unified-merge
    (fa-etl.py:429-483) re-expressed as one lazy Spark plan:

    valhist-cascade ⟕ prop ⟕ ranked_deed (asymmetric keys) ⟕ taxhist
    (asymmetric keys) → SaleAmt null-reject → project.

    Scale design: all three probe-side joins share the property_id
    key, so Spark shuffles valhist once and AQE reuses the exchange;
    the null-reject lets Catalyst rewrite the deed join to inner
    (EliminateOuterJoin); prop's dimension chain is broadcast.
    """
    # valhist side (reuses the registered plan's logic, minus tag col)
    vh = fa_valhist_cascade(spark, sf_dir).select(
        "property_id", "year", "value", "market_value", "appr_value"
    )

    # prop side: dimension attributes via broadcast chain (J3)
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    prop = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select(
            F.col("c_custkey").alias("property_id"),
            "c_name",
            "c_acctbal",
            "n_name",
            "r_name",
        )
    )

    # Deed-rank (W1) + taxhist (J5/F12) FUSED into one aggregation:
    # both are per-(custkey, year) reductions over orders, so one
    # shuffle computes both. The ranked-deed "most recent qualifying
    # sale" becomes max_by over (o_orderdate, -o_orderkey) — identical
    # winner to the row_number(date DESC, orderkey ASC) formulation,
    # with max_by skipping non-qualifying rows via a NULL ordering key.
    # vs the literal 3-subquery shape (pipeline/unify.py keeps that):
    # one orders scan+shuffle instead of two plus a window exchange.
    o = load_table(spark, sf_dir, "orders")
    qualifies = (
        F.col("o_custkey").isNotNull()
        & (F.col("o_totalprice") > 0)
        & F.col("o_orderstatus").isin("O", "F")
    )
    orders_by_py = o.groupBy(
        F.col("o_custkey").alias("order_property_id"),
        F.year("o_orderdate").alias("order_year"),
    ).agg(
        stable_round(
            F.sum(
                F.floor(
                    F.col("o_totalprice") * F.lit(1000000.0) + F.lit(0.5)
                ).cast("long")
            ).cast("double")
            / F.lit(1000000.0)
            / 100
        ).alias("tax_amt_adjusted"),
        F.max_by(
            F.col("o_totalprice"),
            F.when(
                qualifies, F.struct(F.col("o_orderdate"), (-F.col("o_orderkey")))
            ),
        ).alias("sale_amt"),
    )

    merged = vh.join(prop, on=["property_id"], how="left")
    merged = asymmetric_left_join(
        merged,
        orders_by_py,
        key_map={"property_id": "order_property_id", "year": "order_year"},
    )
    return merged.filter(F.col("sale_amt").isNotNull()).select(
        "property_id",
        "year",
        "value",
        "market_value",
        "appr_value",
        "c_name",
        "c_acctbal",
        "n_name",
        "r_name",
        "sale_amt",
        "tax_amt_adjusted",
    )
