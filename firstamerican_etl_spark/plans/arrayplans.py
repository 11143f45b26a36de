"""Higher-order array functions, MapType aggregation, and an
Arrow-batched grouped UDAF (weighted median) — the nested-data and
custom-aggregate surface the reference never needed (SURVEY.md §2.8:
"no array/map functions exist in the reference") but a training-data
engine uses constantly.

Design rules carried from the rest of the repo:
- Array math stays JVM-side via F.transform/filter/aggregate lambdas
  (whole-stage codegen'd in Spark 4) — no Python in the per-element
  path; float sums fold through a quantized integer accumulator so
  the result is identical under any partitioning and engine (see
  functions/stable.py for why decimal CASTs are not).
- Map results are rendered to a canonically-ordered string before
  comparison: map iteration order is engine-defined, so a distributed
  engine must never emit raw maps as a contract surface.
- The weighted-median UDAF uses the LOWER weighted median definition
  (smallest value whose cumulative weight reaches half the total) —
  one deterministic answer, no interpolation ambiguity, and an exact
  ANSI-SQL oracle via a cumulative-weight window.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firstamerican_etl_spark.functions.stable import sql_stable_round, stable_round
from firstamerican_etl_spark.plans.registry import register
from firstamerican_etl_spark.sources.io import load_table



@register(
    "array_higher_order",
    oracle="""
SELECT vec_id,
       (SELECT CAST(sum(CAST(floor(abs(CAST(x AS DOUBLE)) * 1000000 + 0.5)
                            AS BIGINT)) AS DOUBLE)
          FROM unnest(embedding) AS t(x)) / 1000000 AS l1_norm,
       len(list_filter(embedding, x -> x > 0)) AS n_positive,
       {vmax} AS v_max
FROM embeddings
""".format(
        vmax=sql_stable_round("CAST(list_max(embedding) AS DOUBLE)", 4)
    ),
    tags=("array", "higher-order"),
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector array math without exploding: L1 norm via
    F.aggregate folding an exact integer accumulator (each element is
    quantized to 1e-6 with the floor(x·10ⁿ+½) pattern — identical
    IEEE ops in every engine, so the fold is bit-stable; a decimal
    CAST would not be, engines round float→decimal differently),
    positive count via F.filter + size, max via array_max. All three
    lambdas run inside codegen — zero Python, zero explode-shuffle;
    at 100 TB this is a map-only stage."""
    e = load_table(spark, sf_dir, "embeddings")
    quant = lambda x: F.floor(
        F.abs(x.cast("double")) * F.lit(1000000.0) + F.lit(0.5)
    ).cast("long")
    l1 = (
        F.aggregate(
            "embedding", F.lit(0).cast("long"), lambda acc, x: acc + quant(x)
        ).cast("double")
        / F.lit(1000000.0)
    )
    return e.select(
        "vec_id",
        l1.alias("l1_norm"),
        F.size(F.filter("embedding", lambda x: x > F.lit(0.0))).alias(
            "n_positive"
        ),
        stable_round(F.array_max("embedding").cast("double"), 4).alias("v_max"),
    )


@register(
    "map_event_type_counts",
    oracle="""
SELECT user_id,
       string_agg(event_type || ':' || CAST(n AS VARCHAR), ','
                  ORDER BY event_type) AS type_counts,
       CAST(count(*) AS INTEGER) AS n_types
FROM (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
) GROUP BY 1
""",
    tags=("map", "agg"),
)
def map_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type histogram built as a real MapType column
    (map_from_entries over the grouped counts), then rendered to a
    canonical 'type:count,...' string sorted by key. The map is the
    useful in-pipeline shape; the string is the only safe CONTRACT
    shape (map iteration order is undefined in every engine). Two
    hash aggregates, the second over |users|×|types| rows."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    as_map = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    entry_str = lambda e: F.concat_ws(":", e.getField("key"), e.getField("value"))
    return as_map.select(
        "user_id",
        F.array_join(
            F.transform(F.map_entries("m"), entry_str), ","
        ).alias("type_counts"),
        F.size("m").alias("n_types"),
    )


@register(
    "weighted_median_udaf",
    oracle="""
WITH w AS (
  SELECT l_returnflag, l_extendedprice, sum(l_quantity) AS wt
  FROM lineitem GROUP BY 1, 2
),
c AS (
  SELECT l_returnflag, l_extendedprice, wt,
         sum(wt) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(wt) OVER (PARTITION BY l_returnflag) AS total
  FROM w
)
SELECT l_returnflag,
       {med} AS weighted_median_price
FROM c
WHERE cum >= total / 2
GROUP BY 1
""".format(med=sql_stable_round("min(l_extendedprice)", 2)),
    tags=("udaf", "pandas", "weighted-median"),
)
def weighted_median_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate the engine lacks natively: quantity-weighted
    median price per return flag, as an Arrow-batched applyInPandas
    UDAF (lower-median definition: smallest price whose cumulative
    weight ≥ half the total). Weights are pre-combined per (flag,
    price) JVM-side so the Python stage sees |distinct prices| rows,
    not |lineitem| — the same partial-aggregate trick a native UDAF
    would use. Oracle: cumulative-weight window, same definition."""
    li = load_table(spark, sf_dir, "lineitem")
    pre = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.sum("l_quantity").alias("wt")
    )

    def wmedian(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("l_extendedprice")
        cum = pdf["wt"].cumsum()
        target = pdf["wt"].sum() / 2.0
        price = float(pdf.loc[cum >= target, "l_extendedprice"].iloc[0])
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "weighted_median_price": [price],
            }
        )

    out = pre.groupBy("l_returnflag").applyInPandas(
        wmedian, schema="l_returnflag string, weighted_median_price double"
    )
    return out.select(
        "l_returnflag",
        stable_round(F.col("weighted_median_price"), 2).alias(
            "weighted_median_price"
        ),
    )
