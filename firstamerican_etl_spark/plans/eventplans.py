"""Event-time window operators over the ``events`` table — the batch
expressions of the streaming semantics (tumbling / sliding / session
windows, JSON extraction). The Structured Streaming counterparts (same
logical windows over readStream, with watermarks) live in
firstamerican_etl_spark/streaming/.

Oracle parity notes: tumbling = date_trunc; sliding windows (1h width,
30m slide) are expressed as an explode into the exactly-2 covering
windows per event — identical to Spark's epoch-aligned F.window
assignment; sessions use the classic lag/gap/cumsum islands idiom so
both engines compute identical session boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from firstamerican_etl_spark.functions.stable import fast_sum, sql_fast_sum, stable_round
from firstamerican_etl_spark.plans.registry import register
from firstamerican_etl_spark.sources.io import load_table


@register(
    "events_tumbling_window",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       floor((CAST(sum(CAST(floor((value) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
""",
    tags=("events", "window", "tumbling"),
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type. Uses F.window (the same
    operator the streaming path uses) and projects window.start —
    epoch-aligned, so it equals date_trunc('hour')."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fast_sum(F.col("value")).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value", "n_users")
    )


@register(
    "events_sliding_window",
    oracle="""
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value FROM events
)
SELECT window_start, count(*) AS n_events, floor((CAST(sum(CAST(floor((value) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS sum_value
FROM assigned
GROUP BY 1
""",
    tags=("events", "window", "sliding"),
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1-hour width, 30-minute slide. Every event
    falls in exactly 2 windows (width/slide); Spark's F.window emits
    both assignments, the oracle reproduces them by exploding the two
    epoch-aligned starts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fast_sum(F.col("value")).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@register(
    "events_session_window",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '30 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER w2 AS session_id
  FROM flagged
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, floor((CAST(sum(CAST(floor((value) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS sum_value
FROM sessions
GROUP BY user_id, session_id
""",
    tags=("events", "window", "session"),
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap — the islands
    idiom (lag → gap flag → running sum = session id). Batch-mode
    equivalent of session_window(ts, '30 minutes'); the streaming
    module uses the native operator. Two window specs over one
    partitioning → a single shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # timestamp - timestamp yields a day-time interval (works for both
    # TIMESTAMP and TIMESTAMP_NTZ columns); comparing against an interval
    # literal mirrors the oracle's `> INTERVAL '30 minutes'` exactly and
    # keeps full sub-second precision without any epoch cast
    gap = F.col("ts") - F.lag(F.col("ts")).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > F.expr("INTERVAL '30' MINUTE")), F.lit(1)).otherwise(F.lit(0)),
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(wcum).cast("long")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        fast_sum(F.col("value")).alias("sum_value"),
    )


@register(
    "events_json_extract",
    oracle="""
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
FROM events
""",
    tags=("events", "json"),
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction from the JSON-ish props column
    (get_json_object — JVM-side JSON path)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
    )


@register(
    "events_multi_resolution_rollup",
    oracle="""
WITH e AS (
  SELECT date_trunc('hour', ts) AS hour_b, date_trunc('day', ts) AS day_b, value
  FROM events
)
SELECT CASE WHEN GROUPING(hour_b) = 0 THEN 'hour' ELSE 'day' END AS resolution,
       coalesce(hour_b, day_b) AS bucket_start,
       count(*) AS n_events,
       floor((CAST(sum(CAST(floor((value) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS sum_value
FROM e GROUP BY GROUPING SETS ((hour_b), (day_b))
""",
    tags=("events", "rollup", "multi-resolution"),
)
def events_multi_resolution_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate shape: hourly AND daily
    rollups of the event stream computed in ONE grouping-sets pass —
    one shuffle serves every resolution, instead of re-scanning the
    (at scale, 100 TB) raw events once per tier. The GROUPING() bit
    tags which resolution each output row belongs to, exactly like a
    timeseries store's rollup hierarchy."""
    e = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("hour_b"),
        F.date_trunc("day", F.col("ts")).alias("day_b"),
        "value",
    )
    return (
        e.groupingSets([["hour_b"], ["day_b"]], "hour_b", "day_b")
        .agg(
            F.when(F.grouping("hour_b") == 0, "hour")
            .otherwise("day")
            .alias("resolution"),
            F.count(F.lit(1)).alias("n_events"),
            fast_sum(F.col("value")).alias("sum_value"),
        )
        .select(
            "resolution",
            F.coalesce(F.col("hour_b"), F.col("day_b")).alias("bucket_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_variant_shred",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY 1
""",
    tags=("events", "variant", "semi-structured"),
)
def events_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured shredding via VariantType (Spark 4): the props
    JSON string parses ONCE into the binary variant encoding, then
    typed paths extract without re-parsing — at 100 TB this replaces
    per-access get_json_object string re-parsing with one decode plus
    O(1) binary field reads. try_variant_get nulls (not errors) on
    path/type misses, matching the PERMISSIVE ingestion stance."""
    e = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "events_session_window_native",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL '30 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  -- cumsum ordered by (ts, event_id), matching the lag window above:
  -- ordering by ts alone would visit same-ts peers in arbitrary order,
  -- so a tied row enumerated before its session-opening peer could
  -- read the OLD sid (r10 review; the fixture has no per-user ts ties
  -- today, so the bare order was only accidentally deterministic)
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       floor((CAST(sum(CAST(floor((value) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000) * 100 + 0.5) / 100 AS sum_value
FROM sessions GROUP BY user_id, sid
""",
    tags=("events", "window", "session", "native"),
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via the NATIVE session_window operator — the
    same operator the streaming path uses (one merging aggregation,
    no window-function pass), value-equal to the lag/cumsum islands
    formulation the oracle spells out. Prefer this form at scale:
    session merging happens inside the aggregation (partial merges
    map-side), instead of a full sort + two window passes."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            fast_sum(F.col("value")).alias("sum_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
    )


@register(
    "events_burst_dedup",
    oracle="""
WITH g AS (
  SELECT event_id, user_id, event_type, ts,
         CASE WHEN ts - lag(ts) OVER (
                PARTITION BY user_id, event_type ORDER BY ts, event_id
              ) <= INTERVAL 5 MINUTES THEN 0 ELSE 1 END AS new_burst
  FROM events
),
b AS (
  SELECT *, CAST(sum(new_burst) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS burst_id
  FROM g
)
SELECT user_id, event_type, burst_id,
       min(event_id) AS kept_event_id,
       count(*) - 1 AS n_suppressed
FROM b
GROUP BY 1, 2, 3
""",
    tags=("events", "dedup", "debounce", "islands"),
)
def events_burst_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst de-bouncing: collapse rapid-fire repeats of the same
    (user, event_type) — retry storms, double-clicks, crawler loops —
    keeping one representative per burst, where a burst is any run of
    events each within 5 minutes of its predecessor (the gaps-and-
    islands idiom: lag → new-burst flag → running sum labels). The
    row-SELECTING twin of session windows: sessions aggregate bursts,
    this keeps the first row and counts what it suppressed — the shape
    log-cleaning pipelines want. One exchange on (user_id, event_type);
    both window passes and the final aggregate ride the same
    partitioning, and ties are broken on event_id so the survivor is a
    pure function of the data."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    # timestamp - timestamp → day-time interval (works for TIMESTAMP and
    # TIMESTAMP_NTZ alike — same idiom as events_session_window; an
    # epoch cast would fail on NTZ columns)
    gap_ok = (F.col("ts") - F.lag(F.col("ts")).over(w)) <= F.expr(
        "INTERVAL '5' MINUTE"
    )
    g = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.when(gap_ok, F.lit(0)).otherwise(F.lit(1)).alias("new_burst"),
    )
    b = g.withColumn(
        "burst_id",
        F.sum("new_burst").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return b.groupBy("user_id", "event_type", "burst_id").agg(
        F.min("event_id").alias("kept_event_id"),
        (F.count(F.lit(1)) - 1).alias("n_suppressed"),
    )


@register(
    "event_path_trigrams",
    oracle="""
WITH e AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s, event_id
  FROM events WHERE user_id IS NOT NULL
),
seq AS (
  SELECT user_id, event_type AS t1,
         lead(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY epoch_s, event_id) AS t2,
         lead(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY epoch_s, event_id) AS t3
  FROM e
)
SELECT t1 || '>' || t2 || '>' || t3 AS path, count(*) AS n
FROM seq
WHERE t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, path
LIMIT 20
""",
    tags=("events", "sequence-mining", "topk"),
)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 behavioral trigrams — the sequential-pattern counterpart
    of markov_event_transitions (which sees only bigram steps): which
    three-step paths (view>click>purchase vs view>click>error)
    dominate user journeys. Sequence order is (epoch_s, event_id) —
    tie-broken, so the lead() sequence is unique on both engines.

    Shape: ONE hash exchange on user_id with a per-user sort shared by
    both lead() expressions (Catalyst plans a single Window node),
    then a map-side-combined count on the trigram string and a
    TakeOrdered top-20. Per-row window state is 2 lookahead values —
    constant memory regardless of user history, safe at any per-user
    event volume."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy(F.unix_timestamp("ts"), "event_id")
    seq = ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    return (
        seq.select(F.concat_ws(">", "t1", "t2", "t3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )
