"""Registry entries that execute the REAL Structured Streaming path
(readStream → watermarked agg → availableNow drain → sink) over the
driver's events table, so the correctness gate covers streaming, not
just its batch twins.

Each call stages the events table as timestamp-clean parquet in a fresh
temp dir (the file-stream source needs a declared schema and no
nano-timestamps), drains with trigger(availableNow=True) into a memory
sink, and returns the sink table. Deterministic per run → the tumbling
variant carries a full SQL oracle; the custom stateful operator is
rows-only (its emission rule — closed sessions only — has no ANSI
equivalent).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firstamerican_etl_spark.functions.stable import fast_sum, sql_fast_sum, stable_round
from firstamerican_etl_spark.plans.registry import register
from firstamerican_etl_spark.sources.io import load_table, staging_tag
from firstamerican_etl_spark.streaming.stateful import sessionize_with_state
from firstamerican_etl_spark.streaming.windows import read_events_stream


def _tmpdir(prefix: str) -> str:
    """mkdtemp + atexit cleanup. Landings/checkpoints are per-run
    scratch (a checkpoint MUST be fresh per drain — reusing one would
    replay or skip batches), but the pre-r10 bare mkdtemp leaked a full
    events-table copy per invocation into TMPDIR, growing without bound
    across bench/driver runs (r10 review)."""
    import atexit
    import shutil

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def _stage_events(
    spark: SparkSession, sf_dir: str, tag: str, n_files: int = 2
) -> tuple[str, str]:
    """Write events as clean parquet into a temp landing dir; returns
    (landing, checkpoint). Keyed by sf_dir so repeat calls reuse it.
    ``n_files=1`` guarantees a single micro-batch under availableNow —
    required when intra-run watermark advancement between batches
    could drop rows (stream-stream joins)."""
    from firstamerican_etl_spark.operators.scale import shared_stage

    base = shared_stage(
        f"stream_{tag}",
        staging_tag(sf_dir, "events"),
        lambda p: load_table(spark, sf_dir, "events")
        .coalesce(n_files)
        .write.mode("overwrite")
        .parquet(os.path.join(p, "landing")),
        markers=("landing/_SUCCESS",),
    )
    landing = os.path.join(base, "landing")
    ckpt = _tmpdir(prefix=f"fa_stream_ckpt_{tag}_")
    return landing, ckpt


def _drain(stream_df: DataFrame, name: str, ckpt: str, mode: str) -> DataFrame:
    # thin alias over the package's one drain recipe (argument order
    # here predates it; keep callers stable)
    from firstamerican_etl_spark.streaming.windows import run_available_now

    return run_available_now(stream_df, ckpt, name, output_mode=mode)


@register(
    "streaming_tumbling_window",
    oracle=f"""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       {sql_fast_sum("value")} AS sum_value
FROM events
GROUP BY 1, 2
""",
    tags=("streaming", "window", "tumbling"),
)
def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling window executed via Structured Streaming
    (file source → availableNow → memory sink), complete mode so every
    window is emitted; result equals the batch/SQL aggregation exactly.
    """
    landing, ckpt = _stage_events(spark, sf_dir, "tumble")
    stream = (
        read_events_stream(spark, landing)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fast_sum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    name = f"stream_tumble_{abs(hash((sf_dir, ckpt))) % 10**8}"
    return _drain(stream, name, ckpt, "complete")


@register(
    "streaming_sessionize_stateful",
    oracle="""
WITH closer AS (
  SELECT user_id, max(ts) + INTERVAL 30 DAYS AS ts,
         0.0 AS value, TRUE AS is_closer
  FROM events GROUP BY user_id
),
ev AS (
  SELECT user_id, ts, value, FALSE AS is_closer FROM events
  UNION ALL SELECT user_id, ts, value, is_closer FROM closer
),
flag AS (
  SELECT user_id, ts, value, is_closer,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 1800 SECONDS
              THEN 1 ELSE 0 END AS new_s
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
g AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flag
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
         / 1000000 AS sum_value
FROM g
GROUP BY user_id, sid
HAVING max(CASE WHEN is_closer THEN 1 ELSE 0 END) = 0
""",
    tags=("streaming", "stateful", "applyInPandasWithState"),
)
def streaming_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful sessionizer (applyInPandasWithState, event-time
    timeout) drained over the events stream. Emits CLOSED sessions; a
    per-user far-future closer row is appended to the landing data so
    the watermark passes every real session's horizon and the emission
    set is deterministic — and, since the closers are a pure function
    of the events table, SQL-SYNTHESIZABLE: the oracle regenerates
    them, runs the batch islands idiom over events ∪ closers, and
    drops the closer-only sessions (still open on the stream side).
    Values accumulate in exact 1e-6 int64 units inside the state
    handler (functions/stable.py discipline), so the emitted sums are
    bit-identical to the oracle's quantized sums — a FULL value oracle
    for a custom stateful streaming operator."""
    # this query writes its OWN landing (events + closer rows) — only
    # a fresh checkpoint dir is needed; staging the shared events copy
    # here would be a full table write nothing reads
    ckpt = _tmpdir(prefix="fa_stream_ckpt_sess_")
    landing = _tmpdir(prefix="fa_stream_sess_land_")
    ev = load_table(spark, sf_dir, "events")
    ev.coalesce(2).write.mode("overwrite").parquet(landing)
    closer = (
        ev.groupBy("user_id")
        .agg(
            F.max("event_id").alias("event_id"),
            (F.max("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        )
        .select(
            "event_id",
            "ts",
            "user_id",
            F.lit("closer").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    closer.coalesce(1).write.mode("append").parquet(landing)
    stream = sessionize_with_state(
        read_events_stream(spark, landing, max_files_per_trigger=2),
        gap_seconds=1800,
        watermark="1 minute",
    )
    name = f"stream_sess_{abs(hash((sf_dir, ckpt))) % 10**8}"
    out = _drain(stream, name, ckpt, "append")
    # The closers exist only to advance the watermark; whether a
    # closer's OWN single-row session also times out before the drain
    # ends depends on how far that user's last real event sits behind
    # the global maximum (watermark is global, timers are per-key).
    # Anti-join the known closer keys so the emission is exactly the
    # real sessions — the set the oracle computes — regardless of that
    # per-user timing.
    closer_keys = closer.select(
        F.col("user_id").alias("c_uid"), F.col("ts").alias("c_ts")
    )
    return out.join(
        closer_keys,
        (out.user_id == F.col("c_uid")) & (out.session_start == F.col("c_ts")),
        "left_anti",
    )


@register(
    "streaming_dedup_within_watermark",
    oracle="""
SELECT event_id, user_id, event_type,
       floor(CAST(value AS DOUBLE) * 100 + 0.5) / 100 AS value_r
FROM events
""",
    tags=("streaming", "dedup", "watermark", "within-watermark"),
)
def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` — the Spark 3.5+ dedup
    variant ``streaming_dedup_exactly_once`` CANNOT express: the
    duplicate copies here carry DIFFERENT event times (ts + 30 s — the
    at-least-once-ingest retry shape, where the replay is stamped at
    redelivery time), so keying the plain ``dropDuplicates`` on
    (event_id, ts) would pass both copies through. WithinWatermark
    keys on event_id alone and holds seen-key state for the watermark
    delay in EVENT TIME, emitting the first arrival only.

    Proof by construction, same as the exactly-once row: the landing
    file holds every event twice (original + jittered replay); the
    drained output must equal the original table. The emitted row is
    whichever copy arrived first — nondeterministic — so the checked
    columns are the ts-INDEPENDENT ones, identical on both copies by
    construction. Landing is ONE file ⇒ one availableNow micro-batch:
    both copies are always in the same batch, so intra-run watermark
    advancement can never expire a key between its two arrivals (the
    multi-batch hazard the n_files=1 contract exists for).

    State bound at scale: |keys within watermark horizon| — the same
    bounded-state argument as the exactly-once row, with the horizon
    covering the retry window instead of exact-timestamp replays."""
    ev = load_table(spark, sf_dir, "events")
    landing = _tmpdir(prefix="fa_stream_wwm_land_")
    doubled = ev.unionByName(
        ev.withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 SECONDS"))
    )
    doubled.coalesce(1).write.mode("overwrite").parquet(landing)
    ckpt = _tmpdir(prefix="fa_stream_wwm_ckpt_")
    deduped = (
        read_events_stream(spark, landing)
        .withWatermark("ts", "4 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    name = f"stream_wwm_{abs(hash((sf_dir, ckpt))) % 10**8}"
    out = _drain(deduped, name, ckpt, "append")
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        (F.floor(F.col("value").cast("double") * 100 + 0.5) / 100).alias("value_r"),
    )


@register(
    "streaming_dedup_exactly_once",
    oracle="""
SELECT event_id, user_id, event_type,
       floor(CAST(value AS DOUBLE) * 100 + 0.5) / 100 AS value_r
FROM events
""",
    tags=("streaming", "dedup", "exactly-once"),
)
def streaming_dedup_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup, proven by construction: the landing dir
    holds the events table written TWICE; the watermarked
    dropDuplicates stream must emit each event exactly once — the
    result equals the original table, which is exactly what the oracle
    asserts. State is bounded by the watermark horizon (seen-key state
    older than it is dropped)."""
    from firstamerican_etl_spark.streaming.windows import stream_dedup

    ev = load_table(spark, sf_dir, "events")
    landing = _tmpdir(prefix="fa_stream_dedup_land_")
    ev.coalesce(2).write.mode("overwrite").parquet(landing)
    ev.coalesce(2).write.mode("append").parquet(landing)  # exact duplicates
    ckpt = _tmpdir(prefix="fa_stream_dedup_ckpt_")
    deduped = stream_dedup(
        read_events_stream(spark, landing), keys=["event_id"], watermark="2 hours"
    )
    name = f"stream_dedup_{abs(hash((sf_dir, ckpt))) % 10**8}"
    out = _drain(deduped, name, ckpt, "append")
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        (F.floor(F.col("value").cast("double") * 100 + 0.5) / 100).alias("value_r"),
    )


@register(
    "streaming_sliding_window",
    oracle=f"""
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value FROM events
)
SELECT window_start, count(*) AS n_events,
       {sql_fast_sum("value")} AS sum_value
FROM assigned
GROUP BY 1
""",
    tags=("streaming", "window", "sliding"),
)
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1h width / 30m slide) through the real
    streaming path, complete-mode drain; each event lands in exactly 2
    epoch-aligned windows, same as the batch/SQL assignment."""
    landing, ckpt = _stage_events(spark, sf_dir, "slide")
    stream = (
        read_events_stream(spark, landing)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fast_sum(F.col("value")).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )
    name = f"stream_slide_{abs(hash((sf_dir, ckpt))) % 10**8}"
    return _drain(stream, name, ckpt, "complete")


@register(
    "streaming_interval_join",
    oracle="""
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
""",
    tags=("streaming", "stream-stream-join", "interval"),
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join through the real streaming path:
    purchases matched to same-user clicks from the preceding hour,
    both sides watermarked 1h — the attribution-join shape. The time
    bound is what makes unbounded stream-stream join feasible: state
    for each side is evicted once the other side's watermark passes
    the interval, so executor state is O(events per hour), not O(all
    history). Staged as a single landing file → one availableNow
    micro-batch, so no row is dropped by intra-run watermark
    advancement (multi-batch replays would need the watermark delay ≥
    landing-file time spread). Full SQL oracle: the batch interval
    join is the exact semantic twin."""
    landing, ckpt = _stage_events(spark, sf_dir, "ssjoin", n_files=1)
    purchases = (
        read_events_stream(spark, landing)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
    )
    clicks = (
        read_events_stream(spark, landing)
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select("purchase_id", "click_id", "user_id")
    name = f"stream_ssj_{abs(hash((sf_dir, ckpt))) % 10**8}"
    return _drain(joined, name, ckpt, "append")


@register(
    "streaming_static_enrich",
    oracle=f"""
SELECT c_mktsegment, event_type,
       count(*) AS n_events,
       {sql_fast_sum("value")} AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
""",
    tags=("streaming", "stream-static", "enrich"),
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the streaming events feed joins a
    STATIC dimension (customer, broadcast) before aggregating per
    (segment, event_type). The join is stateless — the static side is
    re-resolved per micro-batch, no stream state and no watermark for
    the join itself — which is why dimension enrichment belongs on the
    stream-static path, never stream-stream. The aggregate carries
    count + quantized-long sum (distinct aggregation is unsupported in
    streaming); complete-mode output equals the batch join exactly
    (full SQL oracle)."""
    landing, ckpt = _stage_events(spark, sf_dir, "enrich")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    stream = (
        read_events_stream(spark, landing)
        .join(F.broadcast(cust), F.col("user_id") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fast_sum(F.col("value")).alias("sum_value"),
        )
    )
    name = f"stream_enrich_{abs(hash((sf_dir, ckpt))) % 10**8}"
    return _drain(stream, name, ckpt, "complete")


@register(
    "streaming_custom_source_agg",
    oracle="""
SELECT user_id, event_type,
       count(*) AS n_events,
       CAST(sum(event_id) AS BIGINT) AS id_sum
FROM (
  SELECT i AS event_id,
         i % 50 AS user_id,
         ['click', 'view', 'purchase'][(i % 3) + 1] AS event_type
  FROM (SELECT unnest(generate_series(0, 299)) AS i)
)
GROUP BY 1, 2
""",
    tags=("streaming", "custom-source", "python-datasource"),
)
def streaming_custom_source_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python STREAMING DataSource under the correctness gate:
    the deterministic eventgen source (sources/eventgen_stream.py)
    drained through a streaming aggregation, checked against a
    closed-form SQL oracle that regenerates the same rows with
    generate_series — a full value oracle for a streaming source,
    possible only because offsets map to reproducible content (the
    property that also makes its checkpoint recovery exact)."""
    import time

    from firstamerican_etl_spark.sources.eventgen_stream import (
        EventGenStreamDataSource,
    )

    # register unconditionally: re-registration does NOT raise (the
    # fazip/jsonlgz rows prove it every bench min-of-2 run), so the old
    # blanket except-pass only ever swallowed REAL failures, which then
    # resurfaced ten lines later as a baffling "DataSource eventgen not
    # found" instead of the actual error (r10 review)
    spark.dataSource.register(EventGenStreamDataSource)
    n_total, per_batch = 300, 100
    stream = (
        spark.readStream.format("eventgen")
        .option("rows_per_batch", per_batch)
        .option("max_batches", n_total // per_batch)
        .load()
    )
    agg = stream.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("event_id").alias("id_sum"),
    )
    name = f"eventgen_agg_{abs(hash((sf_dir, time.time_ns()))) % 10**10}"
    ckpt = _tmpdir(prefix="fa_stream_ckpt_eventgen_")
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        done = None
        while time.time() < deadline:
            done = spark.table(name).agg(F.sum("n_events")).collect()[0][0]
            if done == n_total:
                break
            time.sleep(0.3)
        else:
            # a partial memory table would surface downstream as a
            # baffling oracle value mismatch; fail diagnosably instead
            raise TimeoutError(
                f"custom-source stream aggregated {done} of {n_total} "
                "events within 120s — source wedged or host overloaded"
            )
    finally:
        q.stop()
    return spark.table(name)


@register(
    "streaming_foreachbatch_ingest",
    oracle="""
SELECT doc_id, lang, source
FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
           ORDER BY doc_id
         ) AS rn
  FROM documents
) WHERE rn = 1
""",
    tags=("streaming", "foreachBatch", "incremental", "dedup"),
)
def streaming_foreachbatch_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest dedup via foreachBatch — the pattern a
    perpetually growing training corpus runs in production: each
    micro-batch computes content fingerprints, keeps first-per-
    fingerprint within itself, anti-joins against the ACCUMULATED
    fingerprint state table, and appends only genuinely new documents
    (state is a parquet table of 16-byte fingerprints + metadata, never
    the text). Here the corpus streams in as two files (low doc_ids
    first, maxFilesPerTrigger=1 → two micro-batches), so cross-batch
    duplicates exercise the state probe. The oracle is the plain
    keep-first dedup: survivors are batch-split-INVARIANT by
    construction (the earlier batch holds the lower ids, so the
    cross-batch survivor is the global min doc_id — same as within-
    batch), which is what makes an exact SQL oracle possible for an
    incremental streaming pipeline."""
    import atexit
    import glob
    import shutil
    import time as _time

    from firstamerican_etl_spark.operators.relational import dedup_top1_per_group

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    if max_id is None:  # empty corpus: nothing to ingest, keep the schema
        return docs.select("doc_id", "lang", "source").limit(0)
    mid = max_id // 2
    landing = _tmpdir(prefix="fa_stream_ingest_land_")
    now = _time.time()
    for tag, cond, offset in (
        ("00a", F.col("doc_id") <= mid, 0),
        ("00b", F.col("doc_id") > mid, 100),
    ):
        stage = _tmpdir(prefix=f"fa_stream_ingest_{tag}_")
        docs.filter(cond).coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dest = os.path.join(landing, f"{tag}.parquet")
        shutil.copy(part, dest)
        os.utime(dest, (now + offset, now + offset))
        shutil.rmtree(stage, ignore_errors=True)

    state = _tmpdir(prefix="fa_stream_ingest_state_")

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        fp = batch_df.withColumn(
            "fingerprint",
            F.md5(F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))),
        )
        fresh = dedup_top1_per_group(
            fp, partition_by=["fingerprint"], order_by=[F.col("doc_id")]
        )
        if glob.glob(os.path.join(state, "*.parquet")) or glob.glob(
            os.path.join(state, "part-*")
        ):
            seen = s.read.parquet(state).select("fingerprint")
            fresh = fresh.join(seen, "fingerprint", "left_anti")
        fresh.select("doc_id", "lang", "source", "fingerprint").write.mode(
            "append"
        ).parquet(state)

    ckpt = _tmpdir(prefix="fa_stream_ingest_ckpt_")
    try:
        stream = (
            spark.readStream.schema(
                "doc_id bigint, text string, lang string, source string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        q = (
            stream.writeStream.foreachBatch(ingest_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        # landing/ckpt are fully consumed once the availableNow drain
        # finishes; the state table backs the returned lazy frame, so
        # it lives until process exit.
        shutil.rmtree(landing, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        atexit.register(shutil.rmtree, state, ignore_errors=True)
    return spark.read.parquet(state).select("doc_id", "lang", "source")


@register(
    "streaming_ttl_throttle",
    oracle="""
WITH RECURSIVE ev AS (
  SELECT user_id, ts, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
kept AS (
  SELECT user_id, ts, event_id, rn, ts AS last_emit, TRUE AS emitted
  FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.ts, e.event_id, e.rn,
         CASE WHEN e.ts >= k.last_emit + INTERVAL 86400 SECONDS
              THEN e.ts ELSE k.last_emit END,
         e.ts >= k.last_emit + INTERVAL 86400 SECONDS
  FROM ev e JOIN kept k ON e.user_id = k.user_id AND e.rn = k.rn + 1
)
SELECT user_id, event_id, ts FROM kept WHERE emitted
""",
    tags=("streaming", "stateful", "throttle", "applyInPandasWithState"),
)
def streaming_ttl_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-time rate limiter (at most one emitted event per
    24 event-time hours per user) as a custom stateful streaming
    operator — ``streaming/stateful.py ttl_throttle_with_state``.

    The semantics are genuinely stateful: an event passes only based
    on which earlier events PASSED, so no lag/window expression
    expresses it — the exact oracle is a per-key recursive CTE walking
    the event sequence in (ts, event_id) order. Single-file landing →
    one availableNow micro-batch, so the per-key state machine sees
    every user's events in one sorted group and the emission set is
    exactly the sequential semantics the oracle computes."""
    from firstamerican_etl_spark.streaming.stateful import ttl_throttle_with_state

    landing, ckpt = _stage_events(spark, sf_dir, "throttle", n_files=1)
    stream = ttl_throttle_with_state(
        read_events_stream(spark, landing), ttl_seconds=86400
    )
    name = f"stream_throttle_{abs(hash((sf_dir, ckpt))) % 10**8}"
    return _drain(stream, name, ckpt, "append")


@register(
    "streaming_outer_interval_join",
    oracle="""
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
""",
    tags=("streaming", "stream-stream-join", "outer", "interval"),
)
def streaming_outer_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the semantics the inner
    attribution join can't exercise: an UNMATCHED purchase must still
    emit (null-padded), but only once the click-side watermark proves
    no qualifying click can still arrive. That deferred-null emission
    is the defining behavior of streaming outer joins, and the reason
    they need BOTH a watermark and a time-bound join condition (state
    eviction and null-emission share the same deadline).

    Two mechanics make the emission deterministic and complete:
    (1) one far-future closer row PER SIDE (type 'purchase' / 'click',
    sentinel user_id = -1) advances both watermark nodes past every
    real event. The closers must actually pass the type filters:
    placing the watermark node "before" the filter does not survive
    the optimizer — Catalyst pushes deterministic predicates through
    EventTimeWatermark, so a neither-type closer is filtered at the
    scan and never advances anything (measured: the last hour's
    unmatched purchases went unemitted). (2) The sentinel cleanup
    filter runs BATCH-SIDE on the memory-sink table, not inside the
    streaming plan — inside it, user_id >= 0 would be pushed below
    the watermark node through the join's key equality, recreating
    the same defeat. After the closers advance the watermark, the
    engine's no-data micro-batch (on by default) flushes every
    remaining unmatched left row before availableNow terminates. The
    batch LEFT JOIN with the identical interval condition is then the
    exact semantic twin — full value oracle, nulls included.

    Scale shape: identical to the inner interval join — per-side state
    is bounded by the 1-hour interval (evicted as the opposite
    watermark passes), so executor state is O(events/hour) forever;
    the join shuffles both sides by user_id once."""
    # own landing (events + sentinel closers); no shared staging needed
    ckpt = _tmpdir(prefix="fa_stream_ckpt_ssoj_")
    landing = _tmpdir(prefix="fa_stream_ssoj_land_")
    ev = load_table(spark, sf_dir, "events")
    ev.coalesce(1).write.mode("overwrite").parquet(landing)
    far = (F.max("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts")
    closers = ev.agg(
        F.lit(-1).cast("long").alias("event_id"),
        far,
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("purchase").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    ).unionAll(
        ev.agg(
            F.lit(-2).cast("long").alias("event_id"),
            far,
            F.lit(-1).cast("long").alias("user_id"),
            F.lit("click").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    closers.coalesce(1).write.mode("append").parquet(landing)
    purchases = (
        read_events_stream(spark, landing)
        .withWatermark("ts", "1 hour")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
    )
    clicks = (
        read_events_stream(spark, landing)
        .withWatermark("ts", "1 hour")
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left_outer",
    ).select("purchase_id", "click_id", "user_id")
    name = f"stream_ssoj_{abs(hash((sf_dir, ckpt))) % 10**8}"
    out = _drain(joined, name, ckpt, "append")
    # Sentinel cleanup OUTSIDE the streaming plan (see docstring).
    # Keyed on the closers' dedicated purchase_ids, NOT user_id sign:
    # real purchases with NULL/negative user_id must survive exactly
    # as the batch LEFT-JOIN oracle keeps them.
    return out.filter(
        ~F.col("purchase_id").isin(-1, -2) | F.col("purchase_id").isNull()
    )


# NOTE (not registered): a transformWithStateInPandas running-total
# operator — Spark 4's arbitrary-state successor to
# applyInPandasWithState — is implemented and wired in
# streaming/stateful.py (make_running_total_processor /
# running_total_with_state) with an exact running-sum-window oracle
# design. It cannot run in this container: the TransformWithState
# Python runner requires google.protobuf, which is absent here
# (ImportError at StreamingPythonRunner init; verified against the
# RocksDB state store provider too). tests/test_streaming.py carries
# the parity test behind a protobuf-importable gate — the PIL-codec
# precedent: real plumbing, loud environment gate, zero red rows.
