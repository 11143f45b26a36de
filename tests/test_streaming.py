"""Structured Streaming tests: each streaming transform must agree with
its batch twin on the same data (parity), and stateful operators must
emit exactly the closed sessions once the watermark passes.

Technique: the driver events table is rewritten as proper-timestamp
parquet files into a landing dir (the file-stream source), each query
drains it with trigger(availableNow=True) into a memory sink, and the
result is compared against the identical transformation applied to the
batch DataFrame. Windowed aggs run in 'complete' mode so every window
is emitted regardless of the final watermark; append-mode operators
(dedup, custom state) get a far-future closer event to push the
watermark past all real data.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from firstamerican_etl_spark.sources.io import load_table
from firstamerican_etl_spark.streaming.stateful import sessionize_with_state
from firstamerican_etl_spark.streaming.windows import (
    read_events_stream,
    sliding_counts,
    stream_dedup,
    session_aggregate,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def landing(spark, sf_dir, tmp_path_factory):
    """Events rewritten as clean timestamp parquet in a landing dir."""
    d = tmp_path_factory.mktemp("events_landing")
    ev = load_table(spark, sf_dir, "events")
    ev.coalesce(2).write.mode("overwrite").parquet(str(d / "events"))
    return str(d / "events"), ev


def _drain(stream_df, tmp_path_factory, name, mode):
    ckpt = str(tmp_path_factory.mktemp(f"ckpt_{name}"))
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_parity(spark, landing, tmp_path_factory):
    path, ev = landing
    stream = tumbling_counts(read_events_stream(spark, path))
    got = _drain(stream, tmp_path_factory, "tumbling", "complete")
    want = tumbling_counts(ev)  # same transform, batch source
    cols = ["window_start", "event_type", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)
    # sums compare after rounding (shuffle-order float addition)
    gs = {(r["window_start"], r["event_type"]): round(r["sum_value"], 6) for r in got.collect()}
    ws = {(r["window_start"], r["event_type"]): round(r["sum_value"], 6) for r in want.collect()}
    assert gs == ws


def test_sliding_parity(spark, landing, tmp_path_factory):
    path, ev = landing
    got = _drain(
        sliding_counts(read_events_stream(spark, path)),
        tmp_path_factory,
        "sliding",
        "complete",
    )
    want = sliding_counts(ev)
    cols = ["window_start", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_session_window_parity(spark, landing, tmp_path_factory):
    path, ev = landing
    got = _drain(
        session_aggregate(read_events_stream(spark, path)),
        tmp_path_factory,
        "sessions_native",
        "complete",
    )
    want = session_aggregate(ev)
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_dedup(spark, landing, tmp_path_factory):
    """Duplicate rows across files are emitted exactly once."""
    path, ev = landing
    dup_dir = str(tmp_path_factory.mktemp("dup_landing"))
    ev.limit(200).write.mode("overwrite").parquet(dup_dir)
    ev.limit(200).write.mode("append").parquet(dup_dir)  # exact dupes

    got = _drain(
        stream_dedup(read_events_stream(spark, dup_dir)),
        tmp_path_factory,
        "dedup",
        "append",
    )
    assert got.count() == 200
    assert got.select("event_id").distinct().count() == 200


def test_stateful_sessionizer_closes_sessions(spark, landing, tmp_path_factory):
    """applyInPandasWithState: a second availableNow run whose data
    pushes the watermark forward fires the event-time timeouts and
    emits the sessions closed by it."""
    path, ev = landing
    land = str(tmp_path_factory.mktemp("state_landing"))
    ckpt = str(tmp_path_factory.mktemp("state_ckpt"))
    out = str(tmp_path_factory.mktemp("state_out"))

    # keep it small & deterministic: 3 users
    small = ev.filter(F.col("user_id") < 3)
    small.coalesce(1).write.mode("overwrite").parquet(land)

    def run_once():
        # parquet sink: fault-tolerant, so the second run can recover
        # from the checkpoint (the memory sink cannot)
        stream = sessionize_with_state(
            read_events_stream(spark, land), gap_seconds=1800, watermark="1 minute"
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out)

    run_once()

    # closer: one far-future event per user pushes the watermark beyond
    # every real session's (end + gap) horizon
    closer = small.groupBy("user_id").agg(
        F.max("event_id").alias("event_id"),
        (F.max("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
    ).select(
        "event_id",
        "ts",
        "user_id",
        F.lit("closer").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    closer.coalesce(1).write.mode("append").parquet(land)
    got = run_once()

    # every real session (computed by the batch islands idiom) closed
    batch = session_aggregate(small, gap="30 minutes").filter(
        F.col("n_events") > 0
    )
    got_rows = {
        (r["user_id"], r["session_start"], r["n_events"]) for r in got.collect()
    }
    # native session_window start == first event ts; our custom operator
    # uses the same definition
    want_rows = {
        (r["user_id"], r["session_start"], r["n_events"]) for r in batch.collect()
    }
    # the closer events themselves may still be open (not yet timed out)
    # → compare on the batch sessions only
    missing = want_rows - got_rows
    assert not missing, f"sessions never emitted: {sorted(missing)[:5]}"


def test_checkpoint_incremental_resume(spark, sf_dir, tmp_path_factory):
    """The incremental-processing contract: a second availableNow run
    against the SAME checkpoint processes only files added since the
    first run, and restored dedup state still suppresses duplicates of
    batch-1 keys. This is how the 100 TB landing-zone pattern works —
    each scheduled drain picks up exactly the new files, exactly once."""
    land = str(tmp_path_factory.mktemp("incr_landing"))
    ckpt = str(tmp_path_factory.mktemp("incr_ckpt"))
    sink = str(tmp_path_factory.mktemp("incr_sink"))
    ev = load_table(spark, sf_dir, "events")
    first = ev.filter(F.col("event_id") < 100)
    first.coalesce(1).write.mode("overwrite").parquet(land)

    def drain():
        # file sink: the fault-tolerant sink that supports checkpoint
        # recovery (memory sinks do not)
        deduped = stream_dedup(
            read_events_stream(spark, land), keys=["event_id"], watermark="100 days"
        ).select("event_id")
        q = (
            deduped.writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink)

    out1 = drain()
    assert out1.count() == first.count()

    # batch 2: duplicates of run-1 keys + genuinely new rows
    dupes = ev.filter(F.col("event_id") < 50)        # already-seen keys
    fresh = ev.filter(F.col("event_id").between(100, 149))  # new keys
    dupes.unionByName(fresh).coalesce(1).write.mode("append").parquet(land)

    out2 = drain()  # same checkpoint → only the new landing file is read
    ids = [r["event_id"] for r in out2.collect()]
    # cumulative sink: batch-1 keys + the 50 fresh keys, no duplicates
    assert sorted(ids) == sorted(set(ids)), "dedup state lost across restart"
    assert set(ids) == set(range(150)), f"got {len(ids)} rows"


def test_eventgen_custom_stream_source(spark, tmp_path):
    """Custom Python streaming DataSource: deterministic content means
    the drained sink must hold EXACTLY the generated rows — total
    count, event_id checksum, and a windowed aggregate all checkable
    against closed-form values (rate-source tests can only count)."""
    import time

    from pyspark.sql import functions as F

    from firstamerican_etl_spark.sources.eventgen_stream import (
        EventGenStreamDataSource,
    )

    spark.dataSource.register(EventGenStreamDataSource)
    n_total = 300
    stream = (
        spark.readStream.format("eventgen")
        .option("rows_per_batch", 100)
        .option("max_batches", 3)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("eventgen_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("eventgen_sink").count() >= n_total:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    out = spark.table("eventgen_sink")
    assert out.count() == n_total
    row = out.agg(
        F.sum("event_id").alias("id_sum"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("ts").alias("t0"),
        F.max("ts").alias("t1"),
    ).collect()[0]
    assert row["id_sum"] == n_total * (n_total - 1) // 2
    assert row["n_users"] == 50
    assert (row["t1"] - row["t0"]).total_seconds() == n_total - 1


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithState's Python runner requires google.protobuf, "
    "absent in this container (StreamingPythonRunner init ImportError)",
)
def test_transform_with_state_running_total_parity(spark, sf_dir, tmp_path):
    """transformWithStateInPandas running-total operator equals the
    batch running-sum window exactly (1e-6-unit int64 accumulation).
    Requires the RocksDB state store provider and protobuf; gated like
    the PIL real-codec test."""
    from pyspark.sql import functions as F

    from firstamerican_etl_spark.sources.io import load_table
    from firstamerican_etl_spark.streaming.stateful import running_total_with_state
    from firstamerican_etl_spark.streaming.windows import read_events_stream

    landing = str(tmp_path / "landing")
    ev = load_table(spark, sf_dir, "events")
    ev.coalesce(1).write.mode("overwrite").parquet(landing)
    stream = running_total_with_state(read_events_stream(spark, landing))
    q = (
        stream.writeStream.format("memory")
        .queryName("tws_parity")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["event_id"], r["running_units"])
        for r in spark.table("tws_parity").collect()
    }
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = {
        (r["event_id"], r["running_units"])
        for r in ev.filter(
            (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
        )
        .select(
            "event_id",
            F.sum(
                F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast("long")
            )
            .over(w)
            .alias("running_units"),
        )
        .collect()
    }
    assert got == want


def test_stateful_fns_merge_arrow_chunks_before_walking():
    """A key whose micro-batch spans multiple Arrow chunks arrives as
    several pdfs in ARBITRARY relative order; the sessionizer and the
    TTL throttle must concat-then-sort ONCE, not walk per-chunk (a
    later-timestamp chunk walked first mis-sets session boundaries /
    emits events a correctly ordered walk suppresses). Pure-Python
    drive of the state functions with a fake GroupState."""
    import pandas as pd

    from firstamerican_etl_spark.streaming.stateful import (
        _session_fn,
        _throttle_fn,
    )

    class FakeState:
        exists = False
        hasTimedOut = False
        watermark_ms = 0

        def update(self, v):
            self.exists, self._v = True, v

        @property
        def get(self):
            return self._v

        def remove(self):
            self.exists = False

        def setTimeoutTimestamp(self, ts):
            pass

        def getCurrentWatermarkMs(self):
            return self.watermark_ms

    def mk(ts_list):
        return pd.DataFrame(
            {
                "user_id": [1] * len(ts_list),
                "event_id": list(range(100, 100 + len(ts_list))),
                "ts": pd.to_datetime(ts_list),
                "value": [1.0] * len(ts_list),
            }
        )

    # chunk A holds the LATER events, delivered first
    late = mk(["2024-01-01 10:00:00", "2024-01-01 10:00:30"])
    early = mk(["2024-01-01 08:00:00", "2024-01-01 08:00:20"])

    st = FakeState()
    out = list(_session_fn(gap_seconds=600)((1,), iter([late, early]), st))
    starts, ends, counts, _sums = st.get
    # TWO open sessions (r10 multi-session state): the 08:00 pair and
    # the 10:00 pair — per-chunk walking would fold all four into one
    # session starting at 10:00, and the pre-r10 single-session state
    # would have prematurely closed the 08:00 pair (a late event inside
    # the watermark could still extend it). Nothing is emitted at
    # watermark 0.
    us = lambda s: int(pd.Timestamp(s).value) // 1000  # noqa: E731
    assert starts == [us("2024-01-01 08:00:00"), us("2024-01-01 10:00:00")]
    assert counts == [2, 2]
    assert out == []

    # advance the watermark past the first session's horizon (end+gap)
    # but not the second's: ONLY the 08:00 session flushes
    st.watermark_ms = (us("2024-01-01 09:00:00")) // 1000
    st.hasTimedOut = True
    out = list(_session_fn(gap_seconds=600)((1,), iter([]), st))
    assert len(out) == 1 and len(out[0]) == 1
    assert str(out[0]["session_start"].iloc[0]) == "2024-01-01 08:00:00"
    assert int(out[0]["n_events"].iloc[0]) == 2
    starts2, _e, counts2, _s = st.get
    assert starts2 == [us("2024-01-01 10:00:00")] and counts2 == [2]

    # a LATE event that bridges nothing but lands within gap BEFORE the
    # open session's start must extend it DOWNWARD (the pre-r10 walker
    # kept start frozen)
    st.hasTimedOut = False
    lateback = mk(["2024-01-01 09:52:00"])
    list(_session_fn(gap_seconds=600)((1,), iter([lateback]), st))
    starts3, ends3, counts3, _s3 = st.get
    assert starts3 == [us("2024-01-01 09:52:00")]
    assert ends3 == [us("2024-01-01 10:00:30")]
    assert counts3 == [3]

    st2 = FakeState()
    out = list(_throttle_fn(ttl_seconds=3600)((1,), iter([late, early]), st2))
    kept = sorted(pd.concat(out)["ts"]) if out else []
    # ordered walk: 08:00 emits, 08:00:20 suppressed, 10:00 emits
    # (>=1h later), 10:00:30 suppressed. Chunk-order walk would emit
    # 10:00 first and then suppress BOTH 08:00 events.
    assert [str(t) for t in kept] == [
        "2024-01-01 08:00:00", "2024-01-01 10:00:00"
    ]
