"""Watermarked window aggregations over a streaming events source.

Design: every transform takes ANY DataFrame (batch or streaming) — the
logical plan is identical; only the source/sink differ. Late data is
bounded by the watermark: state for a window is dropped once the
watermark passes window.end, which is what makes these aggregations
runnable indefinitely at scale (unbounded state is the 100 TB streaming
failure mode, not throughput).

At cluster scale the shuffle for a windowed groupBy keys on
(window, extra keys); skew lands on hot event_types — AQE does not
re-plan streaming stages, so hot keys should be salted upstream or the
state store partitions raised (spark.sql.shuffle.partitions is fixed
for the lifetime of a streaming query's checkpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Events stream schema — matches /root/testdata/*/events.parquet with
#: a microsecond ts (streams must declare schemas; inference is a batch
#: luxury the file source disallows by default).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = EVENTS_SCHEMA,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream: new files under ``path`` become micro-batch
    input (the cloud-scale pattern: a loader drops parquet into a
    landing prefix; the stream picks them up exactly-once via the
    checkpointed file index)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling windows per event type (stream twin of
    plans/eventplans.events_tumbling_window).

    ``approx_count_distinct`` replaces the batch countDistinct: exact
    distinct inside a streaming agg would keep every user_id in state;
    the HLL sketch is bounded-size state — the correct scale trade.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users_approx",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding windows (stream twin of events_sliding_window)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


def session_aggregate(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (``F.session_window``): per-user sessions
    closed after ``gap`` of inactivity. Stream twin of
    events_session_window's islands idiom — the native operator merges
    overlapping session fragments across micro-batches in the state
    store, which the lag/cumsum idiom cannot do incrementally."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup on event identity. With the watermark,
    Spark drops seen-key state older than the horizon — bounded state,
    exactly-once per key within the late-data window. (The batch twin
    is plans/dedupplans.dedup_exact.)"""
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicates(keys + ["ts"])


def run_available_now(
    stream_df: DataFrame,
    checkpoint_dir: str,
    query_name: str,
    output_mode: str = "append",
) -> DataFrame:
    """Drain everything currently in the source and stop (the batch-like
    trigger used by tests and backfills), collecting results via the
    memory sink. Returns the result as a DataFrame of the sink table.

    Production sinks are ``writeStream.format('parquet'/'delta')`` with
    the same checkpoint contract; the memory sink is test-only (it
    materializes on the driver).
    """
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
