"""Custom Python STREAMING DataSource (Spark 4 simple-stream API): a
deterministic synthetic events source — like the built-in ``rate``
source, but with reproducible CONTENT, so streaming tests and demos
can assert exact values instead of row counts.

Offsets are plain row counters: batch k covers rows
[k·rows_per_batch, (k+1)·rows_per_batch). ``read`` advances the
offset; ``readBetweenOffsets`` replays any committed range
deterministically (this is what makes checkpoint recovery exact —
the source regenerates byte-identical rows for a re-read range, the
property object stores / Kafka give you and ``rate`` cannot for
content). After ``max_batches`` batches the source returns empty
batches, so an idle drain terminates.

Row i (globally, 0-based):
    event_id = i
    ts       = 2024-01-01T00:00:00Z + i seconds
    user_id  = i mod 50
    event_type = cycle(click, view, purchase)[i mod 3]
    value    = (i * 37 mod 1000) / 10.0

Usage::

    spark.dataSource.register(EventGenStreamDataSource)
    df = (spark.readStream.format("eventgen")
          .option("rows_per_batch", 100)
          .option("max_batches", 5).load())
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql import types as T

_BASE = _dt.datetime(2024, 1, 1, 0, 0, 0)
_TYPES = ("click", "view", "purchase")

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _row(i: int):
    return (
        i,
        _BASE + _dt.timedelta(seconds=i),
        i % 50,
        _TYPES[i % 3],
        (i * 37 % 1000) / 10.0,
    )


class EventGenStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_batches = int(options.get("max_batches", 5))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        lo = start["offset"]
        # never let the cap move the end offset BEHIND a checkpointed
        # start (restarting with smaller max_batches would otherwise
        # report end < start — an invalid offset regression instead of
        # a clean empty batch; r10 review)
        hi = max(lo, min(lo + self.rows_per_batch, self.rows_per_batch * self.max_batches))
        return (iter([_row(i) for i in range(lo, hi)]), {"offset": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(start["offset"], end["offset"])])


class EventGenStreamDataSource(DataSource):
    """``spark.readStream.format("eventgen")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self) -> T.StructType:
        return SCHEMA

    def simpleStreamReader(self, schema: T.StructType) -> EventGenStreamReader:
        return EventGenStreamReader(self.options)
