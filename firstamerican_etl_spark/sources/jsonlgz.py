"""Custom Python DataSource WRITER (Spark 4 API): export a DataFrame
as sharded ``.jsonl.gz`` — the interchange format LLM training
pipelines consume (one JSON object per line, gzip per shard, one
shard per task, written ON EXECUTORS).

The read side needs no custom code — Spark's JSON reader decompresses
``.gz`` transparently (``spark.read.schema(s).json(dir)``), which is
what the round-trip test uses. This module exists for the write side,
which Spark cannot otherwise produce as gzip-jsonl shards without a
repartition-to-text detour.

Usage::

    spark.dataSource.register(JsonlGzDataSource)
    df.write.format("jsonlgz").mode("overwrite").option("path", out).save()

Commit protocol: each task writes ``part-<partitionId>-<uuid>.jsonl.gz``
(unique name per attempt → retries can't collide), returns the file
name as its commit message; the driver-side ``commit`` writes a
``_SUCCESS`` manifest listing exactly the committed shards, and
``abort`` removes the orphans. Readers that honor the manifest get
task-retry atomicity; plain directory readers see at-least-once files
(same contract as Hadoop's v1 committer without the rename).

Supported value types: the JSON-native scalars (str/int/float/bool/
None) plus date/timestamp (ISO strings) and arrays/structs of those —
i.e. everything the driver testdata uses. Binary columns are not
supported (encode upstream).
"""

from __future__ import annotations

import datetime as _dt
import gzip
import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql import types as T


class _ShardCommit(WriterCommitMessage):
    def __init__(self, filename: str):
        self.filename = filename


def _jsonable(v):
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if hasattr(v, "asDict"):
        return {k: _jsonable(x) for k, x in v.asDict().items()}
    return v


class JsonlGzWriter(DataSourceWriter):
    def __init__(self, schema: T.StructType, options: dict, overwrite: bool):
        self.path = options["path"]
        self.fields = [f.name for f in schema.fields]
        if overwrite and os.path.isdir(self.path):
            for f in os.listdir(self.path):
                os.remove(os.path.join(self.path, f))
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator) -> _ShardCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl.gz"
        full = os.path.join(self.path, name)
        with gzip.open(full, "wt", encoding="utf-8") as out:
            for row in iterator:
                rec = {k: _jsonable(v) for k, v in zip(self.fields, row)}
                out.write(json.dumps(rec, ensure_ascii=False))
                out.write("\n")
        return _ShardCommit(name)

    def commit(self, messages) -> None:
        manifest = sorted(m.filename for m in messages)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write("\n".join(manifest))

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(os.path.join(self.path, m.filename))
            except OSError:
                pass


class JsonlGzDataSource(DataSource):
    """``df.write.format("jsonlgz")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "jsonlgz"

    def writer(self, schema: T.StructType, overwrite: bool) -> JsonlGzWriter:
        return JsonlGzWriter(schema, self.options, overwrite)
