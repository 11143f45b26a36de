"""WebDataset-style tar-shard DataSource (Spark 4 Python DataSource
API, stdlib ``tarfile`` only): the sample-per-key, file-per-field
sharded tar layout multimodal LLM training loaders stream
(sample ``1234`` with an image and a metadata record is stored as
members ``1234.ppm`` + ``1234.json`` inside ``shard-*.tar``).

Write side::

    spark.dataSource.register(WdsDataSource)
    (df  # one column named __key__, the rest become member files
       .write.format("wds").mode("overwrite")
       .option("path", out_dir).save())

Each task writes ``shard-<partitionId>-<uuid>.tar`` (unique name per
attempt — task retries cannot collide), returning the shard name as
its commit message; driver-side ``commit`` writes a ``_SUCCESS``
manifest listing exactly the committed shards, ``abort`` removes
orphans. Binary columns are stored as-is; strings as UTF-8; anything
else is rejected (encode upstream — engine discipline, no silent
coercion).

Read side::

    (spark.read.format("wds")
       .option("path", out_dir)
       .option("columns", "ppm:binary,json:string")
       .load())  # => __key__ string, ppm binary, json string

One input partition per SHARD — the webdataset contract: a shard is
the unit of sequential I/O and shuffling, never split within (tar has
no random access without an index). Readers honor the ``_SUCCESS``
manifest when present (task-retry atomicity); without it they glob
``*.tar``. The ``columns`` option fixes the schema explicitly; when
absent, the first sample of the first shard is inspected (extension →
column, ``.json``/``.txt``/``.cls`` as string, the rest binary).

Scale notes: shards are independent, so a 100M-sample corpus is
|shards| parallel sequential reads with zero coordination; member
bytes never pass through the driver. Spark's shuffle never sees the
payloads unless a downstream op asks — the decode/transform chain
(operators/multimodal.py) is narrow mapInPandas over shard-aligned
partitions.
"""

from __future__ import annotations

import glob
import io
import os
import tarfile
import uuid

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

_KEY = "__key__"
_STRING_EXTS = {"json", "txt", "cls"}


class _ShardCommit(WriterCommitMessage):
    def __init__(self, filename: str):
        self.filename = filename


class _Shard(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WdsWriter(DataSourceWriter):
    def __init__(self, schema: T.StructType, options: dict, overwrite: bool):
        self.path = options["path"]
        names = [f.name for f in schema.fields]
        if _KEY not in names:
            raise ValueError(f"wds writer needs a '{_KEY}' column; got {names}")
        for f in schema.fields:
            if f.name == _KEY:
                continue
            if not isinstance(f.dataType, (T.BinaryType, T.StringType)):
                raise ValueError(
                    f"wds member column {f.name} must be binary or string, "
                    f"got {f.dataType.simpleString()} (encode upstream)"
                )
        self.fields = names
        # Crash-safe overwrite: do NOT delete anything up front — a
        # failed job must leave the previous generation (shards +
        # _SUCCESS manifest) fully readable. Old shards are removed in
        # commit(), after the new generation is durable; until then the
        # reader keeps resolving the OLD manifest and never sees the
        # in-flight shard files (uuid names cannot collide). Only
        # *.tar files are ever touched — subdirectories are ignored.
        self.overwrite = overwrite
        self._old_shards: list[str] = []
        # a crash between writing _SUCCESS.tmp and the atomic replace
        # in commit() strands the tmp forever (the .tar-only filters
        # skip it); clear any stale one now — a new write generation
        # is starting, so no in-flight commit can own it
        try:
            os.remove(os.path.join(self.path, "_SUCCESS.tmp"))
        except OSError:
            pass
        if overwrite and os.path.isdir(self.path):
            self._old_shards = [
                e.name
                for e in os.scandir(self.path)
                if e.is_file() and e.name.endswith(".tar")
            ]
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator) -> _ShardCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = f"shard-{pid:05d}-{uuid.uuid4().hex}.tar"
        key_idx = self.fields.index(_KEY)
        with tarfile.open(os.path.join(self.path, name), "w") as tar:
            for row in iterator:
                key = str(row[key_idx])
                for col, val in zip(self.fields, row):
                    if col == _KEY or val is None:
                        continue
                    payload = val if isinstance(val, (bytes, bytearray)) else str(val).encode()
                    info = tarfile.TarInfo(f"{key}.{col}")
                    info.size = len(payload)
                    tar.addfile(info, io.BytesIO(bytes(payload)))
        return _ShardCommit(name)

    def commit(self, messages) -> None:
        manifest = sorted(m.filename for m in messages)
        if not self.overwrite:
            # append: the committed generation is old manifest UNION new
            # shards. Without the merge, rewriting _SUCCESS with only
            # this job's shard names would silently hide every previous
            # shard from manifest-honoring readers while their tars sit
            # orphaned on disk (r10 review).
            prev = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(prev):
                with open(prev) as f:
                    manifest = sorted(
                        {ln.strip() for ln in f if ln.strip()} | set(manifest)
                    )
        # atomic manifest swap: a crash mid-commit must leave either
        # the old generation's manifest or the new one, never a
        # truncated half-written file (os.replace is atomic on POSIX)
        final = os.path.join(self.path, "_SUCCESS")
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(manifest))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final)
        # new generation is durable; now retire the old shards
        keep = set(manifest)
        for name in self._old_shards:
            if name not in keep:
                try:
                    os.remove(os.path.join(self.path, name))
                except OSError:
                    pass

    def abort(self, messages) -> None:
        # failed tasks contribute None commit messages (DataSourceWriter
        # contract) — skip them or the cleanup itself crashes and the
        # succeeded tasks' orphan shards survive (r10 review)
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.filename))
            except OSError:
                pass


def _shard_paths(path: str) -> list[str]:
    manifest = os.path.join(path, "_SUCCESS")
    if os.path.exists(manifest):
        with open(manifest) as f:
            names = [ln.strip() for ln in f if ln.strip()]
        return [os.path.join(path, n) for n in names]
    return sorted(glob.glob(os.path.join(path, "*.tar")))


class WdsReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.path = options["path"]

    def partitions(self):
        return [_Shard(p) for p in _shard_paths(self.path)]

    def read(self, partition: _Shard):
        if partition is None:  # empty partitions() → PySpark passes [None]
            return
        cols = [f.name for f in self.schema.fields if f.name != _KEY]
        types = {
            f.name: f.dataType for f in self.schema.fields if f.name != _KEY
        }
        current_key: str | None = None
        sample: dict[str, object] = {}

        def emit():
            return tuple(
                [current_key]
                + [sample.get(c) for c in cols]
            )

        with tarfile.open(partition.path) as tar:
            for member in tar:
                if not member.isfile():
                    continue
                key, _, ext = member.name.rpartition(".")
                if ext not in types:
                    continue  # pathGlobFilter-equivalent: skip junk members
                if key != current_key and current_key is not None:
                    yield emit()
                    sample = {}
                current_key = key
                data = tar.extractfile(member).read()
                sample[ext] = (
                    data
                    if isinstance(types[ext], T.BinaryType)
                    else data.decode("utf-8")
                )
            if current_key is not None:
                yield emit()


class WdsDataSource(DataSource):
    """``spark.read.format("wds")`` / ``df.write.format("wds")`` —
    see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "wds"

    def schema(self) -> T.StructType:
        fields = [T.StructField(_KEY, T.StringType(), nullable=False)]
        spec = self.options.get("columns")
        if spec:
            for part in spec.split(","):
                col, _, kind = part.strip().partition(":")
                dt = T.BinaryType() if kind.strip() in ("", "binary") else T.StringType()
                fields.append(T.StructField(col, dt, nullable=True))
            return T.StructType(fields)
        shards = _shard_paths(self.options["path"])
        if not shards:
            raise FileNotFoundError(self.options["path"])
        # inspect the first sample of the first shard
        exts: list[str] = []
        first_key: str | None = None
        with tarfile.open(shards[0]) as tar:
            for member in tar:
                if not member.isfile():
                    continue
                key, _, ext = member.name.rpartition(".")
                if first_key is None:
                    first_key = key
                if key != first_key:
                    break
                exts.append(ext)
        for ext in exts:
            dt = T.StringType() if ext in _STRING_EXTS else T.BinaryType()
            fields.append(T.StructField(ext, dt, nullable=True))
        return T.StructType(fields)

    def reader(self, schema: T.StructType) -> WdsReader:
        return WdsReader(schema, dict(self.options))

    def writer(self, schema: T.StructType, overwrite: bool) -> WdsWriter:
        return WdsWriter(schema, dict(self.options), overwrite)
