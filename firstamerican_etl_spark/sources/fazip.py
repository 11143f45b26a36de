"""Custom Python DataSource (Spark 4 API): read FA ``.txt.zip``
extracts directly as a DataFrame — no driver-side unzip staging.

The reference extracts every zip on the driver before scanning
(fa-etl.py:53-55); ``sources/io.extract_zips`` reproduces that for the
faithful pipeline. This source is the Spark-native upgrade: each zip
MEMBER becomes an input partition, so a national run decompresses
hundreds of county files in parallel ON EXECUTORS, reading bytes
straight from the archive (zip entries are independently deflated —
per-member parallelism is safe; splitting within a member is not,
which is why the unit is the member).

Usage::

    spark.dataSource.register(FaZipDataSource)
    df = (spark.read.format("fazip")
          .option("path", "/data/raw/Deed*.txt.zip")
          .option("sep", "|")
          .load())            # all columns string, header-named

Schema: header of the first member (all strings — matching the
engine's explicit-cast discipline, SURVEY.md §1.3). Malformed rows are
padded/truncated to the header width (PERMISSIVE-equivalent).
"""

from __future__ import annotations

import glob
import io
import zipfile

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T


class _ZipMember(InputPartition):
    def __init__(self, zip_path: str, member: str):
        self.zip_path = zip_path
        self.member = member


def _resolve_paths(options: dict) -> list[str]:
    """``paths`` (os.pathsep-separated EXPLICIT file list) wins over the
    ``path`` glob. Callers that already discovered their inputs (the
    pipeline's family discovery) pass the exact list — re-deriving it
    from a glob both missed valid names the discovery accepted and
    silently picked up files that arrived after discovery (r10
    review)."""
    import os

    explicit = options.get("paths")
    if explicit:
        return sorted(p for p in explicit.split(os.pathsep) if p)
    return sorted(glob.glob(options["path"]))


class FaZipReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema = schema
        self.sep = options.get("sep", "|")
        self.paths = _resolve_paths(options)

    def partitions(self):
        parts = []
        for zp in self.paths:
            with zipfile.ZipFile(zp) as zf:
                for m in zf.namelist():
                    if not m.endswith("/"):
                        parts.append(_ZipMember(zp, m))
        return parts

    def read(self, partition: _ZipMember):
        if partition is None:  # empty partitions() → PySpark passes [None]
            return
        n = len(self.schema.fields)
        with zipfile.ZipFile(partition.zip_path) as zf:
            with zf.open(partition.member) as raw:
                text = io.TextIOWrapper(raw, encoding="utf-8", errors="replace")
                header = text.readline()  # skip; schema already fixed
                if not header:
                    return
                for line in text:
                    cells = line.rstrip("\r\n").split(self.sep)
                    # PERMISSIVE shape: truncate ragged, null-pad short
                    if len(cells) > n:
                        cells = cells[:n]
                    elif len(cells) < n:
                        cells = cells + [None] * (n - len(cells))
                    yield tuple(c if c != "" else None for c in cells)


class FaZipDataSource(DataSource):
    """spark.read.format("fazip") — zipped pipe-delimited text source."""

    @classmethod
    def name(cls) -> str:
        return "fazip"

    def schema(self) -> T.StructType:
        # header of the first member of the first zip, all strings
        paths = _resolve_paths(self.options)
        if not paths:
            raise FileNotFoundError(
                self.options.get("paths") or self.options["path"]
            )
        sep = self.options.get("sep", "|")
        with zipfile.ZipFile(paths[0]) as zf:
            member = next(m for m in zf.namelist() if not m.endswith("/"))
            with zf.open(member) as raw:
                header = (
                    io.TextIOWrapper(raw, encoding="utf-8", errors="replace")
                    .readline()
                    .rstrip("\r\n")
                )
        return T.StructType(
            [
                T.StructField(c, T.StringType(), nullable=True)
                for c in header.split(sep)
            ]
        )

    def reader(self, schema: T.StructType) -> FaZipReader:
        return FaZipReader(schema, dict(self.options))
