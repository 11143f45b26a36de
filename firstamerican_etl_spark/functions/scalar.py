"""Scalar expression toolkit (SURVEY.md §2.8, F1-F14).

Every helper is a pure composition of built-in ``pyspark.sql.functions``
Column expressions — JVM-side, whole-stage-codegen'd, no Python in the
hot path. Citations refer to /root/reference/fa-etl.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def cast_long(col: Column | str) -> Column:
    """F1 — id/amount/year normalization (fa-etl.py:63,67,...)."""
    return F.col(col).cast("long") if isinstance(col, str) else col.cast("long")


def cast_string(col: Column | str) -> Column:
    """F2 — pre-string-op coercion (fa-etl.py:65,69-74)."""
    return F.col(col).cast("string") if isinstance(col, str) else col.cast("string")


def year_slice(col: Column | str, n: int = 4) -> Column:
    """F3 — leading slice of a YYYYMMDD string (fa-etl.py:65,73)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c.cast("string"), 1, n)


def lpad_code(col: Column | str, width: int) -> Column:
    """F4 — restore leading zeros on code columns: FIPS→5, tract→6,
    block→4, ZIP→5 (fa-etl.py:69,170-173). These stay strings end-to-end
    — casting them to int would destroy the zeros again."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lpad(c.cast("string"), width, "0")


def compact_date(col: Column | str, fmt: str = "yyyyMMdd") -> Column:
    """F5 — parse compact date strings, NULL on failure (fa-etl.py:70-72
    ``str.to_date('%Y%m%d', strict=False)``). Requires ANSI off so bad
    input nulls instead of raising (session.py pins this)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c.cast("string"), fmt)


def year_of(col: Column | str) -> Column:
    """F6 — year extraction (fa-etl.py:77-79)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.year(c)


def domain_whitelist(col: Column | str, allowed: Sequence[str]) -> Column:
    """F7 — keep values in a whitelist, else NULL (fa-etl.py:74,174:
    TransactionType ∈ '1'..'6', GeoStatusCode ∈ {5,7,9,A,B,X,R})."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isin(list(allowed)), c).otherwise(F.lit(None))


def nullif_zero(col: Column | str) -> Column:
    """F7 variant — 0-coded missing values → NULL (lat/long == 0 at
    fa-etl.py:168-169)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(c, F.lit(0))


def flag_when(cond: Column, true_val: int = 1, false_val: int = 0) -> Column:
    """F8 — boolean flag column (SaleFlag heuristic, fa-etl.py:80)."""
    return F.when(cond, F.lit(true_val)).otherwise(F.lit(false_val))


def coalesce_cascade(
    branches: Sequence[tuple[Column | str, str]],
    skip_zero: bool = True,
) -> tuple[Column, Column]:
    """F9 — predicated coalesce with provenance tag (fa-etl.py:397-413).

    Returns ``(value, used)``: ``value`` is the first branch column that
    is non-null (and non-zero when ``skip_zero``); ``used`` is the
    matching provenance label. NOT plain ``coalesce`` — the reference
    skips zeros too (fa-etl.py:397), which coalesce would keep.

    ``branches`` is an ordered [(column, label), ...].
    """
    value: Column | None = None
    used: Column | None = None
    for col, label in branches:
        c = F.col(col) if isinstance(col, str) else col
        cond = c.isNotNull() & (c != 0) if skip_zero else c.isNotNull()
        value = F.when(cond, c) if value is None else value.when(cond, c)
        used = F.when(cond, F.lit(label)) if used is None else used.when(cond, F.lit(label))
    assert value is not None and used is not None, "need at least one branch"
    return value.otherwise(F.lit(None)), used.otherwise(F.lit(None))


def concat_with_fallback(
    left: Column | str, right: Column | str, sep: str = "_"
) -> Column:
    """F11 — null-propagating concat with fallback to the left column
    (fa-etl.py:175). ``concat_ws`` would silently skip the null side and
    yield 'FIPS_' — the reference semantics need concat (null if any
    input null) + coalesce back to FIPS."""
    l = F.col(left) if isinstance(left, str) else left
    r = F.col(right) if isinstance(right, str) else right
    return F.coalesce(F.concat(l, F.lit(sep), r), l)


def null_column(dtype: str = "long") -> Column:
    """F14 — typed NULL column for schema stability when an optional
    input side is empty (fa-etl.py:384-391)."""
    return F.lit(None).cast(dtype)
