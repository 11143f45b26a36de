"""Local replica of the driver's DuckDB-oracle comparison: run the
Spark plan and the oracle SQL on the same parquet tables, then compare
row count, column names, and order-insensitive values EXACTLY (the
driver hashes values, so any bit difference fails — we surface it
here first with a readable diff)."""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

from firstamerican_etl_spark.sources.io import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    # Arrow fetch, not DBAPI fetchall(): the round driver fetches
    # through Arrow, where DuckDB HUGEINT arrives as Decimal (r04
    # lesson).  DBAPI coerces it to int and hides the divergence.
    tbl = con.execute(sql).arrow()
    cols = tbl.column_names
    pydata = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    rows = list(zip(*pydata)) if cols else []
    con.close()
    return cols, rows


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # normalize -0.0
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    # decimals, numpy scalars
    if hasattr(v, "item"):
        return _norm_cell(v.item())
    return v


def normalize(cols, rows):
    """Sort columns by name, then rows by value — order-insensitive."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return [cols[i] for i in order], out


def spark_rows(df):
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def compare(name: str, spark_df, oracle: str, sf_dir: str) -> list[str]:
    """Returns a list of human-readable mismatch strings (empty = pass)."""
    errs: list[str] = []
    s_cols, s_rows = spark_rows(spark_df)
    o_cols, o_rows = run_oracle(oracle, sf_dir)
    if sorted(s_cols) != sorted(o_cols):
        errs.append(f"{name}: columns differ spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return errs
    if len(s_rows) != len(o_rows):
        errs.append(f"{name}: rowcount spark={len(s_rows)} oracle={len(o_rows)}")
    sc, sn = normalize(s_cols, s_rows)
    oc, on = normalize(o_cols, o_rows)
    for i, (a, b) in enumerate(zip(sn, on)):
        # repr comparison, not ==: Python says 3 == Decimal('3'), but
        # the driver's typed hash does not — a DuckDB HUGEINT leaking
        # into an oracle must FAIL here (r04 lesson).
        if repr(a) != repr(b):
            errs.append(f"{name}: first row diff at {i}:\n  cols ={sc}\n  spark={a}\n  duck ={b}")
            break
    return errs
