"""Measure a REAL single-node reference baseline for the FA ETL.

The reference (`/root/reference/fa-etl.py`) publishes no timings, so
the bench contract has had no denominator. This tool produces one: it
generates identical FA-shaped raw inputs (tools/fa_bench_data.py) at
two scales and times, on the same files,

  (a) the reference pipeline — `fa-etl.py` itself when polars is
      importable; otherwise a step-faithful DuckDB transliteration
      (this container has no polars and installs are prohibited).
      The transliteration preserves the reference's exact dataflow —
      per-county processing, the same staged parquet files
      (Deed/Prop/TaxHist/ValHist, ranked_Deed, assd/market/appr,
      rankedtemp1/rankedtemp2, ranked_ValHist, merged), snappy
      compression, every intermediate written to disk and re-read,
      cleaning semantics transliterated clause-for-clause from
      fa-etl.py:20-483 — executed by DuckDB, a state-of-the-art
      single-node columnar engine. As a baseline this is FAVORABLE to
      the reference: DuckDB's parallel CSV reader and join engine are
      at least competitive with polars' streaming engine on this
      workload shape.
  (b) our Spark pipeline (`pipeline/run.py run_pipeline`) on a fresh
      copy of the same inputs.

Both sides generalize the reference's single-county merge TODO
(fa-etl.py:581-582) identically: every county is converted AND merged
(the reference itself merges only the first county per family — a
bug its authors flagged; timing that would under-count its work).

Output: one JSON line per scale with wall-clocks, output row parity,
and the spark/baseline ratio, plus a ready-to-paste markdown table.

Run:  python tools/measure_baseline.py [--props 20000 200000]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import shutil
import sys
import tempfile
import time
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

# ----------------------------------------------------------------- duckdb proxy

_CSV = (
    "read_csv('{path}', delim='|', header=true, all_varchar=true, "
    "ignore_errors=true, null_padding=true)"
)

# fa-etl.py:60-87 (convert_sales cleaning), transliterated clause-for-clause
_DEED_SQL = """
SELECT CAST(PropertyID AS BIGINT) AS PropertyID,
       CAST(SaleAmt AS BIGINT) AS SaleAmt,
       try_strptime(RecordingDate, '%Y%m%d')::DATE AS RecordingDate,
       lpad(FIPS, 5, '0') AS FIPS,
       try_strptime(FATimeStamp, '%Y%m%d')::DATE AS FATimeStamp,
       FATransactionID,
       CASE WHEN TransactionType IN ('1','2','3','4','5','6')
            THEN TransactionType END AS TransactionType,
       try_strptime(SaleDate, '%Y%m%d')::DATE AS SaleDate,
       substr(RecordingDate, 1, 4) AS RecordingYearSlice,
       substr(FATransactionID, 1, 1) AS FATransactionID_1,
       CAST(year(try_strptime(RecordingDate, '%Y%m%d')) AS BIGINT) AS RecordingYear,
       year(try_strptime(SaleDate, '%Y%m%d')) AS SaleYear,
       year(try_strptime(FATimeStamp, '%Y%m%d')) AS FATimeStampYear,
       CASE WHEN substr(FATransactionID, 1, 1) IN ('1','6')
                 AND TransactionType IN ('2','3')
            THEN 1 ELSE 0 END AS SaleFlag
FROM {src}
WHERE PropertyID IS NOT NULL
  AND CAST(SaleAmt AS BIGINT) > 0 AND SaleAmt IS NOT NULL
"""

# fa-etl.py:96-110 (ranked sales: most recent sale per year/property).
# Null-date reject + (SaleAmt, FATransactionID) tiebreak mirror the
# Spark side (pipeline/convert.rank_deed) exactly — without them a
# same-date duplicate would be broken arbitrarily by DuckDB and the
# parity columns would flap on inputs the generator happens not to
# produce today (r10 review).
_RANKED_DEED_SQL = """
SELECT PropertyID, SaleAmt, RecordingYear
FROM (
  SELECT PropertyID, SaleAmt, RecordingYear,
         row_number() OVER (
           PARTITION BY RecordingYear, PropertyID
           ORDER BY RecordingDate DESC, SaleAmt, FATransactionID
         ) AS rk
  FROM read_parquet('{deed}')
  WHERE SaleFlag = 1 AND RecordingDate IS NOT NULL
) WHERE rk = 1
"""

# fa-etl.py:160-176 (convert_prop cleaning)
_PROP_SQL = """
SELECT CAST(PropertyID AS BIGINT) AS PropertyID,
       PropertyClassID,
       try_strptime(FATimeStamp, '%Y%m%d')::DATE AS FATimeStamp,
       CASE WHEN CAST(SitusLatitude AS DOUBLE) = 0 THEN NULL
            ELSE CAST(SitusLatitude AS DOUBLE) END AS SitusLatitude,
       CASE WHEN CAST(SitusLongitude AS DOUBLE) = 0 THEN NULL
            ELSE CAST(SitusLongitude AS DOUBLE) END AS SitusLongitude,
       SitusFullStreetAddress, SitusCity, SitusState,
       lpad(SitusZIP5, 5, '0') AS SitusZIP5,
       lpad(FIPS, 5, '0') AS FIPS,
       lpad(SitusCensusTract, 6, '0') AS SitusCensusTract,
       lpad(SitusCensusBlock, 4, '0') AS SitusCensusBlock,
       CASE WHEN SitusGeoStatusCode IN ('5','7','9','A','B','X','R')
            THEN SitusGeoStatusCode END AS SitusGeoStatusCode,
       coalesce(lpad(FIPS, 5, '0') || '_' || lpad(SitusCensusTract, 6, '0'),
                lpad(FIPS, 5, '0')) AS FIPS_SitusCensusTract
FROM {src}
WHERE PropertyClassID = 'R' AND PropertyID IS NOT NULL
"""

# fa-etl.py:216-224 (convert_taxhist)
_TAXHIST_SQL = """
SELECT CAST(PropertyID AS BIGINT) AS PropertyID,
       CAST(TaxYear AS BIGINT) AS TaxYear,
       CAST(TaxAmt AS BIGINT) AS TaxAmt,
       CAST(TaxAmt AS BIGINT) / 100 AS TaxAmtAdjusted
FROM {src}
"""

# fa-etl.py:297-309 (convert_valhist casts)
_VALHIST_SQL = """
SELECT CAST(PropertyID AS BIGINT) AS PropertyID,
       CAST(AssdTotalValue AS BIGINT) AS AssdTotalValue,
       CAST(AssdYear AS BIGINT) AS AssdYear,
       CAST(MarketTotalValue AS BIGINT) AS MarketTotalValue,
       CAST(MarketValueYear AS BIGINT) AS MarketValueYear,
       CAST(ApprTotalValue AS BIGINT) AS ApprTotalValue,
       CAST(ApprYear AS BIGINT) AS ApprYear,
       CAST(TaxableYear AS BIGINT) AS TaxableYear
FROM {src}
"""

# fa-etl.py:395-419 (value cascade + Assd filter)
_RANKED_VALHIST_SQL = """
SELECT PropertyID, Year, Value, MarketTotalValue, ApprTotalValue
FROM (
  SELECT *,
         CASE WHEN AssdTotalValue IS NOT NULL AND AssdTotalValue != 0
                THEN AssdTotalValue
              WHEN MarketTotalValue IS NOT NULL AND MarketTotalValue != 0
                THEN MarketTotalValue
              WHEN ApprTotalValue IS NOT NULL AND ApprTotalValue != 0
                THEN ApprTotalValue END AS Value,
         CASE WHEN AssdTotalValue IS NOT NULL AND AssdTotalValue != 0
                THEN 'Assd'
              WHEN MarketTotalValue IS NOT NULL AND MarketTotalValue != 0
                THEN 'Market'
              WHEN ApprTotalValue IS NOT NULL AND ApprTotalValue != 0
                THEN 'Appr' END AS AssessmentUsed
  FROM read_parquet('{temp2}')
) WHERE AssessmentUsed = 'Assd'
"""

# fa-etl.py:459-483 (unified merge, minus the dropped columns)
_MERGE_SQL = """
SELECT v.PropertyID, v.Year, v.Value, v.MarketTotalValue, v.ApprTotalValue,
       p.SitusLatitude, p.SitusLongitude, p.SitusFullStreetAddress,
       p.SitusCity, p.SitusState, p.SitusZIP5, p.FIPS, p.SitusCensusTract,
       p.SitusCensusBlock,
       d.SaleAmt, t.TaxAmt, t.TaxAmtAdjusted
FROM read_parquet('{ranked_valhist}') v
LEFT JOIN read_parquet('{prop}') p ON v.PropertyID = p.PropertyID
LEFT JOIN read_parquet('{ranked_deed}') d
  ON v.PropertyID = d.PropertyID AND v.Year = d.RecordingYear
LEFT JOIN read_parquet('{taxhist}') t
  ON v.PropertyID = t.PropertyID AND v.Year = t.TaxYear
WHERE d.SaleAmt IS NOT NULL
"""


def _copy(con, select_sql: str, out_path: str) -> None:
    con.execute(
        f"COPY ({select_sql}) TO '{out_path}' "
        "(FORMAT PARQUET, COMPRESSION SNAPPY)"
    )


def run_duckdb_proxy(input_dir: str) -> dict:
    """The reference pipeline's exact step structure on DuckDB.
    Returns {"rows": merged_row_total, "sale_amt_sum": checksum}."""
    raw = os.path.join(input_dir, "raw")
    staging = os.path.join(input_dir, "staging")
    unzipped = os.path.join(input_dir, "unzipped")
    unified = os.path.join(input_dir, "unified")
    for d in (staging, unzipped, unified):
        os.makedirs(d, exist_ok=True)
    counties = sorted(
        re.sub(r"^Deed(\d+)\.txt\.zip$", r"\1", os.path.basename(p))
        for p in glob.glob(os.path.join(raw, "Deed*.txt.zip"))
    )
    con = duckdb.connect()
    rows = 0
    sale_sum = 0
    for c in counties:
        # unzip (the reference decompresses driver-side per family)
        for fam in ("Deed", "Prop", "TaxHist", "ValHist"):
            with zipfile.ZipFile(os.path.join(raw, f"{fam}{c}.txt.zip")) as zf:
                zf.extractall(unzipped)
        txt = {f: os.path.join(unzipped, f"{f}{c}.txt") for f in ("Deed", "Prop", "TaxHist", "ValHist")}
        pq = {f: os.path.join(staging, f"{f}{c}.parquet") for f in ("Deed", "Prop", "TaxHist", "ValHist")}

        _copy(con, _DEED_SQL.format(src=_CSV.format(path=txt["Deed"])), pq["Deed"])
        ranked_deed = os.path.join(staging, f"ranked_Deed{c}.parquet")
        _copy(con, _RANKED_DEED_SQL.format(deed=pq["Deed"]), ranked_deed)
        _copy(con, _PROP_SQL.format(src=_CSV.format(path=txt["Prop"])), pq["Prop"])
        _copy(con, _TAXHIST_SQL.format(src=_CSV.format(path=txt["TaxHist"])), pq["TaxHist"])
        _copy(con, _VALHIST_SQL.format(src=_CSV.format(path=txt["ValHist"])), pq["ValHist"])

        # the assd/market/appr + temp1/temp2 cascade, files and all
        # (fa-etl.py:317-394)
        assd = os.path.join(staging, "assd.parquet")
        market = os.path.join(staging, "market.parquet")
        appr = os.path.join(staging, "appr.parquet")
        _copy(con, f"SELECT PropertyID, AssdTotalValue, AssdYear AS Year FROM read_parquet('{pq['ValHist']}') WHERE AssdTotalValue IS NOT NULL AND AssdYear IS NOT NULL", assd)
        _copy(con, f"SELECT PropertyID, MarketTotalValue, MarketValueYear AS Year FROM read_parquet('{pq['ValHist']}') WHERE MarketTotalValue IS NOT NULL AND MarketValueYear IS NOT NULL", market)
        _copy(con, f"SELECT PropertyID, ApprTotalValue, ApprYear AS Year FROM read_parquet('{pq['ValHist']}') WHERE ApprTotalValue IS NOT NULL AND ApprYear IS NOT NULL", appr)
        temp1 = os.path.join(staging, f"rankedtemp1_ValHist{c}.parquet")
        temp2 = os.path.join(staging, f"rankedtemp2_ValHist{c}.parquet")
        _copy(con, f"SELECT a.*, m.MarketTotalValue FROM read_parquet('{assd}') a LEFT JOIN read_parquet('{market}') m USING (PropertyID, Year)", temp1)
        n_appr = con.execute(f"SELECT count(*) FROM read_parquet('{appr}')").fetchone()[0]
        if n_appr:
            _copy(con, f"SELECT t.*, ap.ApprTotalValue FROM read_parquet('{temp1}') t LEFT JOIN read_parquet('{appr}') ap USING (PropertyID, Year)", temp2)
        else:
            _copy(con, f"SELECT t.*, CAST(NULL AS BIGINT) AS ApprTotalValue FROM read_parquet('{temp1}') t", temp2)
        ranked_valhist = os.path.join(staging, f"ranked_ValHist{c}.parquet")
        _copy(con, _RANKED_VALHIST_SQL.format(temp2=temp2), ranked_valhist)

        merged = os.path.join(unified, f"merged_{c}.parquet")
        _copy(
            con,
            _MERGE_SQL.format(
                ranked_valhist=ranked_valhist, prop=pq["Prop"],
                ranked_deed=ranked_deed, taxhist=pq["TaxHist"],
            ),
            merged,
        )
        r = con.execute(
            f"SELECT count(*), coalesce(sum(SaleAmt), 0) FROM read_parquet('{merged}')"
        ).fetchone()
        rows += int(r[0])
        sale_sum += int(r[1])
        for t in txt.values():  # fa-etl.py deletes unzipped txt per family
            os.remove(t)
    con.close()
    return {"rows": rows, "sale_amt_sum": sale_sum}


def run_reference_polars(input_dir: str) -> dict:
    """Run the reference itself (requires polars; per-county main()
    loop generalized the same way as the proxy)."""
    raise NotImplementedError(
        "polars is not installed in this container; the DuckDB proxy is "
        "the measured stand-in (see module docstring)"
    )


def run_spark_pipeline(spark, input_dir: str, **kwargs) -> dict:
    from pyspark.sql import functions as F

    from firstamerican_etl_spark.pipeline.run import run_pipeline

    merged = run_pipeline(spark, input_dir, **kwargs)
    r = merged.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("SaleAmt"), F.lit(0)).alias("s"),
    ).first()
    return {"rows": int(r["n"]), "sale_amt_sum": int(r["s"])}


def main(argv=None) -> list[dict]:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--props", type=int, nargs="+", default=[20_000, 200_000],
                   help="property counts per scale (20k ≈ the sf0.1 e2e "
                        "bench; 200k ≈ sf1.0)")
    p.add_argument("--spark_variant",
                   choices=["plain", "fips", "fazip", "bucketed"],
                   default="fips",
                   help="staging strategy for the Spark side (fips = the "
                        "bench's fa_pipeline_e2e default)")
    p.add_argument("--input_raw", default=None,
                   help="path to a pre-generated raw/ dir to reuse: each "
                        "sample HARDLINKS its zips into a fresh work dir "
                        "instead of regenerating (the generator is "
                        "deterministic, so this is the same input; at "
                        "100M+ props generation is tens of minutes). The "
                        "dir must have been generated with the SAME "
                        "--props value — row counts are derived from it")
    p.add_argument("--repeats", type=int, default=1,
                   help="complete fresh setup+run samples per SIDE; the "
                        "recorded wall is the min, applied to BOTH "
                        "engines symmetrically (the shared host serves "
                        "multi-second bursts of contention — bench.py's "
                        "min-of-2 discipline; every sample's wall is "
                        "also recorded under *_sec_samples)")
    a = p.parse_args(argv)
    if a.input_raw and len(a.props) != 1:
        p.error(
            "--input_raw holds ONE generated scale; pass exactly one "
            "--props value matching it (the dir would otherwise be "
            "reused for every scale and record walls under n_props "
            "labels the data doesn't match)"
        )

    try:
        import polars  # noqa: F401
        baseline_engine, baseline_fn = "polars (reference fa-etl.py)", run_reference_polars
    except ImportError:
        baseline_engine, baseline_fn = "duckdb-proxy", run_duckdb_proxy

    from firstamerican_etl_spark.session import get_spark
    from tools.fa_bench_data import generate

    spark_kwargs = {
        "plain": {},
        "fips": {"partition_staging_by_fips": True},
        # fazip: decompression runs on executors via the custom zip
        # DataSource (one task per zip member) instead of serially on
        # the driver — the reference (and the proxy, faithfully)
        # unzips one file at a time in Python
        "fazip": {"partition_staging_by_fips": True, "use_fazip_source": True},
        "bucketed": {"bucket_staging": 8},
    }[a.spark_variant]

    spark = get_spark(app_name="measure_baseline")
    # JVM/JIT warm-up outside any timed section (bench.py discipline)
    warm = tempfile.mkdtemp(prefix="fa_base_warm_")
    try:
        generate(warm, 2_000)
        run_spark_pipeline(spark, warm, **spark_kwargs)
    finally:
        shutil.rmtree(warm, ignore_errors=True)

    results = []
    for n_props in a.props:
        scale = {"n_props": n_props, "baseline_engine": baseline_engine,
                 "spark_variant": a.spark_variant}
        for side, fn in (("baseline", baseline_fn), ("spark", None)):
            samples, outs = [], []
            for _ in range(max(1, a.repeats)):
                work = tempfile.mkdtemp(prefix=f"fa_base_{side}_")
                try:
                    if a.input_raw:
                        from tools.fsutil import hardlink_raw

                        hardlink_raw(a.input_raw, work)
                    else:
                        generate(work, n_props)
                    t0 = time.perf_counter()
                    out = (fn(work) if fn is not None
                           else run_spark_pipeline(spark, work, **spark_kwargs))
                    samples.append(round(time.perf_counter() - t0, 3))
                    outs.append(out)
                finally:
                    shutil.rmtree(work, ignore_errors=True)
            # EVERY sample's output must agree, not just the last one —
            # otherwise the min could come from a run whose result was
            # never parity-checked. Deterministic inputs ⇒ identical
            # outputs; a divergent sample is a real bug, fail loudly.
            if any(o != outs[0] for o in outs[1:]):
                raise AssertionError(
                    f"{side} samples disagree at {n_props}: {outs}"
                )
            scale[f"{side}_rows"] = outs[0]["rows"]
            scale[f"{side}_sale_sum"] = outs[0]["sale_amt_sum"]
            scale[f"{side}_sec"] = min(samples)
            if len(samples) > 1:
                scale[f"{side}_sec_samples"] = samples
        scale["rows_match"] = scale["baseline_rows"] == scale["spark_rows"]
        scale["sale_sum_match"] = (
            scale["baseline_sale_sum"] == scale["spark_sale_sum"]
        )
        scale["spark_over_baseline"] = round(
            scale["spark_sec"] / scale["baseline_sec"], 3
        )
        print(json.dumps(scale))
        results.append(scale)
    spark.stop()

    print("\n| n_props | baseline engine | baseline sec | spark sec | "
          "spark/baseline | rows match |", file=sys.stderr)
    print("|---|---|---|---|---|---|", file=sys.stderr)
    for s in results:
        print(
            f"| {s['n_props']:,} | {s['baseline_engine']} | "
            f"{s['baseline_sec']} | {s['spark_sec']} | "
            f"{s['spark_over_baseline']}× | "
            f"{'yes' if s['rows_match'] and s['sale_sum_match'] else 'NO'} |",
            file=sys.stderr,
        )
    return results


if __name__ == "__main__":
    main()
