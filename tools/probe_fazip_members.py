"""fazip member-count crossover probe (VERDICT r12 #5).

SCALING.md's r12 claim — the executor-side zip DataSource wins once
member count fills the executors — was asserted from an 8-member
measurement. This probe measures it: run the SAME bytes re-sharded
into many per-county zips (tools/shard_zip_inputs.py) through BOTH
Spark ingest paths:

- ``fips``  — driver-side thread-pool extraction, then a splittable
  multi-file text scan (the ≤8-member winner);
- ``fazip`` — the executor-side zip DataSource, one Python task per
  member.

The DuckDB proxy deliberately sits this one out: its per-county loop
ranks each file group locally, and a shard boundary can split one
property's consecutive rows across two "counties", double-counting
rank-1 rows. Spark reads all files into one frame before ranking, so
sharding is invisible to it — parity is instead asserted against the
known result of the same generated inputs (pass --expect_rows /
--expect_sale_sum from an unsharded measure_baseline run).

Usage:
    python tools/probe_fazip_members.py --input_raw /tmp/fa20m_sh/raw \
        --expect_rows 6447907 --expect_sale_sum 1772941447504 [--samples 2]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _calibrate_host  # noqa: E402
from tools.fsutil import hardlink_raw as _hardlink_raw  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--input_raw", required=True)
    p.add_argument("--expect_rows", type=int, required=True)
    p.add_argument("--expect_sale_sum", type=int, required=True)
    p.add_argument("--samples", type=int, default=2)
    a = p.parse_args(argv)

    from pyspark.sql import functions as F

    from firstamerican_etl_spark.pipeline.run import run_pipeline
    from firstamerican_etl_spark.session import get_spark
    from tools.fa_bench_data import generate

    n_members = len([f for f in os.listdir(a.input_raw) if f.endswith(".zip")])
    variants = {
        "fips": {"partition_staging_by_fips": True},
        "fazip": {"partition_staging_by_fips": True, "use_fazip_source": True},
    }
    spark = get_spark(app_name="probe_fazip_members")

    warm = tempfile.mkdtemp(prefix="fa_fz_warm_")
    try:  # warm both paths' JVM/Python-worker machinery untimed
        generate(warm, 2_000)
        for kw in variants.values():
            run_pipeline(spark, warm, **kw).count()
            shutil.rmtree(os.path.join(warm, "staging"), ignore_errors=True)
            shutil.rmtree(os.path.join(warm, "unified"), ignore_errors=True)
    finally:
        shutil.rmtree(warm, ignore_errors=True)

    walls = {k: [] for k in variants}
    for s in range(a.samples):
        order = list(variants) if s % 2 == 0 else list(variants)[::-1]
        for name in order:
            work = tempfile.mkdtemp(prefix=f"fa_fz_{name}_")
            try:
                _hardlink_raw(a.input_raw, work)
                calib0 = _calibrate_host()
                t0 = time.perf_counter()
                merged = run_pipeline(spark, work, **variants[name])
                r = merged.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.coalesce(F.sum("SaleAmt"), F.lit(0)).alias("s"),
                ).first()
                wall = round(time.perf_counter() - t0, 2)
                assert int(r["n"]) == a.expect_rows, (name, r["n"])
                assert int(r["s"]) == a.expect_sale_sum, (name, r["s"])
                walls[name].append(wall)
                print(json.dumps({
                    "probe": "fazip_members", "variant": name,
                    "n_members": n_members, "sample": s, "wall_s": wall,
                    "calib_before": calib0, "calib_after": _calibrate_host(),
                }), flush=True)
            finally:
                shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({
        "probe": "fazip_members_summary", "n_members": n_members,
        "min_fips": min(walls["fips"]), "min_fazip": min(walls["fazip"]),
        "parity": "rows+checksum exact, both variants, every sample",
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
