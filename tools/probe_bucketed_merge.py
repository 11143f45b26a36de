"""Quiet-host 20M bucketed-staging probe (VERDICT r12 #4 + ADVICE A/B).

Two deliverables, one JSON line each:

1. ``full_pipeline`` — the bucketed-staging end-to-end wall at the
   given scale on a QUIET host (the committed r12 number, 174.3 s, was
   taken while the host canary collapsed mid-run and is explicitly an
   upper bound — SCALING.md).

2. ``merge_ab`` — merge-only A/B over the SAME bucketed catalog
   tables: Catalyst default (bucket-sorted SMJ, the shipped bucketed
   choice) vs SHUFFLE_HASH hints on just the two (PropertyID, Year)
   build sides (ranked_deed / taxhist — the joins that still insert
   Sorts under bucketed SMJ because staging sortBy's only PropertyID;
   the single-key prop join's sort is free and is left alone in both
   variants). The r12 ADVICE flagged the shipped opt-out comment as
   unproven for exactly these two joins; this measures it. min-of-N
   per variant, alternating order, identical-row-count assert,
   calib_s host canary bracketing every timed segment.

Usage:
    python tools/probe_bucketed_merge.py --input_raw /tmp/fa20m/raw \
        [--samples 2]
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
    p.add_argument("--samples", type=int, default=2)
    p.add_argument("--buckets", type=int, default=8)
    a = p.parse_args(argv)

    from pyspark.sql import functions as F

    from firstamerican_etl_spark.pipeline.run import run_pipeline
    from firstamerican_etl_spark.pipeline.unify import unify
    from firstamerican_etl_spark.session import get_spark

    spark = get_spark(app_name="probe_bucketed_merge")

    # JVM warm-up outside any timed section
    from tools.fa_bench_data import generate

    warm = tempfile.mkdtemp(prefix="fa_bkt_warm_")
    try:
        generate(warm, 2_000)
        run_pipeline(spark, warm, bucket_staging=a.buckets).count()
    finally:
        shutil.rmtree(warm, ignore_errors=True)

    work = tempfile.mkdtemp(prefix="fa_bkt_probe_")
    try:
        _hardlink_raw(a.input_raw, work)
        calib0 = _calibrate_host()
        t0 = time.perf_counter()
        merged = run_pipeline(spark, work, bucket_staging=a.buckets)
        r = merged.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("SaleAmt"), F.lit(0)).alias("s"),
        ).first()
        full_wall = round(time.perf_counter() - t0, 2)
        calib1 = _calibrate_host()
        print(json.dumps({
            "probe": "full_pipeline", "variant": "bucketed",
            "buckets": a.buckets, "wall_s": full_wall,
            "rows": int(r["n"]), "sale_amt_sum": int(r["s"]),
            "calib_before": calib0, "calib_after": calib1,
        }), flush=True)

        # ---- merge-only A/B over the bucketed catalog tables ----
        from firstamerican_etl_spark.pipeline.run import _bucket_table

        tables = {
            tag: spark.table(_bucket_table(tag, work))
            for tag in ("ranked_valhist", "prop", "ranked_deed", "taxhist")
        }

        def merge_smj():
            return unify(
                ranked_valhist=tables["ranked_valhist"], prop=tables["prop"],
                ranked_deed=tables["ranked_deed"], taxhist=tables["taxhist"],
                shuffle_hash_builds=False,
            )

        def merge_shj_2key():
            # hints on ONLY the two (PropertyID, Year) build sides —
            # the prop join keeps its free bucket-sorted SMJ
            return unify(
                ranked_valhist=tables["ranked_valhist"], prop=tables["prop"],
                ranked_deed=tables["ranked_deed"].hint("shuffle_hash"),
                taxhist=tables["taxhist"].hint("shuffle_hash"),
                shuffle_hash_builds=False,
            )

        variants = {"smj_bucketed": merge_smj, "shj_2key": merge_shj_2key}
        walls = {k: [] for k in variants}
        counts = {}
        for s in range(a.samples):
            for name in (list(variants) if s % 2 == 0
                         else list(variants)[::-1]):  # alternate order
                t0 = time.perf_counter()
                n = variants[name]().count()
                walls[name].append(round(time.perf_counter() - t0, 2))
                counts.setdefault(name, n)
                assert counts[name] == n
        assert len(set(counts.values())) == 1, counts
        calib2 = _calibrate_host()
        print(json.dumps({
            "probe": "merge_ab", "rows": counts["smj_bucketed"],
            "walls": walls,
            "min_smj_bucketed": min(walls["smj_bucketed"]),
            "min_shj_2key": min(walls["shj_2key"]),
            "calib_after_ab": calib2,
        }), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
