"""Peak-TASK-memory evidence for the bucketed rolling median (VERDICT
r8 #6).

The 100x probe (SCALING.md) measures WALL clock, which shows the
window formulation's Sigma w*log(w) work but not its MEMORY story: the
claim behind ``rolling_7d_median_bucketed`` is bounded task state (at
most one user-fortnight of rows per group, sharded across tasks), while
``rolling_7d_median_value`` materializes ONE USER'S ENTIRE HISTORY in a
single task's WindowExec buffer — the thing that OOMs a years-long
heavy hitter at 100 TB no matter how many executors are free.

This probe measures it directly: a single heavy-hitter user with a
fixed event density (48/day, so the 7-day frame itself is constant
size) and a GROWING horizon (4 -> 16 -> 63 years; the point is the
heavy-hitter asymptote, not calendar realism). For each formulation
it runs the registered query on the fixture and reads the max per-task
``peakExecutionMemory`` over the job's stages from Spark's status REST
API (the same TaskMetrics a SparkListener would see; the REST
taskSummary endpoint exposes the per-task distribution, quantile 1.0 =
max task). Expected shape, confirmed by the committed run in
SCALING.md:

- window twin: max task peak grows ~linearly with horizon — the
  user's whole partition is buffered in one task
  (ExternalAppendOnlyUnsafeRowArray converts to a tracked spillable
  sorter past 4096 rows, so the growth is visible to TaskMetrics).
- bucketed twin: max task peak stays flat — (user, week-bucket)
  groups spread over all shuffle partitions, each task holding an
  O(weeks/32) slice whose groups are each <= 2 weeks of rows; the
  pandas skiplist state per group is a fortnight regardless of
  horizon.

Run: python tools/probe_peak_memory.py            (~1-2 min)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

PER_DAY = 48
HORIZON_DAYS = (1440, 5760, 23040)
QUERIES = ("rolling_7d_median_value", "rolling_7d_median_bucketed")


def _fixture(root: str, days: int) -> str:
    """events.parquet: ONE heavy user, PER_DAY events/day for
    ``days`` days, deterministic values. Fixed density means the
    7-day frame holds a constant ~336 events at every horizon — only
    the HISTORY grows, which is exactly the axis the memory claim is
    about."""
    n = days * PER_DAY
    step = 86400 // PER_DAY
    epochs = np.arange(n, dtype="int64") * step
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.Timestamp("2020-01-06") + pd.to_timedelta(epochs, unit="s"),
            "user_id": pd.array([7] * n, dtype="Int64"),
            "event_type": "view",
            "value": np.round((np.arange(n) * 7919 % 50000) / 100.0, 2),
            "props": "{}",
        }
    )
    d = os.path.join(root, f"days{days}")
    os.makedirs(d, exist_ok=True)
    pdf.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return d


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def _max_task_peak(spark, group: str) -> int:
    """Max per-task peakExecutionMemory (bytes) across every stage of
    every job tagged with ``group``."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    jobs = _rest(f"{ui}/api/v1/applications/{app}/jobs")
    stage_ids = sorted(
        {
            sid
            for j in jobs
            if j.get("jobGroup") == group
            for sid in j.get("stageIds", ())
        }
    )
    peak = 0
    for sid in stage_ids:
        # enumerate attempts (a retried stage keeps its metrics on the
        # non-zero attempt) rather than assuming attempt 0
        try:
            attempts = _rest(f"{ui}/api/v1/applications/{app}/stages/{sid}")
        except Exception as exc:
            # a SKIPPED stage (result reused) legitimately has no
            # data; anything else must be visible, not a silent 0
            print(f"# WARN stage {sid}: {exc}", file=sys.stderr)
            continue
        for att in attempts:
            aid = att.get("attemptId", 0)
            if att.get("status") == "SKIPPED":
                continue
            try:
                summ = _rest(
                    f"{ui}/api/v1/applications/{app}/stages/{sid}/{aid}/"
                    "taskSummary?quantiles=1.0"
                )
            except Exception as exc:
                print(
                    f"# WARN stage {sid} attempt {aid}: {exc}",
                    file=sys.stderr,
                )
                continue
            vals = summ.get("peakExecutionMemory") or [0]
            peak = max(peak, int(max(vals)))
    return peak


def main() -> None:
    from firstamerican_etl_spark.plans.registry import load_all
    from firstamerican_etl_spark.session import get_spark

    spark = get_spark(
        app_name="peak_memory_probe",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "0"},
    )
    reg = load_all()
    root = tempfile.mkdtemp(prefix="peakmem_")
    rows: list[dict] = []
    for days in HORIZON_DAYS:
        sf = _fixture(root, days)
        for q in QUERIES:
            tag = f"{q}@{days}"
            spark.sparkContext.setJobGroup(tag, tag)
            df = reg[q].spark(spark, sf)
            # noop sink: full computation of every column, nothing
            # collected (a count() would let the optimizer prune the
            # window/median expressions away)
            df.write.format("noop").mode("overwrite").save()
            spark.sparkContext.setJobGroup("", "")
            peak = _max_task_peak(spark, tag)
            rows.append({"query": q, "days": days, "max_task_peak_mb": round(peak / 2**20, 1)})
            print(json.dumps(rows[-1]))
    print("\n| horizon | " + " | ".join(QUERIES) + " |")
    print("|---|---|---|")
    for days in HORIZON_DAYS:
        cells = [
            next(
                f"{r['max_task_peak_mb']} MiB"
                for r in rows
                if r["query"] == q and r["days"] == days
            )
            for q in QUERIES
        ]
        print(f"| {days} d | " + " | ".join(cells) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
