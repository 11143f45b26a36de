"""Capture .explain("formatted") for bench-headline queries into
plans/<round>/<query>_{before,after}.txt (optimization-round evidence;
the judge checks plan claims against these files). The round dir
defaults to r15; override with $SPARK_GRAFT_PLANS_ROUND.

Usage:
    python tools/capture_plans.py before [name1,name2,...]
    python tools/capture_plans.py after  [name1,name2,...]

Plans are captured at the bench SF dir ($SPARK_GRAFT_SF_DIR, default
/root/testdata/sf0.1). Queries that run driver-side actions during
plan construction (cutpoint collects, checkpoint materializations)
execute those as part of building the frame — the captured text is the
FINAL returned frame's plan, which is what the bench times via
_force()."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firstamerican_etl_spark.plans.registry import load_all
from firstamerican_etl_spark.session import get_spark


def main() -> None:
    phase = sys.argv[1] if len(sys.argv) > 1 else "before"
    if phase not in ("before", "after"):
        raise SystemExit("usage: capture_plans.py before|after [names]")
    names = None
    if len(sys.argv) > 2:
        names = [s for s in sys.argv[2].split(",") if s]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)
    registry = load_all()
    if names is None:
        from bench import HEADLINE

        names = list(HEADLINE)
    spark = get_spark(app_name=f"capture_plans_{phase}")
    for name in names:
        try:
            df = registry[name].spark(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # capture what we can; note the failure
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{phase}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"# wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
