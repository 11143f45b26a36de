"""Multi-year horizon regression for the bucketed rolling median.

ADVICE r7: the mapInPandas synthetic time axis chunked at a FIXED 2000
groups per rolling pass, which only stays inside datetime64[ns]
(~9.2e9 s) when the task's epoch span is ≲45 days.  Any dataset
spanning a couple of months — let alone the "years-long heavy hitter"
regime the operator exists for — made ``pd.to_datetime`` raise
OutOfBoundsDatetime.  The chunk is now derived from the MEASURED span
(9.0e9 // span); this test pins the fix with a THREE-YEAR fixture and
value-checks the result against the registered DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.oracle_harness import compare


@pytest.fixture(scope="module")
def multiyear_dir(tmp_path_factory):
    """events.parquet spanning 3 years: 40 users x ~150 events each,
    deterministic, with null users/values sprinkled in (the operator
    filters null user_id and must null-propagate null cents)."""
    rng = np.random.default_rng(8_2026)
    n = 6000
    base = pd.Timestamp("2021-01-04")
    span_s = 3 * 365 * 86400
    epochs = np.sort(rng.integers(0, span_s, size=n))
    user = rng.integers(1, 41, size=n).astype("float64")
    user[rng.random(n) < 0.02] = np.nan
    value = np.round(rng.random(n) * 500.0, 2)
    value[rng.random(n) < 0.03] = np.nan
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": base + pd.to_timedelta(epochs, unit="s"),
            "user_id": pd.array(
                [None if np.isnan(u) else int(u) for u in user], dtype="Int64"
            ),
            "event_type": np.where(rng.random(n) < 0.5, "view", "click"),
            "value": value,
            "props": "{}",
        }
    )
    d = tmp_path_factory.mktemp("multiyear")
    pdf.to_parquet(d / "events.parquet", index=False)
    return str(d)


def test_bucketed_rolling_median_survives_multiyear_span(spark, multiyear_dir):
    from firstamerican_etl_spark.plans.registry import load_all

    reg = load_all()
    entry = reg["rolling_7d_median_bucketed"]
    df = entry.spark(spark, multiyear_dir)
    # Old fixed-2000 chunk: span ≈ 9.46e7 s -> 2000*span ≈ 1.9e11 s,
    # 20x past datetime64[ns]; collect would raise OutOfBoundsDatetime.
    errs = compare(
        "rolling_7d_median_bucketed@3y", df, entry.oracle, multiyear_dir
    )
    assert not errs, "\n".join(errs)
