"""Time-series repair operators: date-spine gap fill with forward
fill, linear interpolation across gaps, and IQR outlier bounds.

The reference's value-history reshape (fa-etl.py:250-426) produces a
sparse per-(PropertyID, Year) series and simply tolerates the holes;
a real analytics engine needs the standard repair toolkit: build the
dense calendar spine, carry the last observation forward, or
interpolate between the surrounding observations. All three are pure
Catalyst plans (sequence/explode + IGNORE NULLS window functions — no
UDFs), and all three carry full DuckDB value oracles.

Scale notes: the spine is |groups| × |days| rows — generated, never
shuffled wide (explode happens after the per-group min/max aggregate,
which is tiny). The fill windows partition by group and sort by day;
that is ONE exchange per query, reused by both fill directions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from firstamerican_etl_spark.functions.stable import (
    fast_sum,
    sql_fast_sum,
    sql_stable_round,
    stable_round,
)
from firstamerican_etl_spark.plans.registry import register
from firstamerican_etl_spark.sources.io import load_table


def _daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed daily revenue per order priority (sparse: days with no
    orders for a priority are absent)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(fast_sum(F.col("o_totalprice")).alias("revenue"))


def _spined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense (priority, day) spine left-joined with observed revenue.

    The spine is built from the GLOBAL [min, max] date range, carried
    onto the aggregated daily table by an unpartitioned window and
    exploded per priority — spine size is |priorities| × |days|
    regardless of fact-table scale."""
    daily = _daily_revenue(spark, sf_dir)
    # Global bounds as a ONE-ROW aggregate (partial map-side combine →
    # single final row) broadcast-crossed onto the distinct priorities.
    # All three branches (bounds, priorities, the sparse join) hang off
    # the SAME daily aggregation subtree, so Catalyst's ReuseExchange
    # computes the orders shuffle once; nothing here ever funnels the
    # daily table through a single task (the previous unpartitioned
    # min/max window did exactly that, plus a WindowExec warning).
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = (
        daily.select("priority")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "priority",
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias(
                "day"
            ),
        )
    )
    return spine.join(daily, ["priority", "day"], "left")


_SPINE_CTE = """
WITH daily AS (
  SELECT o_orderpriority AS priority,
         CAST(o_orderdate AS DATE) AS day,
         {rev} AS revenue
  FROM orders GROUP BY 1, 2
),
bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
spine AS (
  SELECT p.priority, CAST(s.day AS DATE) AS day
  FROM (SELECT DISTINCT priority FROM daily) p
  CROSS JOIN (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
    FROM bounds
  ) s
),
sparse AS (
  SELECT s.priority, s.day, d.revenue
  FROM spine s LEFT JOIN daily d
    ON s.priority = d.priority AND s.day = d.day
)
""".format(rev=sql_fast_sum("o_totalprice"))


@register(
    "gap_fill_forward",
    oracle=_SPINE_CTE
    + """
SELECT priority, day,
       last_value(revenue IGNORE NULLS) OVER (
         PARTITION BY priority ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS revenue_ff,
       CAST(revenue IS NOT NULL AS INTEGER) AS observed
FROM sparse
""",
    tags=("timeseries", "gap-fill", "window"),
)
def gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily series per priority with last-observation-carried-
    forward: sequence() date spine → left join observed days →
    last(value, ignoreNulls) over the running frame. Leading days
    before the first observation stay null (no look-behind invention).
    One window exchange on (priority); the spine side is generated
    in-place, so the only data-sized shuffle is the daily aggregate."""
    sp = _spined(spark, sf_dir)
    w = (
        Window.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return sp.select(
        "priority",
        "day",
        F.last("revenue", ignorenulls=True).over(w).alias("revenue_ff"),
        F.col("revenue").isNotNull().cast("int").alias("observed"),
    )


@register(
    "gap_fill_interpolate",
    oracle=_SPINE_CTE
    + """
, ctx AS (
  SELECT priority, day, revenue,
         last_value(revenue IGNORE NULLS) OVER (
           PARTITION BY priority ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val,
         last_value(CASE WHEN revenue IS NOT NULL THEN day END IGNORE NULLS)
           OVER (PARTITION BY priority ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_day,
         first_value(revenue IGNORE NULLS) OVER (
           PARTITION BY priority ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val,
         first_value(CASE WHEN revenue IS NOT NULL THEN day END IGNORE NULLS)
           OVER (PARTITION BY priority ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_day
  FROM sparse
)
SELECT priority, day,
       {interp} AS revenue_interp
FROM ctx
""".format(
        interp=sql_stable_round(
            "CASE WHEN revenue IS NOT NULL THEN revenue "
            "WHEN prev_val IS NULL THEN next_val "
            "WHEN next_val IS NULL THEN prev_val "
            "ELSE prev_val + (next_val - prev_val) "
            "* ((day - prev_day) / (next_day - prev_day)) END"
        )
    ),
    tags=("timeseries", "interpolate", "window"),
)
def gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across gaps: for each missing day take the
    straddling observations (carried forward + pulled backward with
    IGNORE NULLS windows) and blend by day distance. Edges degrade to
    nearest-value fill. Two window passes over the SAME (priority, day)
    sort order — Catalyst plans one exchange + one sort, both window
    operators run back-to-back on the sorted partitions."""
    sp = _spined(spark, sf_dir)
    past = (
        Window.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    future = (
        Window.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("revenue").isNotNull(), F.col("day"))
    ctx = sp.select(
        "priority",
        "day",
        "revenue",
        F.last("revenue", ignorenulls=True).over(past).alias("prev_val"),
        F.last(obs_day, ignorenulls=True).over(past).alias("prev_day"),
        F.first("revenue", ignorenulls=True).over(future).alias("next_val"),
        F.first(obs_day, ignorenulls=True).over(future).alias("next_day"),
    )
    frac = F.datediff("day", "prev_day") / F.datediff("next_day", "prev_day")
    interp = (
        F.when(F.col("revenue").isNotNull(), F.col("revenue"))
        .when(F.col("prev_val").isNull(), F.col("next_val"))
        .when(F.col("next_val").isNull(), F.col("prev_val"))
        .otherwise(
            F.col("prev_val")
            + (F.col("next_val") - F.col("prev_val")) * frac
        )
    )
    return ctx.select(
        "priority", "day", stable_round(interp).alias("revenue_interp")
    )


@register(
    "iqr_outlier_bounds",
    oracle="""
WITH q AS (
  SELECT l_returnflag,
         CAST(quantile_cont(l_extendedprice, 0.25) AS DOUBLE) AS q1,
         CAST(quantile_cont(l_extendedprice, 0.75) AS DOUBLE) AS q3
  FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag,
       {q1} AS q1, {q3} AS q3,
       count(*) FILTER (
         WHERE l.l_extendedprice < q.q1 - 1.5 * (q.q3 - q.q1)
            OR l.l_extendedprice > q.q3 + 1.5 * (q.q3 - q.q1)
       ) AS n_outliers,
       count(*) AS n_rows
FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
GROUP BY 1
""".format(
        q1=sql_stable_round("any_value(q.q1)", 4),
        q3=sql_stable_round("any_value(q.q3)", 4),
    ),
    tags=("timeseries", "outlier", "percentile"),
)
def iqr_outlier_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier profile per group: exact Q1/Q3 (linear
    interpolation, same definition as DuckDB quantile_cont), then a
    second pass counting points outside [Q1-1.5·IQR, Q3+1.5·IQR]. The
    quantile table is per-group tiny → broadcast back onto the fact
    scan; the fact table is read twice but shuffled only once (the
    final count aggregates map-side)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.25)).alias("q1"),
        F.percentile("l_extendedprice", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    joined = li.join(F.broadcast(q), "l_returnflag")
    is_out = (F.col("l_extendedprice") < F.col("q1") - 1.5 * iqr) | (
        F.col("l_extendedprice") > F.col("q3") + 1.5 * iqr
    )
    return joined.groupBy("l_returnflag").agg(
        stable_round(F.first("q1"), 4).alias("q1"),
        stable_round(F.first("q3"), 4).alias("q3"),
        F.sum(is_out.cast("long")).alias("n_outliers"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "rolling_7d_active_users",
    oracle="""
WITH ud AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
  FROM events WHERE user_id IS NOT NULL
),
days AS (SELECT DISTINCT d FROM ud)
SELECT days.d AS window_day,
       count(DISTINCT ud.user_id) AS active_users_7d
FROM days JOIN ud ON ud.d BETWEEN days.d - 6 AND days.d
GROUP BY 1
""",
    tags=("timeseries", "rolling-distinct", "scale-idiom"),
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day — the WAU/MAU
    metric. Spark windows cannot run count(DISTINCT) over a RANGE
    frame, and the naive day×activity range join is O(days·users).
    The scale idiom: dedup to (day, user) once, then EXPLODE each
    activity day into the ≤7 window-ending days it contributes to,
    and take an exact distinct count per window day — shuffle volume
    is 7× the (small) distinct activity table, independent of raw
    event volume, and every stage is a plain hash aggregate. Days
    with no events in the trailing week of the data's edge are
    semi-joined back to observed days so both engines report the
    same day set."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    ud = ev.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    days = ud.select("d").distinct()
    contrib = ud.select(
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("window_day"),
        "user_id",
    )
    return (
        contrib.join(days, contrib["window_day"] == days["d"], "left_semi")
        .groupBy("window_day")
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
    )


@register(
    "rolling_7d_median_value",
    oracle="""
WITH e AS (
  SELECT event_id, user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE user_id IS NOT NULL
)
SELECT event_id, user_id,
       median(cents) OVER (
         PARTITION BY user_id ORDER BY epoch_s
         RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
       ) AS med_7d_cents
FROM e
""",
    tags=("timeseries", "rolling", "median", "window", "contrast"),
)
def rolling_7d_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 7-day EXACT median of event value — an
    aggregate Spark has no native window form for (median/percentile
    are not supported as window functions), composed from built-ins:
    collect_list over a RANGE frame, sort_array, interpolated middle
    pick. The robust rolling baseline that a mean would let one spike
    drag; the anomaly-detection denominator.

    Exactness: values quantize to integer cents first; the frame is an
    epoch-seconds RANGE (peers included identically in both engines);
    the odd-n median is an exact integer and the even-n median is one
    (a+b)/2 IEEE division of exact integers — DuckDB's quantile_cont
    window does precisely the same interpolation.

    Scale shape: ONE exchange (hash by user_id) + per-user sort —
    the same single-window shape as gap-fill; the frame buffer is
    bounded by one user's 7-day event volume, not the partition. For
    heavy-hitter users at 100 TB, the escape hatch is bucketing time
    into the key (user, week) with a two-frame merge; kept single-key
    here because per-user weekly volume is human-scale."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    e = ev.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-604800, 0)
    )
    vals = F.sort_array(F.collect_list("cents").over(w))
    n = F.size(vals)
    lo = F.element_at(vals, ((n + 1) / 2).cast("int"))
    hi = F.element_at(vals, (n / 2 + 1).cast("int"))
    # n>0 guard: a frame holding only null values would collect an
    # empty list and index 0 — an error under the driver's ANSI mode.
    # (Can't happen with non-null cents, but null-tolerant like the
    # oracle's median-of-empty → NULL.)
    med = F.when(n > 0, (lo + hi).cast("double") / F.lit(2.0))
    return e.select("event_id", "user_id", med.alias("med_7d_cents"))


_WEEK_S = 604_800


@register(
    "rolling_7d_median_bucketed",
    oracle="""
WITH e AS (
  SELECT event_id, user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE user_id IS NOT NULL
)
SELECT event_id, user_id,
       median(cents) OVER (
         PARTITION BY user_id ORDER BY epoch_s
         RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
       ) AS med_7d_cents
FROM e
""",
    tags=("timeseries", "rolling", "median", "bucketed", "pandas", "scale"),
)
def rolling_7d_median_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE-SAFE twin of ``rolling_7d_median_value`` — identical
    output (same oracle), different physical plan for the regime where
    per-user activity is heavy.

    Why the twin exists: the window formulation buffers ONE USER'S
    ENTIRE HISTORY per task (window partition = user) and builds +
    sorts a fresh array PER ROW (collect_list/sort_array over the
    RANGE frame — Σ w·log w work, measured 2.4× wall per 10× density
    in SCALING.md). Here instead:

    - PARTITION = (user, 7-day epoch bucket). A trailing 7-day window
      at any row spans at most the row's bucket and the one before, so
      each event is shipped twice — once to its own bucket as a TARGET
      row, once to the next as a CARRY row — and every group holds ≤ 2
      weeks of one user's events regardless of total history. Task
      memory is bounded by per-fortnight volume, not per-user volume;
      a years-long heavy hitter shards across buckets. Still ONE hash
      exchange (of 2n narrow rows).
    - MEDIANS via pandas ``rolling('604800s', closed='both').median()``
      — a C-implemented skiplist, O(log w) insert/evict per event
      instead of a per-row array sort: total O(n log w) vs Σ w log w.
      Arrow-batched Python interop, the sanctioned path for stateful
      sliding-window logic Catalyst has no operator for.
    - ONE ROLLING PASS PER TASK, not per group: applyInPandas pays a
      pandas-frame + rolling-engine setup per (user, bucket) — at
      bench scale that was ~7.5k tiny groups and the setup dominated
      14× over the window formulation. Instead the rows are
      repartitioned on (user, bucket) and sorted (user, bucket, epoch)
      within partitions, and mapInPandas runs a single skiplist pass
      over each task's whole row range on a SYNTHETIC time axis:
      group ordinal × (epoch span + window + 1) + epoch. Consecutive
      groups land further apart than the window ever reaches, so one
      rolling call computes every group's windows without ever mixing
      them; the groups-per-pass chunk is derived from the measured
      epoch span (9.0e9 // span) so ordinal·span stays inside the
      datetime64[ns] range for ANY data horizon, days or decades.

    Exactness vs the oracle: integer cents are exact in float64;
    pandas' even-n interpolation is the same (a+b)/2; the time window
    [t−604800, t] is closed on BOTH ends (closed='both') matching
    RANGE 604800 PRECEDING..CURRENT ROW; and DuckDB's frame includes
    ALL PEERS of the current epoch (even rows that sort after the
    current one), while pandas is positional — so each epoch's rows
    all take the median computed at that epoch's LAST positional row,
    which is the one whose window holds every peer. NaN cents (null
    value) are skipped by both engines; an all-null window yields
    NULL."""
    import pandas as pd

    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    e = ev.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long").alias("cents"),
    )
    k = F.floor(F.col("epoch_s") / F.lit(_WEEK_S))
    own = e.select(
        "event_id", "user_id", "epoch_s", "cents",
        k.alias("k"), F.lit(True).alias("is_target"),
    )
    carry = e.select(
        "event_id", "user_id", "epoch_s", "cents",
        (k + 1).alias("k"), F.lit(False).alias("is_target"),
    )
    both = own.unionByName(carry)

    out_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("med_7d_cents", T.DoubleType()),
        ]
    )

    import numpy as np

    def fn(batches):
        # one buffered frame per task: the same rows a sort partition
        # holds anyway (Arrow splits partitions into batches; a group
        # straddling two batches would tear its windows)
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        if not len(pdf):
            return
        g = pdf.groupby(["user_id", "k"], sort=False).ngroup().values
        epoch = pdf["epoch_s"].values.astype("int64")
        base = int(epoch.min())
        span = int(epoch.max()) - base + _WEEK_S + 1
        vals = pd.to_numeric(pdf["cents"]).astype("float64").values
        med = np.empty(len(pdf), dtype="float64")
        # groups-per-rolling-pass derived from the MEASURED span so
        # ordinal·span stays inside datetime64[ns] (~9.2e9 s) for any
        # data horizon — a fixed constant only held for ≲45-day data;
        # chunk boundaries align to groups
        chunk = max(1, int(9.0e9 // span))
        n_groups = int(g[-1]) + 1 if len(g) else 0
        for g0 in range(0, n_groups, chunk):
            lo = np.searchsorted(g, g0, side="left")
            hi = np.searchsorted(g, min(g0 + chunk, n_groups) - 1, side="right")
            synth = (g[lo:hi] - g0).astype("int64") * span + (epoch[lo:hi] - base)
            s = pd.Series(
                vals[lo:hi], index=pd.to_datetime(synth, unit="s")
            )
            med[lo:hi] = (
                s.rolling(f"{_WEEK_S}s", closed="both", min_periods=1)
                .median()
                .values
            )
        pdf = pdf.assign(_med=med)
        # RANGE-frame peer semantics: every row of an epoch gets the
        # median computed at that epoch's last positional row (whose
        # window is the only one containing all peers)
        pdf["_med"] = pdf.groupby(["user_id", "k", "epoch_s"], sort=False)[
            "_med"
        ].transform("last")
        out = pdf[pdf["is_target"]]
        yield pd.DataFrame(
            {
                "event_id": out["event_id"].values,
                "user_id": out["user_id"].values,
                "med_7d_cents": out["_med"].values,
            }
        )

    part = both.repartition("user_id", "k").sortWithinPartitions(
        "user_id", "k", "epoch_s"
    )
    return part.mapInPandas(fn, schema=out_schema)


@register(
    "ewma_truncated_k8",
    oracle="""
WITH e AS (
  SELECT event_id, user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE user_id IS NOT NULL
),
lags AS (
  SELECT event_id, user_id, cents,
         """ + ",\n         ".join(
        f"lag(cents, {k}) OVER (PARTITION BY user_id "
        f"ORDER BY epoch_s, event_id) AS l{k}"
        for k in range(1, 8)
    ) + """
  FROM e
)
SELECT event_id, user_id,
       CAST(cents * 128 """ + " ".join(
        f"+ coalesce(l{k} * {128 >> k}, 0)" for k in range(1, 8)
    ) + """ AS DOUBLE)
       / (128 """ + " ".join(
        f"+ CASE WHEN l{k} IS NULL THEN 0 ELSE {128 >> k} END"
        for k in range(1, 8)
    ) + """) AS ewma_cents
FROM lags
""",
    tags=("timeseries", "ewma", "window", "smoothing"),
)
def ewma_truncated_k8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (λ = 1/2) per user,
    TRUNCATED at 8 lags — the trend-smoothing companion to the rolling
    median. The untruncated EWMA recursion ewma_t = λ·v_t +
    (1−λ)·ewma_{t−1} is a data-length-dependent recurrence no engine's
    window frame expresses; truncation at K=8 makes it a FIXED linear
    combination (weights 2⁻ᵏ, residual mass 2⁻⁸ ≈ 0.4%) — and because
    λ = 1/2 gives power-of-two weights, the numerator Σ v_{t−k}·2^(7−k)
    is an EXACT int64 sum: the only float op is one final IEEE division
    of exact integers, bit-identical in DuckDB under any partitioning.
    Warm-up rows (fewer than 8 predecessors) renormalize over the
    weights actually present, matching the recursive EWMA's behavior
    of averaging only observed history.

    Scale shape: ONE hash exchange (user) + per-user sort shared by
    all 8 lag expressions — Spark plans a single Window node; per-row
    state is 8 values, constant regardless of user history (contrast
    the RANGE-frame median's per-row frame buffer). Deterministic
    order: (epoch_s, event_id) — equal timestamps are tie-broken, so
    the lag sequence is unique on both engines."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    e = ev.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("epoch_s", "event_id")
    num = F.col("cents") * F.lit(128)
    den = F.lit(128)
    for k in range(1, 8):
        lk = F.lag("cents", k).over(w)
        num = num + F.coalesce(lk * F.lit(128 >> k), F.lit(0))
        den = den + F.when(lk.isNull(), F.lit(0)).otherwise(F.lit(128 >> k))
    return e.select(
        "event_id",
        "user_id",
        (num.cast("double") / den).alias("ewma_cents"),
    )


@register(
    "mad_outlier_zscores",
    oracle="""
WITH e AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
med AS (
  SELECT event_type, median(cents) AS med_cents FROM e GROUP BY 1
),
dev AS (
  SELECT e.event_id, e.event_type, e.cents, m.med_cents,
         abs(e.cents - m.med_cents) AS adev
  FROM e JOIN med m ON e.event_type = m.event_type
),
mad AS (
  SELECT event_type, median(adev) AS mad_cents FROM dev GROUP BY 1
)
SELECT d.event_id, d.event_type, d.cents,
       floor(d.med_cents * 100 + 0.5) / 100 AS med_cents,
       floor(m.mad_cents * 100 + 0.5) / 100 AS mad_cents,
       floor(0.6745 * (d.cents - d.med_cents) / m.mad_cents * 10000 + 0.5)
         / 10000 AS robust_z
FROM dev d JOIN mad m ON d.event_type = m.event_type
WHERE m.mad_cents > 0
  AND abs(0.6745 * (d.cents - d.med_cents) / m.mad_cents) > 3.5
""",
    tags=("stats", "robust", "outlier", "mad"),
)
def mad_outlier_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection via Median Absolute
    Deviation: modified z-score 0.6745·(x−median)/MAD, flagging
    |z| > 3.5 (Iglewicz & Hoaglin 1993). Unlike the IQR bounds (which
    report group thresholds), this emits the OUTLIER ROWS with their
    scores — and unlike mean/stddev z-scores, a single extreme value
    cannot drag the baseline it's judged against (50% breakdown
    point vs 0%).

    Exactness: cents are exact integers; each median is Spark's exact
    interpolated percentile — identical (a+b)/2 arithmetic to DuckDB's
    quantile_cont on the same integers; the z formula is a fixed IEEE
    dag on exact inputs, floor-quantized at 1e-4 on both sides. Groups
    with MAD = 0 (over half the group at the median) are excluded
    rather than divided by zero.

    Scale shape: two group-median aggregates (|types| rows each) with
    the deviations computed via a BROADCAST join of the tiny median
    frame back onto the facts — the fact table is scanned twice but
    never shuffled (exact two-pass median is the price of robustness;
    the approx_percentile sketch path is the one-pass alternative when
    ±1% suffices)."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long").alias("cents"),
    )
    med = e.groupBy("event_type").agg(F.median("cents").alias("med_cents"))
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "cents",
        "med_cents",
        F.abs(F.col("cents") - F.col("med_cents")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad_cents"))
    z = F.lit(0.6745) * (F.col("cents") - F.col("med_cents")) / F.col("mad_cents")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad_cents") > 0) & (F.abs(z) > 3.5))
        .select(
            "event_id",
            "event_type",
            "cents",
            stable_round(F.col("med_cents"), 2).alias("med_cents"),
            stable_round(F.col("mad_cents"), 2).alias("mad_cents"),
            stable_round(z, 4).alias("robust_z"),
        )
    )


@register(
    "timeseries_gapfill_ffill",
    oracle="""
WITH e AS (
  SELECT event_type, user_id % 50 AS series,
         CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 86400.0) AS BIGINT) AS d,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE user_id IS NOT NULL
),
daily AS (
  SELECT event_type, series, d, count(*) AS n_events,
         CAST(sum(cents) AS BIGINT) AS day_cents
  FROM e GROUP BY 1, 2, 3
),
span AS (
  SELECT event_type, series, min(d) AS d0, max(d) AS d1
  FROM daily GROUP BY 1, 2
),
cal AS (
  SELECT event_type, series, unnest(generate_series(d0, d1)) AS d FROM span
),
j AS (
  SELECT cal.event_type, cal.series, cal.d,
         coalesce(daily.n_events, 0) AS n_events,
         daily.day_cents
  FROM cal LEFT JOIN daily USING (event_type, series, d)
)
SELECT event_type, series, d AS day_n, n_events,
       CASE WHEN day_cents IS NULL THEN 1 ELSE 0 END AS is_gap,
       coalesce(last_value(day_cents IGNORE NULLS)
                  OVER (PARTITION BY event_type, series ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                0) AS cents_filled
FROM j
""",
    tags=("timeseries", "gapfill", "calendar"),
)
def timeseries_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify per-(type, user-bucket) daily series onto a gap-free
    calendar and
    forward-fill across the gaps — the prerequisite for every rolling
    statistic downstream (a 7-day window over a SPARSE series silently
    shortens its frame on quiet days; gap-filled, the frame always
    holds 7 rows). Days are integer epoch-days, the calendar is a
    per-series sequence(min_day, max_day) explode — |series| × span
    rows, metadata-sized next to the fact table (for genuinely
    high-cardinality keys, bound the explode by bucketing the key —
    here users fold into 50 buckets per type — or clamp the span) —
    left-joined onto the daily
    aggregate, and the fill is last-non-null over a per-type ordered
    frame (one hash exchange; Spark's last(ignorenulls) and the
    oracle's last_value IGNORE NULLS are the same frame semantics).

    Scale: the expensive input collapses FIRST (daily aggregate =
    map-side combine to |types|·|days| rows); everything after runs on
    the collapsed series, so the gap-fill itself costs the same at
    100 TB as at 100 MB."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    e = ev.select(
        "event_type",
        (F.col("user_id") % 50).alias("series"),
        F.floor(F.unix_timestamp("ts").cast("long") / F.lit(86400.0))
        .cast("long")
        .alias("d"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long").alias("cents"),
    )
    daily = e.groupBy("event_type", "series", "d").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("cents").alias("day_cents")
    )
    cal = (
        daily.groupBy("event_type", "series")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "event_type",
            "series",
            F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("d"),
        )
    )
    j = cal.join(daily, ["event_type", "series", "d"], "left")
    w = (
        Window.partitionBy("event_type", "series")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        "series",
        F.col("d").alias("day_n"),
        F.coalesce("n_events", F.lit(0).cast("long")).alias("n_events"),
        F.when(F.col("day_cents").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_gap"),
        F.coalesce(
            F.last("day_cents", ignorenulls=True).over(w), F.lit(0).cast("long")
        ).alias("cents_filled"),
    )


@register(
    "weekday_seasonality_profile",
    oracle="""
WITH e AS (
  SELECT event_type,
         CAST((CAST(floor(CAST(floor(epoch(ts)) AS BIGINT) / 86400.0) AS BIGINT)
               + 4) % 7 AS INT) AS dow,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
per AS (
  SELECT event_type, dow, count(*) AS n,
         CAST(sum(cents) AS BIGINT) AS s
  FROM e GROUP BY 1, 2
),
tot AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS nt,
         CAST(sum(s) AS BIGINT) AS st
  FROM per GROUP BY 1
)
SELECT per.event_type, per.dow, per.n,
       floor((CAST(per.s AS DOUBLE) / per.n) * 100 + 0.5) / 100
         AS mean_cents,
       floor(((CAST(per.s AS DOUBLE) / per.n)
              / (CAST(tot.st AS DOUBLE) / tot.nt)) * 10000 + 0.5) / 10000
         AS seasonality_ratio
FROM per JOIN tot USING (event_type)
""",
    tags=("timeseries", "seasonality", "calendar"),
)
def weekday_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality per event type: each (type, weekday)
    cell's mean value and its ratio to the type's overall mean — the
    profile a forecast deseasonalizes with and an anomaly monitor
    normalizes against. Day-of-week comes from pure integer epoch
    arithmetic ((epoch_day + 4) mod 7, Sunday = 0) rather than either
    engine's dayofweek() — Spark numbers Sunday = 1, DuckDB Sunday =
    0, and timezone-dependent calendar functions are exactly the kind
    of silent cross-engine divergence the oracle exists to catch.

    Shape: one map-side-combined aggregate to the |types|×7 frame;
    the per-type totals derive from THAT frame (7 rows per type), not
    a second scan. Exact integer sums; two final IEEE divisions shared
    verbatim with the oracle."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        (
            (
                F.floor(F.unix_timestamp("ts").cast("long") / F.lit(86400.0)).cast(
                    "long"
                )
                + 4
            )
            % 7
        )
        .cast("int")
        .alias("dow"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long").alias("cents"),
    )
    per = e.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    tot = per.groupBy("event_type").agg(
        F.sum("n").alias("nt"), F.sum("s").alias("st")
    )
    mean_cell = F.col("s").cast("double") / F.col("n")
    mean_type = F.col("st").cast("double") / F.col("nt")
    return per.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "dow",
        "n",
        stable_round(mean_cell, 2).alias("mean_cents"),
        stable_round(mean_cell / mean_type, 4).alias("seasonality_ratio"),
    )
