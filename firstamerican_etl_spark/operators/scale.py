"""Scale-path operators: bucketing for co-located (shuffle-free) joins
and salting for skew the optimizer can't fix.

These are the 100 TB levers (SURVEY.md §7.2 step 8):

- **Bucketing** pre-shuffles a table ONCE at write time. Two tables
  bucketed on the same key with the same bucket count join with zero
  Exchange — the national (PropertyID-keyed) join cascade runs against
  staged tables bucketed by PropertyID, so the 100 TB shuffle happens
  once at staging, not once per downstream query.
- **Salting** splits a hot key across ``salt_n`` sub-keys. AQE's skew
  join handles skewed *joins* at runtime, but it cannot fix a skewed
  ``groupBy`` (one reducer owns the hot key) or streaming stages
  (no AQE). Two-phase salted aggregation and replicate-side salted
  joins are the hand levers for those.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_SALT = "__salt"


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    path: str | None = None,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-ordered) table.

    Bucket metadata lives in the session catalog (``saveAsTable`` —
    plain ``.parquet(path)`` cannot record bucketing). Reading the
    table back exposes ``outputPartitioning = HashPartitioning(keys,
    num_buckets)``, which joins/aggs on the same keys consume without
    an Exchange. ``sort_by`` additionally pre-sorts each bucket file so
    sort-merge joins skip their Sort too."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def join_is_colocated(joined: DataFrame) -> bool:
    """True if the join plan contains no *shuffle* exchange — the
    assertion that bucketing actually took effect. A BroadcastExchange
    is fine (it moves the small side, not the bucketed fact data).
    Inspect, don't hope: a mismatched bucket count or key order
    silently reintroduces the shuffle."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return not any(
        marker in plan
        for marker in (
            "Exchange hashpartitioning",
            "Exchange rangepartitioning",
            "ShuffleQueryStage",
        )
    )


def salted_groupby_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_n: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups on (keys + salt) — the hot key's rows spread over
    ``salt_n`` reducers; phase 2 merges the partials on the true keys
    (at most ``salt_n`` rows per key, trivially cheap).

    ``aggs`` maps output column → (phase1_fn, merge_fn), e.g.
    ``{"n": ("count", "sum"), "total": ("sum", "sum"),
    "mx": ("max", "max")}``. Decomposable aggregates only (count→sum,
    sum→sum, min→min, max→max); avg must be expressed as sum+count.

    Note Spark's built-in hash aggregation already does map-side
    partials, which absorbs *moderate* skew; explicit salting is for
    the pathological key that overwhelms a single final-stage reducer.
    """
    salted = df.withColumn(_SALT, (F.rand(seed=7) * salt_n).cast("int"))
    phase1 = salted.groupBy(*keys, _SALT).agg(
        *[
            getattr(F, fn)(F.col(col) if fn != "count" else F.lit(1)).alias(out)
            for out, (fn, _, col) in _normalize_aggs(aggs).items()
        ]
    )
    merged = phase1.groupBy(*keys).agg(
        *[
            getattr(F, merge)(out).alias(out)
            for out, (_, merge, _) in _normalize_aggs(aggs).items()
        ]
    )
    return merged


def _normalize_aggs(
    aggs: dict[str, tuple[str, str] | tuple[str, str, str]],
) -> dict[str, tuple[str, str, str]]:
    """Allow {"out": (fn, merge)} shorthand where the source column is
    the output name, or explicit {"out": (fn, merge, col)}."""
    out: dict[str, tuple[str, str, str]] = {}
    for name, spec in aggs.items():
        if len(spec) == 2:
            out[name] = (spec[0], spec[1], name)
        else:
            out[name] = spec  # type: ignore[assignment]
    return out


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed probe side, replicate
    the build side ``salt_n``× (one copy per salt), join on
    (key, salt). Each hot-key partition now holds 1/salt_n of the hot
    rows. Replication multiplies the build side — use only when the
    build side is small-ish but above the broadcast threshold (below
    it, ``F.broadcast`` is strictly better; for joins AQE's
    OptimizeSkewedJoin usually fires first — this is the explicit
    fallback for when it can't, e.g. under a required distribution).
    """
    salted_l = skewed.withColumn(_SALT, (F.rand(seed=7) * salt_n).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1))).alias(_SALT)
    replicated_r = small.select("*", salts)
    out = salted_l.join(replicated_r, on=[on, _SALT], how=how)
    return out.drop(_SALT)


def repartition_for_cascade(
    df: DataFrame, keys: Sequence[str], n: int | None = None
) -> DataFrame:
    """Pre-shuffle once on the cascade key so every downstream
    join/window/agg on the same keys reuses the exchange (the
    in-memory analogue of bucketing — what the unified merge does with
    PropertyID before J3-J5/W1)."""
    cols: list[Column] = [F.col(k) for k in keys]
    return df.repartition(n, *cols) if n else df.repartition(*cols)


def global_row_index(
    df: DataFrame,
    order_key: str | Sequence[str],
    index_name: str = "row_idx",
    partitions: int = 0,
) -> DataFrame:
    """Global 0-based row index in ``order_key`` order WITHOUT the
    single-partition sort that ``row_number() OVER (ORDER BY ...)``
    plans (every row through one task — the classic 100 TB faceplant).

    The distributed zipWithIndex recipe, DataFrame-native:
    1. range-partition + sort by the key (range exchange: sampled
       bounds, disjoint sorted partitions);
    2. project spark_partition_id() — a pure map, no shuffle;
    3. count rows per partition (aggregate ships |partitions| rows),
       prefix-sum the counts driver-side into per-partition offsets;
    4. mapInPandas with a per-partition running counter + broadcast
       offset map: each row gets offset[pid] + local ordinal.

    Total cost: ONE range exchange of the data + a metadata aggregate —
    vs the naive window's full collapse to one task. Requires a unique
    ``order_key`` (single column or composite) for a deterministic
    result (ties across a partition boundary would otherwise be
    order-ambiguous).

    The partitioned frame is persist()ed between the two passes:
    repartitionByRange picks its bounds by SAMPLING, so an un-pinned
    plan could re-sample different boundaries in the count job vs the
    index job and mis-align every offset. At warehouse scale the same
    pinning falls out naturally by writing the sorted layout first
    (write_range_clustered) and indexing the static files; callers
    should unpersist() after materializing.
    """
    import pandas as pd

    keys = [order_key] if isinstance(order_key, str) else list(order_key)
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(n, *[F.col(k) for k in keys])
        .sortWithinPartitions(*keys)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    sizes = {
        r["_pid"]: r["n"]
        for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    out_schema = parts.drop("_pid").schema.add(index_name, "long")
    cols = [f.name for f in out_schema.fields]

    def index_batches(batches):
        local = 0
        for pdf in batches:
            base = offsets[int(pdf["_pid"].iloc[0])] if len(pdf) else 0
            pdf = pdf.drop(columns=["_pid"])
            pdf[index_name] = pd.RangeIndex(base + local, base + local + len(pdf))
            local += len(pdf)
            yield pdf[cols]

    return parts.mapInPandas(index_batches, schema=out_schema)


def global_running_sum(
    df: DataFrame,
    order_key: str | Sequence[str],
    value_col: str,
    out_col: str = "running_sum",
    partitions: int = 0,
) -> DataFrame:
    """Global INCLUSIVE running sum of ``value_col`` in ``order_key``
    order without the single-partition collapse of
    ``sum(v) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)``.

    Same distributed-prefix-sum recipe as ``global_row_index``:
    1. range-partition + sort by the key (disjoint sorted shards);
    2. aggregate each shard's value TOTAL (ships |partitions| rows),
       prefix-sum the totals driver-side into per-shard base offsets;
    3. mapInPandas cumsum per shard + broadcast base-offset map:
       each row gets offset[pid] + local running total.

    ONE range exchange of the data + a metadata aggregate. Requires a
    unique order key for determinism; values are summed as int64
    (callers with doubles should quantize first — running doubles are
    order-sensitive anyway). The partitioned frame is persist()ed so
    the totals pass and the cumsum pass see identical (sampled) range
    bounds — same caveat as ``global_row_index``."""
    import pandas as pd  # noqa: F401 (Arrow batches arrive as pandas)

    keys = [order_key] if isinstance(order_key, str) else list(order_key)
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(n, *[F.col(k) for k in keys])
        .sortWithinPartitions(*keys)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    totals = {
        r["_pid"]: int(r["t"])
        for r in parts.groupBy("_pid")
        .agg(F.sum(F.col(value_col).cast("long")).alias("t"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]

    out_schema = parts.drop("_pid").schema.add(out_col, "long")
    cols = [f.name for f in out_schema.fields]

    def cumsum_batches(batches):
        carry = 0
        for pdf in batches:
            if not len(pdf):
                continue
            base = offsets[int(pdf["_pid"].iloc[0])]
            vals = pdf[value_col].to_numpy(dtype="int64")
            pdf = pdf.drop(columns=["_pid"])
            pdf[out_col] = vals.cumsum() + base + carry
            carry += int(vals.sum())
            yield pdf[cols]

    return parts.mapInPandas(cumsum_batches, schema=out_schema)
