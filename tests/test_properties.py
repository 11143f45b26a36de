"""Property-based invariants (SURVEY.md §5.3) via hypothesis: the
scalar toolkit and the W1 dedup contract hold for arbitrary inputs, not
just the fixture rows. Each example builds a small DataFrame and checks
the Spark result against a plain-Python model of the semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from firstamerican_etl_spark.functions.scalar import (
    coalesce_cascade,
    compact_date,
    concat_with_fallback,
    lpad_code,
)
from firstamerican_etl_spark.operators.relational import dedup_top1_per_group
from firstamerican_etl_spark.sources.io import load_table

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

codes = st.one_of(
    st.none(), st.text(alphabet="0123456789", min_size=0, max_size=8)
)


@SETTINGS
@given(st.lists(codes, min_size=1, max_size=30), st.integers(2, 7))
def test_lpad_code_model(spark, values, width):
    df = spark.createDataFrame([(v,) for v in values], "c: string")
    got = [r[0] for r in df.select(lpad_code("c", width)).collect()]
    for v, g in zip(values, got):
        if v is None:
            assert g is None
        elif len(v) >= width:
            # Spark lpad TRUNCATES overlong input to width — a real
            # semantic edge the docstring documents; model it
            assert g == v[:width]
        else:
            assert g == "0" * (width - len(v)) + v


vals = st.one_of(st.none(), st.integers(-3, 3))


@SETTINGS
@given(st.lists(st.tuples(vals, vals, vals), min_size=1, max_size=30))
def test_coalesce_cascade_model(spark, rows):
    df = spark.createDataFrame(rows, "a: long, b: long, c: long")
    value, used = coalesce_cascade([("a", "A"), ("b", "B"), ("c", "C")])
    got = df.select(value.alias("v"), used.alias("u")).collect()
    for (a, b, c), r in zip(rows, got):
        expect = next(
            ((x, lab) for x, lab in ((a, "A"), (b, "B"), (c, "C"))
             if x is not None and x != 0),
            (None, None),
        )
        assert (r["v"], r["u"]) == expect


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.text(alphabet="ab", max_size=3)),
            st.one_of(st.none(), st.text(alphabet="cd", max_size=3)),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_concat_fallback_model(spark, rows):
    df = spark.createDataFrame(rows, "l: string, r: string")
    got = [x[0] for x in df.select(concat_with_fallback("l", "r", sep="_")).collect()]
    for (l, r), g in zip(rows, got):
        if l is not None and r is not None:
            assert g == f"{l}_{r}"
        else:
            assert g == l  # null right -> fall back to left (even if None)


datestrs = st.one_of(
    st.dates(dt.date(1, 1, 1), dt.date(9999, 12, 31)).map(
        lambda d: d.strftime("%Y%m%d")
    ),
    st.text(alphabet="0123456789x", max_size=10),
)


@SETTINGS
@given(st.lists(datestrs, min_size=1, max_size=30))
def test_compact_date_null_on_malformed(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "c: string")
    got = [r[0] for r in df.select(compact_date("c")).collect()]
    for v, g in zip(values, got):
        # engine contract: strictly 8 digits (Spark's yyyyMMdd); Python's
        # strptime would greedily accept 7-char strings like '9990101',
        # Spark nulls them — the null-on-ambiguous behavior we want
        try:
            expect = (
                dt.datetime.strptime(v, "%Y%m%d").date() if len(v) == 8 else None
            )
        except ValueError:
            expect = None
        assert g == expect, f"{v!r}: {g} != {expect}"


@SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 5), st.integers(0, 100)),
        min_size=1,
        max_size=40,
    )
)
def test_dedup_top1_contract(spark, rows):
    """W1: exactly one row per key; the winner is max order_by value
    with min tiebreak among ties; input-order independence."""
    df = spark.createDataFrame(rows, "k: int, o: int, t: int")
    out = dedup_top1_per_group(
        df, partition_by=["k"], order_by=[F.col("o").desc()], tiebreak=["t"]
    ).collect()
    by_key: dict[int, tuple[int, int]] = {}
    for k, o, t in rows:
        cur = by_key.get(k)
        cand = (-o, t)
        if cur is None or cand < cur:
            by_key[k] = cand
    assert len(out) == len(by_key)
    for r in out:
        exp_o, exp_t = by_key[r["k"]]
        assert (-r["o"], r["t"]) == (exp_o, exp_t)


def test_hll_sketch_accuracy_vs_exact(spark, sf_dir):
    """The HLL rollup's estimates must sit within the sketch's
    advertised error (lgK=12 → ~1.6% rse; assert 5% to be safe) of
    exact distinct counts, and the unioned total must equal the
    estimate over the raw union."""
    from firstamerican_etl_spark.plans.registry import load_all

    est = {
        r["grain"]: r["approx_users"]
        for r in load_all()["hll_mergeable_rollup"].spark(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    exact_daily = {
        str(r["day_b"]): r["n"]
        for r in e.groupBy(F.date_trunc("day", F.col("ts")).alias("day_b"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact_total = e.select("user_id").distinct().count()
    assert abs(est["total"] - exact_total) <= max(1, 0.05 * exact_total)
    for day, n in exact_daily.items():
        assert abs(est[day] - n) <= max(1, 0.05 * n), f"{day}: {est[day]} vs {n}"


def test_approx_percentile_accuracy_vs_exact(spark, sf_dir):
    """percentile_approx at accuracy 10000 must be within 1% relative
    error of the exact percentile on this data."""
    from firstamerican_etl_spark.plans.registry import load_all

    approx = {
        r["l_returnflag"]: (r["p50"], r["p90"], r["p99"])
        for r in load_all()["approx_percentiles_sketch"].spark(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: (r["e50"], r["e90"], r["e99"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.5)).alias("e50"),
            F.percentile("l_extendedprice", F.lit(0.9)).alias("e90"),
            F.percentile("l_extendedprice", F.lit(0.99)).alias("e99"),
        )
        .collect()
    }
    for flag, (a50, a90, a99) in approx.items():
        e50, e90, e99 = exact[flag]
        for a, ex in ((a50, e50), (a90, e90), (a99, e99)):
            assert abs(a - ex) <= 0.01 * abs(ex) + 1e-9, f"{flag}: {a} vs {ex}"


def test_fast_sum_partitioning_invariance(spark):
    """The quantized-int64 fast path must be BIT-identical under any
    partitioning (the whole point of functions/stable.py): the same
    data summed in 1 partition and in 32 partitions yields the same
    doubles, and agrees with the decimal wide path at the shared
    rounding grid."""
    import random

    from firstamerican_etl_spark.functions.stable import fast_avg, fast_sum, stable_sum

    rnd = random.Random(7)
    rows = [(i % 7, round(rnd.uniform(-1e5, 1e5), 2)) for i in range(20_000)]
    df = spark.createDataFrame(rows, ["k", "x"])

    def result(d):
        out = d.groupBy("k").agg(
            fast_sum(F.col("x")).alias("s"), fast_avg(F.col("x"), 4).alias("a")
        )
        return {r["k"]: (r["s"], r["a"]) for r in out.collect()}

    one = result(df.coalesce(1))
    many = result(df.repartition(32))
    assert one == many  # exact equality, not approx

    wide = {
        r["k"]: r["s"]
        for r in df.groupBy("k").agg(stable_sum(F.col("x")).alias("s")).collect()
    }
    for k, (s, _) in one.items():
        # 2-decimal inputs: both paths are exact, so they agree exactly
        assert s == wide[k], f"group {k}: fast {s} vs wide {wide[k]}"


def test_ttl_throttle_gap_invariant(spark, sf_dir):
    """The TTL throttle's defining invariant: within each user,
    consecutive EMITTED events are ≥ TTL apart in event time, the
    first event of every active user is always emitted, and every
    suppressed event is < TTL after the previous emitted one (no
    over-suppression)."""
    from firstamerican_etl_spark.plans.registry import load_all

    kept = load_all()["streaming_ttl_throttle"].spark(spark, sf_dir)
    rows = sorted(
        ((r["user_id"], r["ts"]) for r in kept.collect()),
        key=lambda x: (x[0], x[1]),
    )
    ttl = 86400
    by_user: dict[int, list] = {}
    for uid, ts in rows:
        by_user.setdefault(uid, []).append(ts)
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    assert len(by_user) == n_users  # first event per user always passes
    for uid, tss in by_user.items():
        for a, b in zip(tss, tss[1:]):
            assert (b - a).total_seconds() >= ttl, (uid, a, b)


def test_pagerank_mass_conservation(spark, sf_dir):
    """Scaled-int PageRank sanity: all top-k ranks are positive, less
    than the total mass S=1e12, strictly ordered (desc, node asc
    tie-break), and node ids carry the bipartite prefixes."""
    from firstamerican_etl_spark.plans.registry import load_all

    rows = load_all()["pagerank_trade_graph"].spark(spark, sf_dir).collect()
    assert rows
    ranks = [(r["node"], r["rank_scaled"]) for r in rows]
    assert all(0 < v < 10**12 for _, v in ranks)
    assert ranks == sorted(ranks, key=lambda x: (-x[1], x[0]))
    assert all(n[0] in ("c", "s") for n, _ in ranks)


def test_boilerplate_bounds_and_coverage(spark, sf_dir):
    """Per doc: 0 ≤ n_boilerplate ≤ n_segments, keep_ratio ∈ [0, 1],
    segment counts equal ceil(words/3), and every document appears
    exactly once."""
    import math

    from firstamerican_etl_spark.plans.registry import load_all

    out = {
        r["doc_id"]: r
        for r in load_all()["boilerplate_segment_dedup"]
        .spark(spark, sf_dir)
        .collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(out) == len(docs)
    for d in docs:
        r = out[d["doc_id"]]
        n_words = len(d["text"].split(" "))
        assert r["n_segments"] == math.ceil(n_words / 3)
        assert 0 <= r["n_boilerplate"] <= r["n_segments"]
        assert 0.0 <= r["keep_ratio"] <= 1.0


def test_bpe_merge_is_boundary_aware(spark):
    """A merge winner (y, z) must only fuse WHOLE adjacent symbols:
    never inside 'xy z' (y is a suffix of symbol xy), never inside
    'a bc' via prefix (b prefixes bc), and ALL disjoint adjacent
    occurrences merge left-to-right ('a b a b' -> 'ab ab')."""
    from firstamerican_etl_spark.plans.textplans import (
        _BPE_L,
        _BPE_R,
        _bpe_apply_merge,
    )

    def rep(*syms: str) -> str:
        return " ".join(f"{_BPE_L}{s}{_BPE_R}" for s in syms)

    rows = [
        (rep("xy", "z"), 1),   # suffix trap: must NOT merge
        (rep("y", "zq"), 1),   # prefix trap: must NOT merge
        (rep("y", "z"), 1),    # genuine pair: must merge
        (rep("y", "z", "y", "z"), 1),  # both disjoint pairs merge
    ]
    df = spark.createDataFrame(rows, ["repr", "cnt"])
    win = spark.createDataFrame(
        [(1, "y", "z", 3)],
        ["merge_round", "left_sym", "right_sym", "pair_count"],
    )
    got = [r["repr"] for r in _bpe_apply_merge(df, win).collect()]
    assert sorted(got) == sorted(
        [rep("xy", "z"), rep("y", "zq"), rep("yz"), rep("yz", "yz")]
    )


# ---------------------------------------------------------------- local_df

_ldf_cell = st.one_of(
    st.integers(min_value=-(10**12), max_value=10**12),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.booleans(),
    st.none(),
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(_ldf_cell, st.text(max_size=6)),
                min_size=1, max_size=8))
def test_local_df_arrow_on_off_equivalence(spark, rows):
    """The r10 driver failure class, as a property: for ANY small
    frame, local_df must behave identically with Arrow enabled and
    disabled — same rows out, or the same refusal. A divergence means
    a plan passes every local test and fails (or silently differs) on
    the driver's pickle-path session."""
    from firstamerican_etl_spark.sources.io import local_df

    ddl = "x DOUBLE, s STRING"
    conf = "spark.sql.execution.arrow.pyspark.enabled"
    results = {}
    prev = spark.conf.get(conf, "true")
    try:
        for mode in ("true", "false"):
            spark.conf.set(conf, mode)
            try:
                got = sorted(
                    tuple(r) for r in local_df(spark, rows, ddl).collect()
                )
                results[mode] = ("ok", got)
            except Exception as exc:
                results[mode] = ("err", type(exc).__name__)
    finally:
        spark.conf.set(conf, prev)
    assert results["true"] == results["false"], results


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 1), st.integers(-5, 5)),
                min_size=1, max_size=6))
def test_local_df_bigint_bool_coercion_property(spark, rows):
    """Integral values coerce losslessly into BIGINT/BOOLEAN fields on
    the pickle path; the boolean column only ever receives exact 0/1
    here, so both engines' semantics agree by construction."""
    from firstamerican_etl_spark.sources.io import local_df

    conf = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(conf, "true")
    spark.conf.set(conf, "false")
    try:
        df = local_df(
            spark, [(bool(b), float(i)) for b, i in rows], "flag BOOLEAN, n BIGINT"
        )
        got = sorted(tuple(r) for r in df.collect())
        want = sorted((bool(b), i) for b, i in rows)
        assert got == want
    finally:
        spark.conf.set(conf, prev)


def test_local_df_integral_floats_with_nulls_coerce(spark):
    """r12 ADVICE: a null anywhere in a numeric column routes the whole
    frame to the strict list constructor, which (unlike the Arrow
    pandas path) rejects float literals headed for integer fields —
    callers mixing `2.0` and `None` in one BIGINT column saw a NEW
    error. Value-preserving floats now coerce per-cell on that branch;
    lossy ones (2.5, NaN, inf) still refuse loudly."""
    import pytest as _pytest

    from firstamerican_etl_spark.sources.io import local_df

    got = sorted(
        (
            tuple(r)
            for r in local_df(
                spark, [(1.0, "a"), (None, "b"), (2.0, None)], "n BIGINT, s STRING"
            ).collect()
        ),
        key=str,
    )
    assert got == sorted([(1, "a"), (2, None), (None, "b")], key=str)
    with _pytest.raises(Exception):
        local_df(spark, [(2.5, "a"), (None, "b")], "n BIGINT, s STRING").collect()
    with _pytest.raises(Exception):
        local_df(
            spark, [(float("nan"), "a"), (None, "b")], "n BIGINT, s STRING"
        ).collect()


def test_local_df_bool_zero_one_with_nulls_coerce(spark):
    """r12 review follow-up: the null-branch coercion must mirror the
    dense path for BOOLEAN too — exact 0/1 numerics coerce, anything
    else refuses — or adding a null flips a working call to an error."""
    import pytest as _pytest

    from firstamerican_etl_spark.sources.io import local_df

    got = sorted(
        (
            tuple(r)
            for r in local_df(
                spark, [(1.0, "a"), (None, "b"), (0, "c")], "b BOOLEAN, s STRING"
            ).collect()
        ),
        key=str,
    )
    assert got == sorted([(True, "a"), (None, "b"), (False, "c")], key=str)
    with _pytest.raises(Exception):
        local_df(spark, [(2.0, "a"), (None, "b")], "b BOOLEAN, s STRING").collect()
