"""The driver's correctness harness builds its own SparkSession
WITHOUT the Arrow conf our session factory sets
(``spark.sql.execution.arrow.pyspark.enabled=true``,
``session.py``). ``createDataFrame(pdf, schema)`` then takes the
pickle fallback, which verifies every value STRICTLY against the
declared type — Arrow's silent float64→int64 cast does not happen,
so a dtype/DDL mismatch that passes every local test fails on the
driver (the r10 ``range_join_quantity_bands`` red row:
``LongType() can not accept object 0.0``).

This module closes that tests-vs-driver config split: it disables
Arrow on the shared session and re-runs every DRIVER_WINDOW query
that (transitively, by source inspection) builds a ``local_df``,
against the same DuckDB oracle check the driver applies.
"""

from __future__ import annotations

import inspect

import pytest

from firstamerican_etl_spark.plans.registry import load_all
from tests.oracle_harness import compare

_ARROW_CONF = "spark.sql.execution.arrow.pyspark.enabled"


def _local_df_users() -> set[str]:
    """Names of registered queries whose plan function — or any
    module-level function its source mentions, to a fixpoint —
    contains a ``local_df`` call."""
    reg = load_all()
    modules = {inspect.getmodule(spec.spark) for spec in reg.values()}
    # seed: module-level callables whose source mentions local_df
    users: set[str] = set()
    funcs: dict[str, str] = {}  # qualified name -> source
    for mod in modules:
        if mod is None:
            continue
        for name, obj in vars(mod).items():
            if callable(obj) and inspect.getmodule(obj) is mod:
                try:
                    src = inspect.getsource(obj)
                except (OSError, TypeError):
                    continue
                key = f"{mod.__name__}.{name}"
                funcs[key] = src
                if "local_df" in src:
                    users.add(key)
    # fixpoint: a function whose source names a known user is a user
    changed = True
    while changed:
        changed = False
        short = {u.rsplit(".", 1)[1] for u in users}
        for key, src in funcs.items():
            if key in users:
                continue
            if any(s in src for s in short):
                users.add(key)
                changed = True
    short = {u.rsplit(".", 1)[1] for u in users}
    out = set()
    for name, spec in reg.items():
        mod = inspect.getmodule(spec.spark)
        key = f"{mod.__name__}.{spec.spark.__name__}" if mod else ""
        if key in users or spec.spark.__name__ in short:
            out.add(name)
    return out


# Run the full closure, not just the DRIVER_WINDOW slice — rotated-out
# local_df users (geo kNN/PIP, PQ-ADC, kmeans) can rotate back in, and
# the failure class is config-dependent, so local tests are the only
# early warning. 7 queries at sf0.001 ≈ seconds.
_USERS = _local_df_users()


def test_detection_finds_the_r10_failure() -> None:
    # the query that actually failed on the driver must be in the set
    # (guards the source-inspection heuristic itself)
    assert "range_join_quantity_bands" in _USERS


@pytest.fixture()
def arrow_off(spark):
    prev = spark.conf.get(_ARROW_CONF, "true")
    spark.conf.set(_ARROW_CONF, "false")
    try:
        yield spark
    finally:
        spark.conf.set(_ARROW_CONF, prev)


@pytest.mark.parametrize("name", sorted(_USERS))
def test_local_df_queries_arrow_off(name, arrow_off, sf_dir) -> None:
    spec = load_all()[name]
    df = spec.spark(arrow_off, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0
    else:
        errs = compare(name, df, spec.oracle, sf_dir)
        assert not errs, "\n".join(errs)


def test_local_df_coerces_float_rows_to_bigint(arrow_off) -> None:
    """Float literals + integer DDL must produce a valid frame on the
    pickle path (local_df coerces); non-integral floats must NOT be
    silently truncated."""
    from firstamerican_etl_spark.sources.io import local_df

    df = local_df(arrow_off, [("a", 0.0, 10.0), ("b", 40.0, 1e9)],
                  "k STRING, lo BIGINT, hi BIGINT")
    got = {tuple(r) for r in df.collect()}
    assert got == {("a", 0, 10), ("b", 40, 10**9)}
    assert dict(df.dtypes) == {"k": "string", "lo": "bigint", "hi": "bigint"}

    with pytest.raises(Exception, match="LongType|field lo"):
        local_df(arrow_off, [("a", 0.5, 10.0)],
                 "k STRING, lo BIGINT, hi BIGINT").collect()
