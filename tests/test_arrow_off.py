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
    package function/method its source mentions, to a fixpoint —
    contains a ``local_df`` call. The closure walks EVERY loaded
    ``firstamerican_etl_spark`` module, not just the plan modules: the
    r11 review found queries reaching local_df through operators/ and
    pipeline/ helpers (connected-components' driver union-find, the
    corpus boilerplate stage) that a plans-only scan missed."""
    import importlib
    import pkgutil

    import firstamerican_etl_spark as pkg

    reg = load_all()
    # import every submodule (many helpers are imported lazily inside
    # function bodies, so sys.modules alone misses them)
    modules = set()
    for info in pkgutil.walk_packages(pkg.__path__, prefix=pkg.__name__ + "."):
        try:
            modules.add(importlib.import_module(info.name))
        except ImportError:
            continue  # optional-dependency module: not on any query path
    # a silently-skipped CORE module would shrink the user set to
    # nothing without signal — pin the helper modules the r11 review
    # found reachable only through lazy imports
    core = {f"{pkg.__name__}.operators.graph", f"{pkg.__name__}.pipeline.corpus_build"}
    assert core <= {m.__name__ for m in modules}, "core modules failed to import"

    def _referenced_names(fn) -> set[str]:
        """Global names a function's code (incl. nested code objects:
        lambdas, comprehensions, inner defs) references — exact, from
        co_names/co_freevars, no source-text substring noise."""
        names: set[str] = set()
        stack = [fn.__code__]
        while stack:
            code = stack.pop()
            names.update(code.co_names)
            names.update(code.co_freevars)
            stack.extend(c for c in code.co_consts if hasattr(c, "co_names"))
        return names

    refs: dict[str, set[str]] = {}  # short fn name -> referenced names
    for mod in modules:
        for name, obj in vars(mod).items():
            if inspect.isfunction(obj) and getattr(obj, "__module__", "").startswith(
                "firstamerican_etl_spark"
            ):
                refs.setdefault(name, set()).update(_referenced_names(obj))
            elif inspect.isclass(obj) and getattr(obj, "__module__", "").startswith(
                "firstamerican_etl_spark"
            ):
                for mname, meth in vars(obj).items():
                    if inspect.isfunction(meth):
                        refs.setdefault(f"{name}.{mname}", set()).update(
                            _referenced_names(meth)
                        )
    # fixpoint over short names: a callable referencing a known user
    # (or local_df itself) is a user
    users: set[str] = {"local_df"}
    changed = True
    while changed:
        changed = False
        for name, rf in refs.items():
            if name in users:
                continue
            # co_names holds single identifiers, so match each user's
            # leading name ("Class.method" users match via "Class")
            if any(u.split(".", 1)[0] in rf for u in users):
                users.add(name)
                changed = True
    return {name for name, spec in reg.items() if spec.spark.__name__ in users}


# Run the full closure, not just the DRIVER_WINDOW slice — rotated-out
# local_df users (geo kNN/PIP, PQ-ADC, kmeans, the graph-components
# family) can rotate back in, and the failure class is
# config-dependent, so local tests are the only early warning.
# ~9 queries at sf0.001 ≈ seconds.
_USERS = _local_df_users()


def test_detection_finds_the_r10_failure() -> None:
    # the query that actually failed on the driver must be in the set
    # (guards the source-inspection heuristic itself), as must a query
    # that only reaches local_df through a lazily-imported operators/
    # helper (the r11 review's coverage-gap finding)
    assert "range_join_quantity_bands" in _USERS
    assert "dedup_cluster_components" in _USERS


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
