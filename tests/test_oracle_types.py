"""Close the DuckDB-only-output-type class (r04 regression root cause).

Round 4 shipped five driver-red rows because their oracle SQL summed
BIGINT without a cast — DuckDB widens that to HUGEINT, which the
driver's Arrow fetch surfaces as ``Decimal`` and hash-mismatches
against Spark's ``int``.  Ten more latent instances existed outside the
driver window.  These tests pin the whole class shut:

* every registered oracle's DESCRIBE'd output schema is free of
  HUGEINT/UHUGEINT/DECIMAL,
* the audit demonstrably catches a planted offender (canary),
* the sim/pytest harness fetch+hash path demonstrably reproduces the
  Decimal-vs-int divergence the driver sees (so a future leak goes red
  locally, not one round later).
"""

from __future__ import annotations

import os
import sys
from decimal import Decimal

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firstamerican_etl_spark.plans.registry import load_all
from firstamerican_etl_spark.sources.io import TABLES
from tools.oracle_audit import audit_oracle_types


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield c
    c.close()


def test_all_registered_oracles_type_clean(con):
    """No oracle may output HUGEINT/UHUGEINT/DECIMAL — each would
    arrive as Decimal through the driver's Arrow fetch and hash-fail
    against the Spark plan's int/double output."""
    oracles = {n: s.oracle for n, s in load_all().items() if s.oracle is not None}
    assert len(oracles) > 150  # the audit must actually cover the registry
    bad = audit_oracle_types(con, oracles)
    assert bad == {}, f"DuckDB-only output types leaked into oracles: {bad}"


def test_audit_catches_uncast_sum_canary(con):
    """Reverting any one of the r04 CAST fixes must go red here: an
    un-cast integer sum() is exactly the planted canary."""
    canary = "SELECT CAST(sum(x) AS BIGINT) AS ok, sum(x) AS leaked FROM (SELECT CAST(1 AS BIGINT) AS x)"
    bad = audit_oracle_types(con, {"canary": canary})
    assert bad == {"canary": [("leaked", "HUGEINT")]}


def test_audit_catches_decimal_division(con):
    """DECIMAL outputs (e.g. DECIMAL literal arithmetic) are the same
    class and must also be flagged unless explicitly whitelisted."""
    q = "SELECT CAST(1.5 AS DECIMAL(10,2)) AS d"
    assert audit_oracle_types(con, {"q": q}) == {"q": [("d", "DECIMAL(10,2)")]}
    assert audit_oracle_types(con, {"q": q}, allow_decimal={"q"}) == {}


def test_arrow_fetch_preserves_hugeint_as_decimal(con):
    """The sim's Arrow fetch path must surface HUGEINT as Decimal —
    the exact driver behavior DBAPI fetchall() was hiding."""
    from tools.driver_sim import fetch_oracle

    cols, rows = fetch_oracle(con, "SELECT sum(x) AS s FROM (SELECT CAST(3 AS BIGINT) AS x)")
    assert cols == ["s"]
    assert isinstance(rows[0][0], Decimal)
    # and the DBAPI path really does hide it (documents why Arrow fetch exists)
    dbapi_val = con.execute("SELECT sum(x) AS s FROM (SELECT CAST(3 AS BIGINT) AS x)").fetchall()[0][0]
    assert isinstance(dbapi_val, int)


def test_sim_hash_distinguishes_decimal_from_int():
    """The sim's value hash must treat Decimal('3') and int 3 as
    different — numerically equal, hash-distinct, like the driver."""
    from tools.driver_sim import hash_rows

    assert hash_rows(["s"], [(Decimal("3"),)]) != hash_rows(["s"], [(3,)])
    # same-typed values still hash equal
    assert hash_rows(["s"], [(3,)]) == hash_rows(["s"], [(3,)])


def test_pytest_harness_reproduces_driver_divergence(con, sf_dir):
    """End-to-end canary through the pytest oracle harness: an un-cast
    sum must produce a row diff against an int-typed 'spark side'."""
    from tests.oracle_harness import normalize, run_oracle

    o_cols, o_rows = run_oracle(
        "SELECT sum(x) AS s FROM (SELECT CAST(3 AS BIGINT) AS x)", sf_dir
    )
    assert isinstance(o_rows[0][0], Decimal)
    _, on = normalize(o_cols, o_rows)
    _, sn = normalize(["s"], [(3,)])
    assert repr(sn[0]) != repr(on[0])
