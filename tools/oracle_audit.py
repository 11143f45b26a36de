"""Oracle output-type audit: no DuckDB-only numeric types may leak
into an oracle's result schema.

Why this exists (round-4 lesson): DuckDB widens ``sum(BIGINT)`` to
HUGEINT.  Fetched through Arrow — which is how the round driver fetches
oracle results — HUGEINT arrives as ``decimal128`` → Python
``Decimal('3')``, which hashes differently from Spark's ``int 3`` even
though the values are numerically identical.  Five driver-window rows
went red in round 4 for exactly this, and an audit sweep found ten more
latent instances outside the window.  The fix is always a one-line
``CAST(... AS BIGINT)`` in the oracle string; this module keeps the
whole class closed.

``DESCRIBE <query>`` makes DuckDB bind + type-check the query without
executing it, so auditing all ~180 oracles takes well under a second.
"""

from __future__ import annotations

# Types that can never round-trip through Arrow to the same Python value
# a Spark plan produces.  DECIMAL is forbidden too unless the Spark side
# is genuinely DecimalType (no registered plan is today) — DuckDB
# produces it from integer division / AVG-over-DECIMAL style expressions.
FORBIDDEN_SUBSTRINGS = ("HUGEINT", "UHUGEINT")
FORBIDDEN_PREFIXES = ("DECIMAL",)


def audit_oracle_types(con, oracles, allow_decimal=frozenset()):
    """Return {query_name: [(col, duckdb_type), ...]} for every oracle
    whose output schema contains a forbidden type.  Empty dict = clean.

    ``con`` must already have the table views registered.  A query name
    in ``allow_decimal`` may emit DECIMAL (for a future Spark plan that
    itself outputs DecimalType) but never HUGEINT.
    """
    bad = {}
    for name, sql in oracles.items():
        rows = con.execute("DESCRIBE " + sql).fetchall()
        offending = []
        for col, typ, *_ in rows:
            tu = typ.upper()
            if any(s in tu for s in FORBIDDEN_SUBSTRINGS):
                offending.append((col, typ))
            elif tu.startswith(FORBIDDEN_PREFIXES) and name not in allow_decimal:
                offending.append((col, typ))
        if offending:
            bad[name] = offending
    return bad
