"""Cross-engine bit-stable floating-point aggregates and rounding.

Two distinct sources of oracle divergence, two fixes:

1. **Summation order.** Double addition is not associative; a
   distributed sum disagrees with a single-node oracle in the last
   bits. Fix: cast inputs to DECIMAL(25,6) before summing — decimal
   addition is exact and associative, so every partitioning yields the
   same total; cast back to double afterwards. At 1000 executors the
   result equals the single-node answer exactly.

2. **round() semantics.** Spark's ``round(double, n)`` rounds the
   double's *shortest decimal string* (java BigDecimal.valueOf), while
   DuckDB/C engines round the *binary value*: round(4201.3149999999996,
   2) → 4201.32 in Spark ("4201.315" string) but 4201.31 in DuckDB.
   Fix: never use engine round on doubles for comparable output; use
   ``floor(x * 10^n + 0.5) / 10^n`` — floor/multiply/add are identical
   IEEE-754 ops in every engine, so the result is bit-identical
   everywhere (the occasional half-ulp tie resolves the same way on
   both sides, which is what matters).

Oracle-side SQL must use the same patterns; ``sql_*`` helpers emit it.

Two implementations, one contract:

- ``fast_sum``/``fast_avg`` (DEFAULT for engine queries): quantize each
  value to 10^-scale with floor(x·10ˢ+½), sum exact int64 inside
  whole-stage codegen. ~5× faster than decimal accumulation at sf0.1
  (long adds vs BigDecimal adds); bounded by int64 (documented on the
  function). All plan modules use this path — driver-testdata
  magnitudes sit orders below the bound, as does TPC-H at any
  published SF.
- ``stable_sum``/``stable_avg`` (wide path): DECIMAL(25,6)
  accumulation — no practical overflow bound; use when magnitudes are
  unknown or per-group row counts can exceed ~10^12.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def stable_round(col: Column, round_to: int = 2) -> Column:
    """Engine-independent rounding of a double: floor(x·10ⁿ + ½)/10ⁿ."""
    factor = 10**round_to
    return F.floor(col * F.lit(factor) + F.lit(0.5)) / F.lit(factor)


def stable_sum(expr: Column, round_to: int = 2) -> Column:
    """Order-independent sum of a double expression, stably rounded."""
    return stable_round(F.sum(expr.cast(DEC)).cast("double"), round_to)


def stable_avg(expr: Column, round_to: int = 2) -> Column:
    """Order-independent mean: exact decimal total / non-null count,
    stably rounded (AVG semantics: count excludes nulls)."""
    return stable_round(
        F.sum(expr.cast(DEC)).cast("double") / F.count(expr), round_to
    )


def fast_sum(expr: Column, round_to: int = 2, scale: int = 6) -> Column:
    """Order-independent sum of a double expression on the FAST path:
    quantize each value to 10^-scale with floor(x·10ˢ+½) (identical
    IEEE ops in every engine), sum exact int64s inside whole-stage
    codegen, convert back. ~5× faster than the decimal path at sf0.1
    (long adds vs BigDecimal adds) and equally bit-stable under any
    partitioning.

    OVERFLOW BOUND (the price of the fast path): the quantized sum
    must fit in int64 — Σ|x| < 9.2·10^18 / 10^scale per group
    (9.2·10^12 at scale 6). That holds for every contract table by
    orders of magnitude, and for TPC-H-shaped data at any published
    SF; for unbounded magnitudes (or >10^12-row groups of large
    values) use ``stable_sum`` — decimal(25,6) never overflows first.
    """
    factor = float(10**scale)
    q = F.sum(F.floor(expr * F.lit(factor) + F.lit(0.5)).cast("long"))
    return stable_round(q.cast("double") / F.lit(factor), round_to)


def fast_avg(expr: Column, round_to: int = 2, scale: int = 6) -> Column:
    """Order-independent mean on the fast quantized-long path (AVG
    semantics: count excludes nulls). Same overflow bound as
    ``fast_sum``."""
    factor = float(10**scale)
    q = F.sum(F.floor(expr * F.lit(factor) + F.lit(0.5)).cast("long"))
    return stable_round(
        q.cast("double") / F.lit(factor) / F.count(expr), round_to
    )


def sql_stable_round(expr: str, round_to: int = 2) -> str:
    factor = 10**round_to
    return f"floor(({expr}) * {factor} + 0.5) / {factor}"


def sql_stable_sum(expr: str, round_to: int = 2) -> str:
    return sql_stable_round(
        f"CAST(sum(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)", round_to
    )


def sql_stable_avg(expr: str, round_to: int = 2) -> str:
    return sql_stable_round(
        f"CAST(sum(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) / count({expr})",
        round_to,
    )


def sql_fast_sum(expr: str, round_to: int = 2, scale: int = 6) -> str:
    """Oracle-side mirror of ``fast_sum`` — MUST stay the identical
    expression tree (quantize → int sum → double divide → round)."""
    factor = 10**scale
    return sql_stable_round(
        f"CAST(sum(CAST(floor(({expr}) * {factor} + 0.5) AS BIGINT))"
        f" AS DOUBLE) / {factor}",
        round_to,
    )


def sql_fast_avg(expr: str, round_to: int = 2, scale: int = 6) -> str:
    """Oracle-side mirror of ``fast_avg``."""
    factor = 10**scale
    return sql_stable_round(
        f"CAST(sum(CAST(floor(({expr}) * {factor} + 0.5) AS BIGINT))"
        f" AS DOUBLE) / {factor} / count({expr})",
        round_to,
    )
