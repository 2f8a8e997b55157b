"""Cross-engine-exact aggregates for fixed-point data.

Why this exists: ``round(avg(price), k)`` is NOT reproducible across
engines. Averages of cent-valued data land exactly on decimal halves
(sum_cents/n hits m·5·10^-(k+1) whenever n is even and divides the
cent sum suitably), and at an exact half the two engines legitimately
disagree: Spark rounds the double's shortest decimal representation
half-up, DuckDB rounds the scaled binary value — for a half whose
nearest double sits just below it, Spark says up and DuckDB says down.
This produced a real one-ULP-of-decimal mismatch in q8 at sf0.1
(avg 56.20875 -> 56.2088 vs 56.2087).

Fix: never round a float. Sum the data as exact integers (cents), do
half-up rounding with integer arithmetic, and divide back at the end.
Integer sums are order-independent and bit-identical on any engine,
so the result is reproducible by construction.

``avg_fixed`` = half-up average at 2 decimals:
    cents = round(x * 100)                      (exact: data is 2-dec)
    avg   = floor((sum(cents) + floor(n/2)) / n) / 100

The float division inside floor is safe below 2^53: when n divides
(sum+half) exactly the IEEE quotient is the exact integer, and
otherwise the quotient is >= 1/n away from an integer — double error
(~1e-16) can't cross that. The DuckDB spelling uses pure integer
``//`` and is exactly equal. Inputs must be non-negative (true for
every column this engine averages).

At 100 TB: sum(cents) stays < 2^53 up to ~9e13 dollars of volume per
group; past that, swap the long for DecimalType(38,0) — the formula
is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 100  # 2 decimal places


def sum_fixed(col: str | Column, alias: str) -> Column:
    """Order-independent exact sum of a 2-decimal column (in units)."""
    c = F.col(col) if isinstance(col, str) else col
    cents = F.round(c * SCALE).cast("long")
    return (F.sum(cents) / F.lit(float(SCALE))).alias(alias)


def avg_fixed(col: str | Column, alias: str) -> Column:
    """Half-up average of a non-negative 2-decimal column, exact and
    engine-independent. Output is a double on the cent grid."""
    c = F.col(col) if isinstance(col, str) else col
    cents = F.round(c * SCALE).cast("long")
    s = F.sum(cents)
    n = F.count(F.lit(1))
    avg_cents = F.floor((s + F.floor(n / 2)) / n)
    return (avg_cents / F.lit(float(SCALE))).alias(alias)


def avg_fixed_sql(expr: str, alias: str) -> str:
    """The DuckDB spelling of avg_fixed (pure integer arithmetic)."""
    return (
        f"CAST((sum(CAST(round(({expr}) * 100) AS BIGINT)) + count(*) // 2) "
        f"// count(*) AS DOUBLE) / 100 AS {alias}"
    )


def sum_fixed_sql(expr: str, alias: str) -> str:
    return (
        f"CAST(sum(CAST(round(({expr}) * 100) AS BIGINT)) AS DOUBLE) / 100 "
        f"AS {alias}"
    )
