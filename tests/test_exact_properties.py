"""Property tests for functions/exact.py — the device every money
oracle in the engine rests on. The DuckDB spelling is checked against
exact rational arithmetic (Fraction) under hypothesis; the Spark
column form is checked against both on an adversarial fixed set
(cent-grid halves, where naive round(avg(double)) provably diverges
cross-engine)."""

from __future__ import annotations

from fractions import Fraction

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from angelone_clickhouse_spark.functions.exact import (
    avg_fixed,
    avg_fixed_sql,
    sum_fixed_round2_sql,
)

cents_lists = st.lists(
    st.integers(min_value=0, max_value=10_000_000), min_size=1, max_size=50
)


def _half_up(num: int, den: int) -> int:
    """Half-up integer rounding of num/den (both positive)."""
    return (num + den // 2) // den


@given(cents_lists)
@settings(max_examples=200, deadline=None)
def test_avg_fixed_sql_is_exact_half_up(cents):
    """avg_fixed's SQL spelling == Fraction-exact half-up cent average."""
    con = duckdb.connect()
    vals = ", ".join(f"({c / 100!r})" for c in cents)
    # values are 2-decimal by construction: c/100 rounds back exactly
    got = con.sql(
        f"SELECT {avg_fixed_sql('x', 'a')} FROM (VALUES {vals}) t(x)"
    ).fetchone()[0]
    expected = _half_up(sum(cents), len(cents)) / 100
    assert got == expected, (cents, got, expected)


@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_sum_fixed_round2_sql_is_exact(units4):
    """sum_fixed_round2's SQL spelling at grid 4 == Fraction-exact
    half-up rounding of the unit sum to cents."""
    con = duckdb.connect()
    vals = ", ".join(f"({u / 10_000!r})" for u in units4)
    got = con.sql(
        f"SELECT {sum_fixed_round2_sql('x', 4, 's')} FROM (VALUES {vals}) t(x)"
    ).fetchone()[0]
    expected = _half_up(sum(units4), 100) / 100
    assert got == expected, (units4, got, expected)


def test_avg_fixed_spark_matches_duckdb_on_half_grid(spark):
    """The adversarial case: averages landing exactly on .005 halves.
    Spark column form, DuckDB spelling, and Fraction must agree."""
    # pairs averaging to X.XX5 exactly: (a + b) / 2 with a+b odd cents
    cases = [
        [5620, 5621],         # avg 5620.5 cents = 56.205 -> 56.21
        [1, 2],               # 1.5 -> 2 cents
        [99999, 100000],      # 999.995 -> 1000.00
        [3, 3, 4],            # 10/3 -> 3.33.. -> 3
        [7, 8, 8],            # 23/3
    ]
    con = duckdb.connect()
    for cents in cases:
        df = spark.createDataFrame([(c / 100,) for c in cents], "x double")
        got_spark = df.agg(avg_fixed("x", "a")).collect()[0][0]
        vals = ", ".join(f"({c / 100!r})" for c in cents)
        got_duck = con.sql(
            f"SELECT {avg_fixed_sql('x', 'a')} FROM (VALUES {vals}) t(x)"
        ).fetchone()[0]
        expected = _half_up(sum(cents), len(cents)) / 100
        assert got_spark == got_duck == expected, (
            cents, got_spark, got_duck, expected,
        )
