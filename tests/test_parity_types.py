"""The type-sensitivity half of tools/check_parity.py (r13): the r12
zorder_layout red shipped because the stringified value compare was
laxer than the driver's type-sensitive hash — a DuckDB HUGEINT with
values equal to Spark's BIGINT passed locally and failed the driver.
These tests pin the canonicalization maps and prove the gate catches
that exact class."""

from __future__ import annotations

import duckdb
import pytest

from tools.check_parity import (
    _canon_duck_type,
    _canon_spark_type,
    _type_mismatches,
)


def test_integer_widths_are_distinct():
    assert _canon_duck_type("HUGEINT") == "i128"
    assert _canon_duck_type("BIGINT") == "i64"
    assert _canon_duck_type("INTEGER") == "i32"
    assert _canon_spark_type("bigint") == "i64"
    assert _canon_spark_type("int") == "i32"
    assert _canon_duck_type("HUGEINT") != _canon_spark_type("bigint")


def test_common_types_align_across_engines():
    pairs = [
        ("BIGINT", "bigint"),
        ("INTEGER", "int"),
        ("DOUBLE", "double"),
        ("VARCHAR", "string"),
        ("BOOLEAN", "boolean"),
        ("DATE", "date"),
        ("TIMESTAMP", "timestamp"),
        ("TIMESTAMP", "timestamp_ntz"),
        ("BIGINT[]", "array<bigint>"),
        ("DOUBLE[]", "array<double>"),
        ("DECIMAL(10,2)", "decimal(10,2)"),
        ("STRUCT(a INTEGER, b VARCHAR)", "struct<a:int,b:string>"),
        (
            "STRUCT(a BIGINT, xs DOUBLE[])",
            "struct<a:bigint,xs:array<double>>",
        ),
        ("MAP(VARCHAR, BIGINT)", "map<string,bigint>"),
        (
            "STRUCT(inner STRUCT(x INTEGER))",
            "struct<inner:struct<x:int>>",
        ),
    ]
    for duck, spark in pairs:
        assert _canon_duck_type(duck) == _canon_spark_type(spark), (
            duck,
            spark,
        )


def test_tz_aware_timestamp_is_distinct():
    """ADVICE r13: a TIMESTAMPTZ oracle column must FAIL the local
    type gate — its isoformat values carry +00:00 and would mismatch
    the driver's hash of Spark's tz-naive collect() datetimes."""
    assert _canon_duck_type("TIMESTAMPTZ") == "ts_tz"
    assert _canon_duck_type("TIMESTAMP WITH TIME ZONE") == "ts_tz"
    assert _canon_duck_type("TIMESTAMP") == "ts"
    assert _canon_spark_type("timestamp") == "ts"
    assert _canon_spark_type("timestamp_ntz") == "ts"
    assert _canon_duck_type("TIMESTAMPTZ") != _canon_spark_type("timestamp")


def test_struct_grammar_mismatch_detected():
    """Same field names but different field types must still mismatch
    under the shared struct grammar (it must not collapse to a blind
    string compare that never matches OR always matches)."""
    assert _canon_duck_type("STRUCT(a INTEGER)") != _canon_spark_type(
        "struct<a:bigint>"
    )
    assert _canon_duck_type("MAP(VARCHAR, INTEGER)") != _canon_spark_type(
        "map<string,bigint>"
    )


def test_correlated_sum_is_hugeint_and_flagged(spark):
    """The exact r12 failure: a correlated sum() over UNNEST types as
    HUGEINT; joined on column name against a Spark BIGINT schema, the
    gate must flag it — and must pass once the oracle CASTs."""
    sdf = spark.range(1).selectExpr("cast(3 as bigint) as zval")
    con = duckdb.connect()
    bad = con.sql(
        "SELECT (SELECT sum(x) FROM UNNEST(generate_series(0, 2))"
        " AS t(x)) AS zval"
    )
    mis = _type_mismatches(sdf.schema, bad.columns, bad.types)
    assert mis and "i128" in mis[0]
    good = con.sql(
        "SELECT CAST((SELECT sum(x) FROM UNNEST(generate_series(0, 2))"
        " AS t(x)) AS BIGINT) AS zval"
    )
    assert _type_mismatches(sdf.schema, good.columns, good.types) == []


def test_mismatch_join_is_by_column_name_not_position(spark):
    sdf = spark.range(1).selectExpr(
        "cast(1 as bigint) as a", "cast(2 as int) as b"
    )
    con = duckdb.connect()
    rel = con.sql(
        "SELECT CAST(2 AS INTEGER) AS b, CAST(1 AS BIGINT) AS a"
    )
    assert _type_mismatches(sdf.schema, rel.columns, rel.types) == []
