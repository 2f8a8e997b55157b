"""Source/sink format breadth: the engine's tables survive a
write/read round-trip through every built-in columnar/row format with
exact value fidelity (explicit schemas on schemaless formats — schema
inference is banned in this codebase, SURVEY §1.3).

Parquet is the primary format (TESTDATA.md); these prove a user can
land the same tables via CSV/JSON/ORC feeds without value drift —
including the double columns (CSV/JSON write shortest-repr decimals,
which must parse back to the identical IEEE bits) and timestamps.
"""

from __future__ import annotations

import pytest

from angelone_clickhouse_spark.sources.tables import load_table, ticks


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
@pytest.mark.parametrize("table", ["nation", "customer", "lineitem"])
def test_table_roundtrip(spark, sf_dir, tmp_path, fmt, table):
    src = load_table(spark, sf_dir, table)
    path = str(tmp_path / f"{table}_{fmt}")
    writer = src.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.save(path)
    reader = spark.read.format(fmt)
    if fmt in ("csv", "json"):
        # text formats carry no types: explicit schema, never inference
        reader = reader.schema(src.schema)
    if fmt == "csv":
        reader = reader.option("header", True)
    back = reader.load(path)
    assert back.schema == src.schema, (fmt, table)
    assert _rows(back) == _rows(src), (fmt, table)


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_ticks_roundtrip(spark, sf_dir, tmp_path, fmt):
    """The canonical tick table (TIMESTAMP_NTZ event time + doubles)
    — the table the streaming sink writes — survives each format."""
    src = ticks(spark, sf_dir)
    path = str(tmp_path / f"ticks_{fmt}")
    # CSV's and JSON's default timestampNTZFormat truncates to
    # milliseconds — silent event-time corruption for a tick feed;
    # pin microseconds on both sides
    ntz_us = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    writer = src.write.mode("overwrite").format(fmt)
    if fmt in ("csv", "json"):
        writer = writer.option("timestampNTZFormat", ntz_us)
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.save(path)
    reader = spark.read.format(fmt)
    if fmt in ("csv", "json"):
        reader = reader.schema(src.schema).option(
            "timestampNTZFormat", ntz_us
        )
    if fmt == "csv":
        reader = reader.option("header", True)
    back = reader.load(path)
    assert back.schema == src.schema, fmt
    assert _rows(back) == _rows(src), fmt
