"""Parquet table loaders + the canonical tick-table derivation.

The reference system's one real table is ``angelone_market_data``
(reference db/clickhouse.go:16-28): a tick table
``(token, timestamp, last_traded_price, open/high/low/close, volume)``
clustered by timestamp (MergeTree ORDER BY timestamp). For
oracle-differential testing the driver only ships the synthetic star
schema (TESTDATA.md), so the engine derives a deterministic tick table
from ``events`` (FIXTURES.md B2 mapping: token <- user_id,
price <- value, ts <- ts). The SAME derivation is expressed once as a
DataFrame plan (:func:`ticks`) and once as a DuckDB CTE
(:data:`TICKS_ORACLE_CTE`) so every declared query Q1-Q8 can be
hash-checked against an independent engine.

Scale note: the derivation is pure narrow projection (no shuffle); at
100 TB the tick table would instead be the Parquet dataset written by
``streaming/ingest.py`` partitioned by date and sorted by timestamp —
same schema, so every query in operators/queries.py runs unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Tables whose parquet files carry TIMESTAMP(NANOS) columns that
# Spark's reader cannot ingest directly; we read nanos as long and
# rebuild a microsecond timestamp (truncating, like DuckDB's ns->us
# cast) with integer division to avoid double-precision loss.
_NANOS_TS_COLS = {"events": ["ts"]}


def _sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str | None, name: str) -> DataFrame:
    """Load one synthetic table; normalizes nano timestamps to TimestampType."""
    sf_dir = sf_dir or _sf_dir()
    if name in _NANOS_TS_COLS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NANOS_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} DIV 1000")))
    return df


def register_tables(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every synthetic table as a temp view (for spark.sql use)."""
    from angelone_clickhouse_spark import TABLES

    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def ticks(
    spark: SparkSession,
    sf_dir: str | None = None,
    tokens: tuple[str, ...] | None = None,
) -> DataFrame:
    """The canonical tick table, derived deterministically from ``events``.

    Schema mirrors the reference sink table (db/clickhouse.go:17-25)
    plus the wire fields the reference decoded then discarded
    (sequence_number — SURVEY.md D1/D5): token, ts, sequence_number,
    last_traded_price, open_price, high_price, low_price, close_price,
    volume. OHLC spreads are deterministic functions of (value,
    event_id) so that min/max/first/last aggregates have real work to do.

    ``tokens``: optional token filter applied as an *integer* predicate
    on the underlying user_id column. A predicate on the derived string
    column (``cast(user_id as string) = '7'``) cannot cross the cast,
    so it never reaches the parquet scan; pre-filtering on the source
    column gets PushedFilters row-group skipping — the derivation is
    injective, so semantics are identical.
    """
    ev = load_table(spark, sf_dir, "events")
    if tokens:
        ev = ev.filter(F.col("user_id").isin([int(t) for t in tokens]))
    return ev.select(
        F.col("user_id").cast("string").alias("token"),
        F.col("ts"),
        F.col("event_id").alias("sequence_number"),
        F.col("value").alias("last_traded_price"),
        (F.col("value") - F.col("event_id") % 7).alias("open_price"),
        (F.col("value") + F.col("event_id") % 11).alias("high_price"),
        (F.col("value") - F.col("event_id") % 13).alias("low_price"),
        (F.col("value") + F.col("event_id") % 5).alias("close_price"),
        (F.col("event_id") % 1000).cast("double").alias("volume"),
    )


# DuckDB rendition of ticks() — MUST stay semantically identical to the
# DataFrame plan above; every oracle in operators/queries.py prepends it.
def trunc_ntz(unit: str, col):
    """Timezone-independent truncation for TIMESTAMP_NTZ columns.

    ``F.date_trunc`` interprets an NTZ input in the session timezone
    and returns an *instant* (TIMESTAMP), so collected labels — and,
    for sub-hour-offset zones, the bucket boundaries themselves —
    shift with ``spark.sql.session.timeZone`` (the sessionize NTZ
    lesson, ROUND4.md #1). This helper stays in pure NTZ arithmetic
    (timestampdiff/timestampadd never leave naive time), matching
    DuckDB's naive ``date_trunc`` bit-for-bit under ANY session zone.

    ``col`` may be a Column or a column name (any identifier — the
    name is resolved via ``F.col``, not interpolated into SQL text,
    so backtick-worthy names and expressions both work; ADVICE r5).
    """
    if isinstance(col, str):
        col = F.col(col)
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return F.timestamp_add(unit, F.timestamp_diff(unit, epoch, col), epoch)


TICKS_ORACLE_CTE = """
WITH ticks AS (
  SELECT
    CAST(user_id AS VARCHAR)            AS token,
    CAST(ts AS TIMESTAMP)               AS ts,
    event_id                            AS sequence_number,
    "value"                             AS last_traded_price,
    "value" - (event_id % 7)            AS open_price,
    "value" + (event_id % 11)           AS high_price,
    "value" - (event_id % 13)           AS low_price,
    "value" + (event_id % 5)            AS close_price,
    CAST(event_id % 1000 AS DOUBLE)     AS volume
  FROM events
)
"""
