"""The reference's declared analytical query surface (SURVEY.md §2.2).

Q1-Q3 are the queries the reference runs programmatically
(db/clickhouse.go:122-152, :155-187, :190-221); Q4-Q7 are the queries
its README documents (README.md:219-256, :135); Q8 is the TokenStats
aggregate its models declare (models/stats.go:5-13). Each function is
an idiomatic Spark DataFrame plan over the canonical tick table
(sources/tables.py); ``ORACLES`` holds the ANSI-SQL equivalent DuckDB
runs for the hash-differential gate.

Determinism rules (so Spark and DuckDB hash-match):
- every ORDER BY ... LIMIT k has a unique tiebreak key
  (``sequence_number``);
- ``first_value/last_value`` (ClickHouse semantics rely on MergeTree
  read order — reference db/clickhouse.go:26-27) are pinned to
  ``min_by/max_by`` on the unique sequence_number in BOTH engines;
- float aggregates (sum/avg) are rounded identically on both sides;
  min/max/min_by of exact inputs need no rounding;
- "today()/now()-relative" windows (README.md:241, :254) are anchored
  to max(ts) of the data, not wall-clock, so runs are reproducible.

Scale notes: Q1/Q4's global sort+limit plans as TakeOrderedAndProject
(top-k per partition then k-merge on the driver — no full sort). Q2-Q8
are single-shuffle partial+final hash aggregates. The max(ts) anchor is
a 1-row aggregate broadcast to the filter — no second pass over data
collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from angelone_clickhouse_spark.functions.exact import avg_fixed
from angelone_clickhouse_spark.sources.tables import TICKS_ORACLE_CTE, ticks

# Reference hard-codes token "2885" (main.go:254) and token lists
# (config/tokens.json); our synthetic universe is stringified user_ids.
Q1_TOKEN = "7"
Q7_TOKEN = "3"
TOKEN_SET = ("3", "7", "11")

TICK_COLS = [
    "token",
    "ts",
    "sequence_number",
    "last_traded_price",
    "open_price",
    "high_price",
    "low_price",
    "close_price",
    "volume",
]


def _max_ts_bound(t: DataFrame, days: int) -> DataFrame:
    """1-row (broadcast) relation holding max(ts) - INTERVAL n DAY."""
    return t.agg(
        (F.max("ts") - F.expr(f"INTERVAL {days} DAY")).alias("ts_bound")
    )


# --- Q1: latest tick for one token (db/clickhouse.go:122-152) ---------------
def q1_latest_tick(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = ticks(spark, sf_dir, tokens=(Q1_TOKEN,))
    return (
        t.filter(F.col("token") == Q1_TOKEN)
        .orderBy(F.desc("ts"), F.desc("sequence_number"))
        .limit(1)
        .select(*TICK_COLS)
    )


# --- Q2: daily stats per token (db/clickhouse.go:155-187) -------------------
def q2_daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = ticks(spark, sf_dir, tokens=(Q1_TOKEN,))
    return (
        t.filter(F.col("token") == Q1_TOKEN)
        .groupBy(F.col("token"), F.to_date("ts").alias("date"))
        .agg(
            F.min("low_price").alias("min_low"),
            F.max("high_price").alias("max_high"),
            F.round(F.sum("volume"), 2).alias("total_volume"),
            F.count(F.lit(1)).alias("tick_count"),
        )
        .orderBy(F.desc("date"))
        .limit(1)
    )


# --- Q3: multi-token recency check (db/clickhouse.go:190-221) ---------------
def q3_recency_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = ticks(spark, sf_dir, tokens=TOKEN_SET)
    return (
        t.filter(F.col("token").isin(*TOKEN_SET))
        .groupBy("token")
        .agg(
            F.max("ts").alias("last_tick_ts"),
            F.count(F.lit(1)).alias("tick_count"),
        )
    )


# --- Q4: latest N prices for a token set (README.md:219-227) ----------------
def q4_latest_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = ticks(spark, sf_dir, tokens=TOKEN_SET)
    return (
        t.filter(F.col("token").isin(*TOKEN_SET))
        .orderBy(F.desc("ts"), F.desc("sequence_number"))
        .limit(10)
        .select("token", "last_traded_price", "ts")
    )


# --- Q5: daily OHLCV over the trailing 7 days (README.md:231-243) -----------
def q5_daily_ohlcv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query: filter + date derivation + 5 aggregates including
    first/last-value semantics (pinned to min_by/max_by, SURVEY.md §7)."""
    t = ticks(spark, sf_dir)
    bound = _max_ts_bound(t, 7)
    return (
        t.crossJoin(F.broadcast(bound))
        .filter(F.col("ts") >= F.col("ts_bound"))
        .groupBy(F.col("token"), F.to_date("ts").alias("date"))
        .agg(
            F.min_by("open_price", "sequence_number").alias("open"),
            F.max("high_price").alias("high"),
            F.min("low_price").alias("low"),
            F.max_by("close_price", "sequence_number").alias("close"),
            F.round(F.sum("volume"), 2).alias("total_volume"),
            F.count(F.lit(1)).alias("tick_count"),
        )
    )


# --- Q6: volume profile over the trailing day (README.md:247-256) -----------
def q6_volume_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = ticks(spark, sf_dir)
    bound = _max_ts_bound(t, 1)
    return (
        t.crossJoin(F.broadcast(bound))
        .filter(F.col("ts") >= F.col("ts_bound"))
        .groupBy(
            F.col("token"),
            F.round("last_traded_price", 2).alias("price_level"),
        )
        .agg(
            F.count(F.lit(1)).alias("trades"),
            F.round(F.sum("volume"), 2).alias("total_volume"),
        )
    )


# --- Q7: select-star sample (README.md:135) ---------------------------------
def q7_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = ticks(spark, sf_dir, tokens=(Q7_TOKEN,))
    return (
        t.filter(F.col("token") == Q7_TOKEN)
        .orderBy("sequence_number")
        .limit(5)
        .select(*TICK_COLS)
    )


# --- Q8: per-token stats (models/stats.go:5-13) -----------------------------
def q8_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = ticks(spark, sf_dir)
    return t.groupBy("token").agg(
        F.count(F.lit(1)).alias("tick_count"),
        F.min("last_traded_price").alias("min_price"),
        F.max("last_traded_price").alias("max_price"),
        avg_fixed("last_traded_price", "avg_price"),
        F.round(F.sum("volume"), 2).alias("total_volume"),
        F.max("ts").alias("last_tick"),
    )


QUERIES = {
    "q1_latest_tick": q1_latest_tick,
    "q2_daily_stats": q2_daily_stats,
    "q3_recency_check": q3_recency_check,
    "q4_latest_prices": q4_latest_prices,
    "q5_daily_ohlcv": q5_daily_ohlcv,
    "q6_volume_profile": q6_volume_profile,
    "q7_sample": q7_sample,
    "q8_token_stats": q8_token_stats,
}

_T = TICKS_ORACLE_CTE

ORACLES = {
    "q1_latest_tick": _T
    + f"""
SELECT token, ts, sequence_number, last_traded_price, open_price,
       high_price, low_price, close_price, volume
FROM ticks
WHERE token = '{Q1_TOKEN}'
ORDER BY ts DESC, sequence_number DESC
LIMIT 1
""",
    "q2_daily_stats": _T
    + f"""
SELECT token,
       CAST(ts AS DATE)                  AS date,
       min(low_price)                    AS min_low,
       max(high_price)                   AS max_high,
       round(sum(volume), 2)             AS total_volume,
       count(*)                          AS tick_count
FROM ticks
WHERE token = '{Q1_TOKEN}'
GROUP BY token, CAST(ts AS DATE)
ORDER BY date DESC
LIMIT 1
""",
    "q3_recency_check": _T
    + f"""
SELECT token, max(ts) AS last_tick_ts, count(*) AS tick_count
FROM ticks
WHERE token IN {TOKEN_SET!r}
GROUP BY token
""",
    "q4_latest_prices": _T
    + f"""
SELECT token, last_traded_price, ts
FROM (
  SELECT * FROM ticks
  WHERE token IN {TOKEN_SET!r}
  ORDER BY ts DESC, sequence_number DESC
  LIMIT 10
) latest
""",
    "q5_daily_ohlcv": _T
    + """
SELECT token,
       CAST(ts AS DATE)                        AS date,
       min_by(open_price, sequence_number)     AS open,
       max(high_price)                         AS high,
       min(low_price)                          AS low,
       max_by(close_price, sequence_number)    AS close,
       round(sum(volume), 2)                   AS total_volume,
       count(*)                                AS tick_count
FROM ticks
WHERE ts >= (SELECT max(ts) - INTERVAL 7 DAY FROM ticks)
GROUP BY token, CAST(ts AS DATE)
""",
    "q6_volume_profile": _T
    + """
SELECT token,
       round(last_traded_price, 2)  AS price_level,
       count(*)                     AS trades,
       round(sum(volume), 2)        AS total_volume
FROM ticks
WHERE ts >= (SELECT max(ts) - INTERVAL 1 DAY FROM ticks)
GROUP BY token, round(last_traded_price, 2)
""",
    "q7_sample": _T
    + f"""
SELECT token, ts, sequence_number, last_traded_price, open_price,
       high_price, low_price, close_price, volume
FROM ticks
WHERE token = '{Q7_TOKEN}'
ORDER BY sequence_number
LIMIT 5
""",
    "q8_token_stats": _T
    + """
SELECT token,
       count(*)                             AS tick_count,
       min(last_traded_price)               AS min_price,
       max(last_traded_price)               AS max_price,
       CAST((sum(CAST(round((last_traded_price) * 100) AS BIGINT)) + count(*) // 2) // count(*) AS DOUBLE) / 100 AS avg_price,
       round(sum(volume), 2)                AS total_volume,
       max(ts)                              AS last_tick
FROM ticks
GROUP BY token
""",
}
