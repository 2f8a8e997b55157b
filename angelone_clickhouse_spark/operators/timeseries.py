"""Time-series resampling over the tick table: per-token hourly grid
with forward-filled prices — the hypertable/rollup-style operator
(TimescaleDB ``time_bucket_gapfill`` + ``locf``; ClickHouse ``WITH
FILL``) the reference's market-data domain calls for but its engine
lacks (SURVEY §2.3: the reference only ever inserts raw ticks).

Plan shape: one window pass computes the last tick and tick count per
(token, hour); per-token grid bounds are a tiny aggregate whose
``sequence()`` explode is O(grid); the gap-fill itself is a
``last(..., ignorenulls)`` running window. Everything is built-in
(JVM, codegen) and every output value is COPIED from an input row
(no float arithmetic), so the whole op is DuckDB-oracle-checkable.

Scale notes (100 TB): shuffles on token only (window partitions +
grid join); per-token state is the grid span — at cluster scale the
grid join is a range-partitioned merge per token shard, and tokens
are independent so skew salting never crosses series. The token
subset here (token % 25 == 0) mirrors a real resample request for
specific series; an all-series rollup is the same plan without the
filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from angelone_clickhouse_spark.sources.tables import TICKS_ORACLE_CTE, ticks, trunc_ntz

TOKEN_MOD = 25  # resample tokens where int(token) % TOKEN_MOD == 0


def resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token x hour grid from each token's first to last tick hour;
    ``price`` = last traded price at or before the hour's end
    (forward-filled across empty hours), ``n_ticks`` = ticks in the
    hour (0 for gap hours)."""
    t = ticks(spark, sf_dir).filter(
        F.col("token").cast("int") % TOKEN_MOD == 0
    )
    hour = trunc_ntz("HOUR", "ts")
    w_last = Window.partitionBy("token", "hour_ts").orderBy(
        F.desc("ts"), F.desc("sequence_number")
    )
    w_cnt = Window.partitionBy("token", "hour_ts")
    hourly = (
        t.select(
            "token",
            hour.alias("hour_ts"),
            "ts",
            "sequence_number",
            F.col("last_traded_price").alias("px"),
        )
        .select(
            "token",
            "hour_ts",
            "px",
            F.row_number().over(w_last).alias("rn"),
            F.count(F.lit(1)).over(w_cnt).alias("cnt"),
        )
        .filter(F.col("rn") == 1)
        .select("token", "hour_ts", "px", "cnt")
    )
    bounds = t.groupBy("token").agg(
        F.min("ts").alias("lo_ts"), F.max("ts").alias("hi_ts")
    ).select(
        "token",
        trunc_ntz("HOUR", "lo_ts").alias("lo"),
        trunc_ntz("HOUR", "hi_ts").alias("hi"),
    )
    grid = bounds.select(
        "token",
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias(
            "hour_ts"
        ),
    )
    w_fill = (
        Window.partitionBy("token")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(hourly, ["token", "hour_ts"], "left")
        .select(
            "token",
            "hour_ts",
            F.last("px", ignorenulls=True).over(w_fill).alias("price"),
            F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("n_ticks"),
        )
    )


QUERIES = {"resample_ffill": resample_ffill}

ORACLES = {
    "resample_ffill": TICKS_ORACLE_CTE
    + f""",
sel AS (
  SELECT * FROM ticks WHERE CAST(token AS INT) % {TOKEN_MOD} = 0
),
hourly AS (
  SELECT token, hour_ts, px, cnt FROM (
    SELECT token,
           date_trunc('hour', ts) AS hour_ts,
           last_traded_price      AS px,
           row_number() OVER (
             PARTITION BY token, date_trunc('hour', ts)
             ORDER BY ts DESC, sequence_number DESC
           ) AS rn,
           count(*) OVER (
             PARTITION BY token, date_trunc('hour', ts)
           ) AS cnt
    FROM sel
  ) WHERE rn = 1
),
bounds AS (
  SELECT token,
         date_trunc('hour', min(ts)) AS lo,
         date_trunc('hour', max(ts)) AS hi
  FROM sel GROUP BY token
),
grid AS (
  SELECT token, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts
  FROM bounds
)
SELECT g.token,
       g.hour_ts,
       last_value(h.px IGNORE NULLS) OVER (
         PARTITION BY g.token ORDER BY g.hour_ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS price,
       CAST(coalesce(h.cnt, 0) AS BIGINT) AS n_ticks
FROM grid g
LEFT JOIN hourly h ON h.token = g.token AND h.hour_ts = g.hour_ts
"""
}
