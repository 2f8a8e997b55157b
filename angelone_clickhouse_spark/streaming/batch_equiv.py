"""Driver-visible (batch) entries for the streaming operators.

``minute_bars`` runs the windowed-OHLCV aggregate as a batch query over
the canonical tick table so DuckDB can oracle-check it (date_trunc is
the batch spelling of a 1-minute tumbling window). ``decode_ticks``
exercises encoder -> pandas-UDF decoder -> storage projection -> exact
dedup on a deterministic generated frame stream; no DuckDB-visible
input exists for it, so the driver records the weaker rows-only check —
the full value-level assertions live in tests/test_decoder.py and
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from angelone_clickhouse_spark.sources.decoder import decode_frames, wire_to_ticks
from angelone_clickhouse_spark.sources.frames import frames_df, generate_frames
from angelone_clickhouse_spark.sources.tables import TICKS_ORACLE_CTE, ticks


def minute_bars_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = ticks(spark, sf_dir)
    return (
        t.groupBy(
            F.date_trunc("minute", F.col("ts")).alias("bar_ts"), F.col("token")
        )
        .agg(
            F.min_by("open_price", "sequence_number").alias("open"),
            F.max("high_price").alias("high"),
            F.min("low_price").alias("low"),
            F.max_by("close_price", "sequence_number").alias("close"),
            F.round(F.sum("volume"), 2).alias("total_volume"),
            F.count(F.lit(1)).alias("tick_count"),
        )
    )


def decode_ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated wire frames (with duplicates and truncations) through
    the full decode path, aggregated per token."""
    frames = generate_frames(3000, seed=42, duplicate_every=10, corrupt_every=50)
    decoded = wire_to_ticks(decode_frames(frames_df(spark, frames)))
    deduped = decoded.dropDuplicates(["token", "sequence_number"])
    return deduped.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.round(F.sum("last_traded_price"), 2).alias("sum_ltp"),
        F.round(F.sum("volume"), 2).alias("total_volume"),
        F.max("ts").alias("last_ts"),
    )


QUERIES = {
    "minute_bars": minute_bars_batch,
    "decode_ticks": decode_ticks,
}

ORACLES = {
    "minute_bars": TICKS_ORACLE_CTE
    + """
SELECT date_trunc('minute', ts)               AS bar_ts,
       token,
       min_by(open_price, sequence_number)    AS open,
       max(high_price)                        AS high,
       min(low_price)                         AS low,
       max_by(close_price, sequence_number)   AS close,
       round(sum(volume), 2)                  AS total_volume,
       count(*)                               AS tick_count
FROM ticks
GROUP BY date_trunc('minute', ts), token
""",
}
