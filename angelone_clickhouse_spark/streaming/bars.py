"""Tumbling 1-minute OHLCV bars — the stateful streaming aggregate.

The reference logs ad-hoc minute-bar lines from its worker loop
(main.go:120-130) and otherwise recomputes daily stats by querying the
sink (SURVEY §3.3); it has no stream-state operator at all. The engine
makes bars a first-class windowed aggregate with a watermark for late
frames (SURVEY §2.3 improvement, flagged).

open/close use min/max over (sequence_number, price) structs — the
streaming-safe, deterministic equivalent of min_by/max_by (struct
ordering compares sequence_number first; it is unique per token).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hopping_bars(
    ticks: DataFrame, watermark: str | None = "10 minutes"
) -> DataFrame:
    """Sliding (hopping) 2-minute bars advancing every minute — the
    overlapping-window variant of :func:`minute_bars` (each tick lands
    in length/slide = 2 windows; Spark expands the assignment before
    the partial aggregate, so state stays per-(window, token)).

    Like ``minute_bars`` the identical plan runs on the batch replay —
    the stream==batch pytest is the determinism oracle; the batch-side
    sliding semantics themselves are DuckDB-oracled via
    ``event_sliding_windows`` (operators/sessionize.py).
    """
    src = ticks
    if src.isStreaming and watermark is not None:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(
            F.window("ts", "2 minutes", "1 minute").alias("bar"),
            F.col("token"),
        )
        .agg(
            F.max("high_price").alias("high"),
            F.min("low_price").alias("low"),
            F.sum("volume").alias("total_volume"),
            F.count(F.lit(1)).alias("tick_count"),
        )
        .select(
            F.col("bar.start").alias("bar_ts"),
            "token",
            "high",
            "low",
            "total_volume",
            "tick_count",
        )
    )


def minute_bars(ticks: DataFrame, watermark: str | None = "10 minutes") -> DataFrame:
    """Works on both a streaming and a batch tick DataFrame: the batch
    run of the same plan is the replay-determinism oracle. Pass
    ``watermark=None`` when the upstream stream already carries one
    (Spark disallows redefining it)."""
    src = ticks
    if src.isStreaming and watermark is not None:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", "1 minute").alias("bar"), F.col("token"))
        .agg(
            F.min(F.struct("sequence_number", "open_price"))[
                "open_price"
            ].alias("open"),
            F.max("high_price").alias("high"),
            F.min("low_price").alias("low"),
            F.max(F.struct("sequence_number", "close_price"))[
                "close_price"
            ].alias("close"),
            F.sum("volume").alias("total_volume"),
            F.count(F.lit(1)).alias("tick_count"),
        )
        .select(
            F.col("bar.start").alias("bar_ts"),
            "token",
            "open",
            "high",
            "low",
            "close",
            "total_volume",
            "tick_count",
        )
    )
