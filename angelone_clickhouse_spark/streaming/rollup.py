"""Incrementally-maintained daily OHLCV rollup — the ClickHouse
materialized-view analogue (the reference's store would attach an MV
to its MergeTree table; SURVEY O19 runs the rollup as a periodic
batch query instead).

Each micro-batch epoch folds its ticks into a persistent per-
(token, day) aggregate table via foreachBatch: the batch reduces to
MERGEABLE partials first, then merges with the stored aggregates by
re-aggregating the union. OHLCV is mergeable once open/close carry
their defining sequence numbers: open = min_by(open, first_seq),
close = max_by(close, last_seq), high/low/volume/count are
max/min/sum — the same algebra a ClickHouse AggregatingMergeTree
applies at part-merge time.

Scale notes: the epoch reduces to |tokens|x|days-in-epoch| partial
rows BEFORE touching stored state, so merge input is bounded by key
cardinality, not tick volume; the store rewrite is per-epoch
read-union-aggregate-swap — at 100 TB you partition the store by day
and rewrite only the days present in the epoch (epochs touch the
current day almost exclusively), or land on a MERGE-capable table
format; the merge algebra is unchanged. The swap is tmp+rename
(local-FS variant; compaction.py documents the object-store flip).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from angelone_clickhouse_spark.streaming.ingest import (
    decode_tick_stream,
    read_frame_stream,
)

_PARTIAL_COLS = (
    "token",
    "day",
    "first_seq",
    "open",
    "last_seq",
    "close",
    "high",
    "low",
    "total_volume",
    "n_ticks",
)


def _partials(ticks: DataFrame) -> DataFrame:
    """Reduce ticks (or stored partials' underlying grain) to mergeable
    per-(token, day) aggregate state."""
    return (
        ticks.groupBy("token", F.to_date("ts").alias("day"))
        .agg(
            F.min("sequence_number").alias("first_seq"),
            F.min_by("open_price", "sequence_number").alias("open"),
            F.max("sequence_number").alias("last_seq"),
            F.max_by("close_price", "sequence_number").alias("close"),
            F.max("high_price").alias("high"),
            F.min("low_price").alias("low"),
            F.sum("volume").alias("total_volume"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(*_PARTIAL_COLS)
    )


def _merge(a: DataFrame) -> DataFrame:
    """Merge partial states sharing a (token, day) key — the
    AggregatingMergeTree step: associative, so any merge order yields
    the same state."""
    return (
        a.groupBy("token", "day")
        .agg(
            F.min("first_seq").alias("first_seq"),
            F.min_by("open", "first_seq").alias("open"),
            F.max("last_seq").alias("last_seq"),
            F.max_by("close", "last_seq").alias("close"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.sum("total_volume").alias("total_volume"),
            F.sum("n_ticks").alias("n_ticks"),
        )
        .select(*_PARTIAL_COLS)
    )


def make_epoch_merger(spark: SparkSession, table_dir: str):
    """The foreachBatch merge function for :func:`maintain_daily_rollup`
    — module-level so its retry-idempotence is directly testable."""

    def merge_epoch(batch: DataFrame, epoch_id: int) -> None:
        # foreachBatch is AT-LEAST-ONCE: a retried epoch must not fold
        # the same ticks into the stored partials twice. The last
        # applied epoch_id travels INSIDE the table directory (a
        # _last_epoch marker file, invisible to parquet readers), so
        # the data swap and the idempotence marker commit atomically in
        # the same rename.
        # crash between the two renames leaves the table at .old only:
        # restore it before anything reads table_dir
        if not os.path.isdir(table_dir) and os.path.isdir(table_dir + ".old"):
            os.rename(table_dir + ".old", table_dir)
        marker = os.path.join(table_dir, "_last_epoch")
        if os.path.isfile(marker):
            with open(marker) as f:
                if int(f.read().strip()) >= epoch_id:
                    return  # retry of an already-merged epoch
        update = _partials(batch)
        if os.path.isdir(table_dir):
            existing = spark.read.parquet(table_dir)
            update = _merge(existing.unionByName(update))
        tmp = table_dir + ".tmp"
        update.coalesce(1).write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_last_epoch"), "w") as f:
            f.write(str(epoch_id))
        old = table_dir + ".old"
        # a stale .old can survive a crash between the two renames —
        # clear it first or os.rename raises into a non-empty target
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(table_dir):
            os.rename(table_dir, old)
        os.rename(tmp, table_dir)
        shutil.rmtree(old, ignore_errors=True)

    return merge_epoch


def maintain_daily_rollup(
    spark: SparkSession,
    frames_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Stream frames -> decode -> incrementally fold into the rollup
    table at ``table_dir``. Returns the StreamingQuery; read the table
    with :func:`read_rollup` after (or during) the run."""
    ticks = decode_tick_stream(
        read_frame_stream(spark, frames_dir, max_files_per_trigger)
    )
    return (
        ticks.writeStream.foreachBatch(make_epoch_merger(spark, table_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(spark: SparkSession, table_dir: str) -> DataFrame:
    """The maintained rollup, minus the internal merge-state columns."""
    return spark.read.parquet(table_dir).select(
        "token",
        "day",
        "open",
        "close",
        "high",
        "low",
        "total_volume",
        "n_ticks",
    )
