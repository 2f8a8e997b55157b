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
rows BEFORE touching stored state, and the store is PARTITIONED BY
DAY with per-epoch maintenance touching only the partitions whose
days appear in the epoch (VERDICT r5 #5) — a live stream touches the
current day almost exclusively, so per-epoch work is O(epoch keys),
never O(table). Untouched day partitions' files are byte-untouched
(test-pinned). Each touched partition commits via tmp+rename with its
idempotence marker INSIDE the renamed directory, so data and marker
land atomically per partition (local-FS variant; compaction.py
documents the object-store flip). A MERGE-capable table format would
replace the rename dance, not the algebra.
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


def _day_dir(table_dir: str, day) -> str:
    return os.path.join(table_dir, f"day={day.isoformat()}")


def _day_last_epoch(table_dir: str, day) -> int:
    p = os.path.join(_day_dir(table_dir, day), "_last_epoch")
    if os.path.isfile(p):
        with open(p) as f:
            return int(f.read().strip())
    return -1


def _recover_partial_swap(table_dir: str) -> None:
    """A crash between a day partition's two renames leaves it at
    ``.old`` only — restore before anything reads the table."""
    if not os.path.isdir(table_dir):
        return
    for name in os.listdir(table_dir):
        if name.endswith(".old"):
            live = os.path.join(table_dir, name[: -len(".old")])
            old = os.path.join(table_dir, name)
            if os.path.isdir(live):
                shutil.rmtree(old, ignore_errors=True)  # stale leftover
            else:
                os.rename(old, live)


def make_epoch_merger(spark: SparkSession, table_dir: str):
    """The foreachBatch merge function for :func:`maintain_daily_rollup`
    — module-level so its retry-idempotence is directly testable.

    foreachBatch is AT-LEAST-ONCE, and maintenance is PER DAY
    PARTITION: each day's aggregate state depends only on that day's
    ticks, so idempotence is tracked per partition — a ``_last_epoch``
    marker file inside each ``day=`` directory (underscore-prefixed:
    invisible to parquet readers), committed atomically with the
    partition's data by the tmp+rename swap. A retried epoch skips
    partitions already at (or past) its epoch_id and re-merges only
    the ones a mid-epoch crash left behind — exactly-once per
    partition on top of at-least-once delivery.

    The per-day rename loop is a driver-side loop over the days in the
    epoch — bounded by the trigger's wall-clock span (a live stream
    touches 1–2 days), not by data size; the merge computation itself
    is one distributed job for all touched days."""

    def merge_epoch(batch: DataFrame, epoch_id: int) -> None:
        _recover_partial_swap(table_dir)
        # persist: the days .collect() below and the tmp_root write
        # both consume the partials; without it each action re-runs
        # the frame decode + groupBy (the epoch's most expensive
        # stage) from scratch
        partials = _partials(batch).persist()
        days = sorted(
            r.day for r in partials.select("day").distinct().collect()
        )
        stale = [d for d in days if _day_last_epoch(table_dir, d) < epoch_id]
        if not stale:
            partials.unpersist()
            return  # retry of a fully-applied epoch
        update = partials.filter(F.col("day").isin(stale))
        have = [d for d in stale if os.path.isdir(_day_dir(table_dir, d))]
        if have:
            # partition-pruned read: only the touched day directories
            # are opened; day is encoded in the directory name, not the
            # files, so rebuild it per path
            parts = []
            for d in have:
                parts.append(
                    spark.read.parquet(_day_dir(table_dir, d)).withColumn(
                        "day", F.lit(d)
                    )
                )
            existing = parts[0]
            for p in parts[1:]:
                existing = existing.unionByName(p)
            update = _merge(existing.unionByName(update.select(*_PARTIAL_COLS)))
        tmp_root = table_dir + ".tmpepoch"
        shutil.rmtree(tmp_root, ignore_errors=True)
        update.repartition("day").write.mode("overwrite").partitionBy(
            "day"
        ).parquet(tmp_root)
        os.makedirs(table_dir, exist_ok=True)
        for d in stale:
            src = _day_dir(tmp_root, d)
            with open(os.path.join(src, "_last_epoch"), "w") as f:
                f.write(str(epoch_id))
            live = _day_dir(table_dir, d)
            old = live + ".old"
            shutil.rmtree(old, ignore_errors=True)
            if os.path.isdir(live):
                os.rename(live, old)
            os.rename(src, live)
            shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(tmp_root, ignore_errors=True)
        partials.unpersist()

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
    """The maintained rollup, minus the internal merge-state columns.
    Restores any partition a crash left mid-swap FIRST — a reader
    arriving before the stream restarts must see the pre-crash day,
    not a missing partition plus an unparseable ``day=....old``
    directory."""
    _recover_partial_swap(table_dir)
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
