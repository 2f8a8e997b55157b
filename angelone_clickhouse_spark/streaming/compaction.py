"""Sink maintenance: small-file compaction for the streaming tick sink.

Micro-batch appends write one file per partition per epoch; at a 5 s
trigger that is ~17k files/day/partition-column-value — the classic
streaming-sink small-file problem, and at 100 TB the thing that kills
scan throughput (footer fetches dominate). Compaction rewrites each
date partition into max(1, bytes/target) files, sorted by timestamp
within files to preserve the MergeTree-style clustering
(db/clickhouse.go:26-27 analogue) that row-group min/max skipping
relies on.

Run it as the off-line maintenance job (the reference has no analogue —
ClickHouse merges parts server-side; this IS our merge)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 * 1024 * 1024


def compact_tick_sink(
    spark: SparkSession,
    sink_dir: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
    dates: list[str] | None = None,
) -> dict[str, int]:
    """Rewrite each (or the given) date partition of a tick sink into
    size-targeted, timestamp-sorted files. Returns {date: n_files_after}.

    Partition-at-a-time: the rewrite of one date never touches another,
    so it can run while ingest appends to *today's* partition (compact
    only closed dates in production)."""
    df = spark.read.parquet(sink_dir)
    part_dates = (
        dates
        if dates is not None
        else [str(r.date) for r in df.select("date").distinct().collect()]
    )
    out: dict[str, int] = {}
    for d in part_dates:
        part_path = os.path.join(sink_dir, f"date={d}")
        part = spark.read.parquet(part_path)
        total_bytes = sum(
            os.path.getsize(os.path.join(part_path, f))
            for f in os.listdir(part_path)
            if f.endswith(".parquet")
        )
        n_files = max(1, round(total_bytes / target_file_bytes))
        tmp = part_path + ".compact.tmp"
        (
            part.repartition(n_files)
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        # atomic-ish swap (rename) — on object stores use a manifest
        # commit instead
        bak = part_path + ".old"
        os.rename(part_path, bak)
        os.rename(tmp, part_path)
        import shutil

        shutil.rmtree(bak)
        out[d] = n_files
    return out
