"""Sink maintenance: small-file compaction for the streaming tick sink.

Micro-batch appends write one file per partition per epoch; at a 5 s
trigger that is ~17k files/day/partition-column-value — the classic
streaming-sink small-file problem, and at 100 TB the thing that kills
scan throughput (footer fetches dominate). Compaction rewrites each
date partition into max(1, bytes/target) files, sorted by timestamp
within files to preserve the MergeTree-style clustering
(db/clickhouse.go:26-27 analogue) that row-group min/max skipping
relies on.

Crash safety: all intermediate state lives under ``<sink>/_staging``
— underscore-prefixed paths are invisible to Spark/Hadoop file
listing, so readers never see half-swapped data. The swap itself is
journaled: a ``date=X.commit`` marker is written (after the staged
rows are verified against the live partition) BEFORE any rename, and
:func:`recover_compaction` replays or rolls back interrupted swaps
from the journal on the next maintenance run. A reader that lists the
sink during the (two-rename) swap window of one date sees that date
missing — never duplicated or partial — and the journal guarantees
the partition reappears.

This is the local-filesystem variant (POSIX atomic renames). On an
object store you'd stage to the same hidden prefix but flip a
manifest/catalog pointer instead of renaming; the verify-then-commit
journal structure is identical.

Run it as the off-line maintenance job (the reference has no analogue —
ClickHouse merges parts server-side; this IS our merge). Compact only
CLOSED dates while ingest appends to today's partition: the rewrite
of one date never touches another.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024
_STAGING = "_staging"


def _staging_dir(sink_dir: str) -> str:
    return os.path.join(sink_dir, _STAGING)


def _partition_dates(sink_dir: str) -> list[str]:
    """Partition values from the directory layout — no Spark job, no
    full-sink scan (a distinct() over 100 TB to learn ~365 dates is
    the wrong plan; the listing IS the partition index)."""
    return sorted(
        d.split("=", 1)[1]
        for d in os.listdir(sink_dir)
        if d.startswith("date=") and os.path.isdir(os.path.join(sink_dir, d))
    )


def recover_compaction(sink_dir: str) -> list[str]:
    """Replay or roll back swaps interrupted by a crash. Returns the
    dates touched. Idempotent; call before compacting (and safe to
    call any time)."""
    stage = _staging_dir(sink_dir)
    if not os.path.isdir(stage):
        return []
    touched = []
    for name in sorted(os.listdir(stage)):
        if not name.endswith(".commit"):
            continue
        date = name[len("date=") : -len(".commit")]
        live = os.path.join(sink_dir, f"date={date}")
        tmp = os.path.join(stage, f"date={date}.tmp")
        bak = os.path.join(stage, f"date={date}.old")
        if not os.path.isdir(live):
            # crashed between the two renames: finish the swap
            if os.path.isdir(tmp):
                os.rename(tmp, live)
            elif os.path.isdir(bak):
                os.rename(bak, live)  # tmp lost -> restore original
        # live exists: swap completed (or never started) — clear debris
        for leftover in (tmp, bak):
            if os.path.isdir(leftover):
                shutil.rmtree(leftover)
        os.remove(os.path.join(stage, name))
        touched.append(date)
    return touched


def compact_tick_sink(
    spark: SparkSession,
    sink_dir: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
    dates: list[str] | None = None,
) -> dict[str, int]:
    """Rewrite each (or the given) date partition of a tick sink into
    size-targeted, timestamp-sorted files. Returns {date: n_files_after}.

    Per date: stage (hidden) -> verify row count -> journal commit ->
    swap (two renames) -> clean. A failure at any point is repaired by
    :func:`recover_compaction`; the staged data is only trusted after
    the count verification, so a torn write can never replace good
    data."""
    recover_compaction(sink_dir)
    stage = _staging_dir(sink_dir)
    os.makedirs(stage, exist_ok=True)
    part_dates = dates if dates is not None else _partition_dates(sink_dir)
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
        tmp = os.path.join(stage, f"date={d}.tmp")
        (
            part.repartition(n_files)
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        # verify BEFORE touching the live partition
        live_rows = part.count()
        staged_rows = spark.read.parquet(tmp).count()
        if staged_rows != live_rows:
            shutil.rmtree(tmp)
            raise RuntimeError(
                f"compaction verify failed for date={d}: "
                f"staged {staged_rows} != live {live_rows}"
            )
        # journal the intent, then swap; recover_compaction can finish
        # or undo this from any crash point
        commit = os.path.join(stage, f"date={d}.commit")
        with open(commit, "w") as f:
            json.dump({"date": d, "rows": staged_rows, "files": n_files}, f)
            f.flush()
            os.fsync(f.fileno())
        bak = os.path.join(stage, f"date={d}.old")
        os.rename(part_path, bak)
        os.rename(tmp, part_path)
        shutil.rmtree(bak)
        os.remove(commit)
        out[d] = n_files
    return out
