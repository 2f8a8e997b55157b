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
    must not double-fold its ticks into the stored partials; a stale
    .old directory must not break the rename swap."""
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
    # retries of already-applied epochs: no double-merge
    merge(batch1, 1)
    merge(batch0, 0)
    got = sorted(map(tuple, read_rollup(spark, table_dir).collect()))
    assert got == want
    # a stale .old from a crash between renames must not wedge the swap
    shutil.copytree(table_dir, table_dir + ".old")
    merge(batch0, 2)  # new epoch folds in (double-count is INTENDED here)
    assert os.path.isdir(table_dir)
    assert not os.path.isdir(table_dir + ".old")
    with open(os.path.join(table_dir, "_last_epoch")) as f:
        assert f.read() == "2"
