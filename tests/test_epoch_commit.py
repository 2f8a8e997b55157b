"""Direct unit tests of the shared epoch committer
(streaming/epoch_commit.py) — the at-least-once contract tested on
the module itself, not just through the docdedup/novelty/ingest
pipelines that import it."""

from __future__ import annotations

import os

from angelone_clickhouse_spark.streaming.epoch_commit import (
    commit_epoch_flat,
    commit_epoch_partitioned,
    epoch_prefix,
    sweep_prefix,
    sweep_prefix_partitioned,
)


def _flat_rows(spark, d):
    return sorted(
        r.x for r in spark.read.schema("x long").parquet(d).collect()
    )


def test_flat_commit_retry_replaces_not_appends(spark, tmp_path):
    out = str(tmp_path / "ds")
    df0 = spark.createDataFrame([(1,), (2,)], "x long")
    commit_epoch_flat(df0, out, 0)
    assert _flat_rows(spark, out) == [1, 2]
    # the retry recomputes (possibly different content) — it must
    # REPLACE epoch 0's files, never append beside them
    df0b = spark.createDataFrame([(1,), (2,), (3,)], "x long")
    commit_epoch_flat(df0b, out, 0)
    assert _flat_rows(spark, out) == [1, 2, 3]
    # a second epoch coexists under its own prefix
    commit_epoch_flat(spark.createDataFrame([(9,)], "x long"), out, 1)
    assert _flat_rows(spark, out) == [1, 2, 3, 9]
    names = os.listdir(out)
    assert sum(n.startswith(epoch_prefix(0)) for n in names) == 1
    assert sum(n.startswith(epoch_prefix(1)) for n in names) == 1


def test_flat_sweep_only_touches_its_epoch(spark, tmp_path):
    out = str(tmp_path / "ds")
    commit_epoch_flat(spark.createDataFrame([(1,)], "x long"), out, 0)
    commit_epoch_flat(spark.createDataFrame([(2,)], "x long"), out, 1)
    # e1- must not be swept by the e10- prefix or by e0's retry
    sweep_prefix(out, epoch_prefix(10))
    sweep_prefix(out, epoch_prefix(0))
    assert _flat_rows(spark, out) == [2]
    # sweeping a dataset dir that does not exist is a no-op
    sweep_prefix(str(tmp_path / "missing"), epoch_prefix(0))


def _stage_partitioned(spark, staging, rows):
    (
        spark.createDataFrame(rows, "x long, date string")
        .write.mode("overwrite")
        .partitionBy("date")
        .parquet(staging)
    )


def test_partitioned_commit_retry_replaces_per_partition(spark, tmp_path):
    out = str(tmp_path / "ds")
    stage = str(tmp_path / "stage0")
    _stage_partitioned(
        spark, stage, [(1, "2024-01-01"), (2, "2024-01-02")]
    )
    commit_epoch_partitioned(stage, out, 0)
    got = sorted(
        (r.x, r.date)
        for r in spark.read.schema("x long, date string").parquet(out).collect()
    )
    assert got == [(1, "2024-01-01"), (2, "2024-01-02")]
    # retry of epoch 0 lands in ONE partition only this time: its
    # files in BOTH partitions must be swept (the crashed attempt's
    # 01-02 file disappears), epoch 1's survive
    stage1 = str(tmp_path / "stage1")
    _stage_partitioned(spark, stage1, [(9, "2024-01-02")])
    commit_epoch_partitioned(stage1, out, 1)
    stage0b = str(tmp_path / "stage0b")
    _stage_partitioned(spark, stage0b, [(5, "2024-01-01")])
    commit_epoch_partitioned(stage0b, out, 0)
    got = sorted(
        (r.x, r.date)
        for r in spark.read.schema("x long, date string").parquet(out).collect()
    )
    assert got == [(5, "2024-01-01"), (9, "2024-01-02")]


def test_partitioned_sweep_ignores_foreign_dirs(spark, tmp_path):
    out = str(tmp_path / "ds")
    stage = str(tmp_path / "stage")
    _stage_partitioned(spark, stage, [(1, "2024-01-01")])
    commit_epoch_partitioned(stage, out, 0)
    # a non-partition directory (e.g. _spark_metadata) is untouched
    foreign = os.path.join(out, "_meta")
    os.makedirs(foreign)
    with open(os.path.join(foreign, "e0-marker"), "w") as f:
        f.write("keep")
    sweep_prefix_partitioned(out, epoch_prefix(0))
    assert os.path.exists(os.path.join(foreign, "e0-marker"))
    # while the real partition file IS swept
    day = os.path.join(out, "date=2024-01-01")
    assert not any(n.startswith("e0-") for n in os.listdir(day))
