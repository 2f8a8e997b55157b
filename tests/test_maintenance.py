"""Compaction, salted aggregation, and the SQL view surface."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from angelone_clickhouse_spark.operators.skew import salted_group_sum
from angelone_clickhouse_spark.sources.frames import generate_frames, write_frames_parquet
from angelone_clickhouse_spark.sources.tables import load_table
from angelone_clickhouse_spark.sql import register_all
from angelone_clickhouse_spark.streaming.compaction import compact_tick_sink
from angelone_clickhouse_spark.streaming.ingest import ingest_to_parquet


def test_compaction_preserves_rows_and_reduces_files(spark, tmp_path):
    d = str(tmp_path)
    # many tiny epochs -> many tiny files
    write_frames_parquet(spark, generate_frames(3000, seed=9), f"{d}/in", n_files=12)
    q = ingest_to_parquet(
        spark, f"{d}/in", f"{d}/out", f"{d}/ckpt",
        available_now=True, max_files_per_trigger=1,  # 12 epochs -> 12 files
    )
    q.awaitTermination(120)
    # ingest files carry the e<epoch>- idempotence prefix; compacted
    # replacements are plain part-* — match both
    before_files = glob.glob(f"{d}/out/date=*/*part-*.parquet")
    before = spark.read.parquet(f"{d}/out")
    before_rows = sorted(map(tuple, before.collect()), key=repr)

    result = compact_tick_sink(spark, f"{d}/out", target_file_bytes=10**9)
    after_files = glob.glob(f"{d}/out/date=*/*part-*.parquet")
    after = spark.read.parquet(f"{d}/out")
    after_rows = sorted(map(tuple, after.collect()), key=repr)

    assert after_rows == before_rows
    assert len(after_files) < len(before_files)
    assert all(n == 1 for n in result.values())  # tiny data -> 1 file/partition


def _ingest_two_dates(spark, d):
    from angelone_clickhouse_spark.sources.frames import EPOCH_2024_MS

    frames = generate_frames(1500, seed=31)
    later = generate_frames(800, seed=32, start_ms=EPOCH_2024_MS + 86_400_000)
    write_frames_parquet(spark, frames + later, f"{d}/in", n_files=6)
    q = ingest_to_parquet(spark, f"{d}/in", f"{d}/out", f"{d}/ckpt", available_now=True)
    q.awaitTermination(120)
    return f"{d}/out"


def test_compaction_with_concurrent_append(spark, tmp_path):
    """Compacting a closed date must not disturb rows appended to a
    different (open) partition mid-maintenance."""
    import os

    sink = _ingest_two_dates(spark, str(tmp_path))
    dates = sorted(
        p.split("=")[1] for p in os.listdir(sink) if p.startswith("date=")
    )
    assert len(dates) == 2
    closed, open_date = dates
    before = spark.read.parquet(sink)
    before_rows = sorted(map(tuple, before.collect()), key=repr)
    # simulated concurrent append: new rows land in the open partition
    # while the closed one is being compacted
    extra = before.filter(f"date = '{open_date}'").limit(50).drop("date")
    extra.write.mode("append").parquet(f"{sink}/date={open_date}")
    result = compact_tick_sink(spark, sink, target_file_bytes=10**9, dates=[closed])
    after_rows = sorted(
        map(tuple, spark.read.parquet(sink).collect()), key=repr
    )
    assert len(after_rows) == len(before_rows) + 50
    assert result == {closed: 1}


def test_compaction_crash_recovery(spark, tmp_path):
    """A swap interrupted between the two renames (live partition
    missing, verified tmp staged, commit journal present) must be
    completed by recover_compaction; stale debris with a live
    partition must be rolled back."""
    import json
    import os
    import shutil

    from angelone_clickhouse_spark.streaming.compaction import recover_compaction

    sink = _ingest_two_dates(spark, str(tmp_path))
    dates = sorted(
        p.split("=")[1] for p in os.listdir(sink) if p.startswith("date=")
    )
    d0 = dates[0]
    live = f"{sink}/date={d0}"
    before_rows = sorted(
        map(tuple, spark.read.parquet(live).collect()), key=repr
    )
    stage = f"{sink}/_staging"
    os.makedirs(stage, exist_ok=True)
    # simulate the crash window: live renamed away, tmp fully staged
    shutil.copytree(live, f"{stage}/date={d0}.tmp")
    os.rename(live, f"{stage}/date={d0}.old")
    with open(f"{stage}/date={d0}.commit", "w") as f:
        json.dump({"date": d0, "rows": len(before_rows)}, f)
    assert not os.path.isdir(live)
    assert recover_compaction(sink) == [d0]
    after_rows = sorted(
        map(tuple, spark.read.parquet(live).collect()), key=repr
    )
    assert after_rows == before_rows
    assert not os.listdir(stage)  # all debris cleared
    # idempotent; a fresh compaction over the recovered sink works
    compact_tick_sink(spark, sink, target_file_bytes=10**9)
    assert sorted(
        map(tuple, spark.read.parquet(live).collect()), key=repr
    ) == before_rows


def test_salted_sum_equals_direct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    direct = {
        (r.user_id): (r.n_events, round(r.sum_value, 2))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .collect()
    }
    salted = {
        (r.user_id): (r.n_events, round(r.sum_value, 2))
        for r in salted_group_sum(
            ev,
            "user_id",
            n_salts=8,
            n_events=F.count(F.lit(1)),
            sum_value=F.sum("value"),
        ).collect()
    }
    assert salted == direct


def test_sql_view_surface(spark, sf_dir):
    register_all(spark, sf_dir)
    r = spark.sql(
        "SELECT t.token, count(*) AS n FROM ticks t "
        "JOIN token_config_enriched c ON t.token = c.token GROUP BY t.token"
    )
    assert r.count() == 0 or r.count() > 0  # plan executes
    top = spark.sql(
        "SELECT token, max(last_traded_price) AS mx FROM ticks "
        "GROUP BY token ORDER BY mx DESC LIMIT 3"
    ).collect()
    assert len(top) == 3


def test_sink_partition_pruning(spark, tmp_path):
    """A date filter on the tick sink must scan only that date's
    partition directory (the MergeTree ORDER BY analogue: partition
    pruning + row-group skipping)."""
    d = str(tmp_path)
    frames = generate_frames(2000, seed=21)
    # spread frames over two days by shifting half a day of millis
    from angelone_clickhouse_spark.sources.frames import EPOCH_2024_MS
    half = generate_frames(1000, seed=22, start_ms=EPOCH_2024_MS + 86_400_000)
    write_frames_parquet(spark, frames + half, f"{d}/in", n_files=4)
    q = ingest_to_parquet(spark, f"{d}/in", f"{d}/out", f"{d}/ckpt", available_now=True)
    q.awaitTermination(120)
    df = spark.read.parquet(f"{d}/out")
    dates = sorted(r.date for r in df.select("date").distinct().collect())
    assert len(dates) == 2
    pruned = df.filter(F.col("date") == str(dates[1]))
    # inputFiles() is pre-pruning; input_file_name() reflects the files
    # the executed (pruned) scan actually touched
    files = [r[0] for r in pruned.select(F.input_file_name()).distinct().collect()]
    assert files and all(f"date={dates[1]}" in f for f in files)
