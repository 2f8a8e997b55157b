"""Bounded-queue load shedding (reference O13, main.go:324-330).

The reference silently drops ticks when its channel is full; the
engine's restatement keeps the drop DETERMINISTIC and ACCOUNTED:
shed_overflow flags overflow rows per event-time interval, and
ingest_with_load_shedding caps each micro-batch epoch, logging
arrived/kept/dropped per epoch. These tests pin the accounting
invariants; value parity is driver-checked via ingest_load_shed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from angelone_clickhouse_spark.sources.frames import generate_frames, write_frames_parquet
from angelone_clickhouse_spark.sources.tables import ticks
from angelone_clickhouse_spark.streaming.ingest import (
    ingest_with_load_shedding,
    shed_overflow,
)

CAP = 3


def test_shed_overflow_accounting(spark, sf_dir):
    t = ticks(spark, sf_dir)
    shed = shed_overflow(t, CAP, "hour")
    per_hour = (
        shed.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("arrived"),
            F.sum((~F.col("is_shed")).cast("long")).alias("kept"),
            F.sum(F.col("is_shed").cast("long")).alias("dropped"),
        )
        .collect()
    )
    assert len(per_hour) > 0
    assert any(r.dropped > 0 for r in per_hour), "cap must actually shed"
    for r in per_hour:
        assert r.arrived == r.kept + r.dropped
        assert r.kept <= CAP
        # a shed row implies the interval was saturated
        if r.dropped > 0:
            assert r.kept == CAP
    # total row count is preserved (flagging, not filtering)
    assert shed.count() == t.count()


def test_shed_overflow_keeps_lowest_arrival_order(spark, sf_dir):
    """Kept set per interval == the cap-first rows in (sequence_number,
    token) order — the deterministic spelling of 'first arrivals win'."""
    t = ticks(spark, sf_dir)
    shed = shed_overflow(t, CAP, "hour")
    rows = shed.select(
        F.date_trunc("hour", "ts").alias("h"),
        "sequence_number",
        "token",
        "is_shed",
    ).collect()
    by_hour: dict = {}
    for r in rows:
        by_hour.setdefault(r.h, []).append(r)
    for h, grp in by_hour.items():
        grp.sort(key=lambda r: (r.sequence_number, r.token))
        for i, r in enumerate(grp):
            assert r.is_shed == (i >= CAP), (h, i, r)


def test_cap_in_event_order_matches_global_sort(spark, sf_dir):
    """cap_in_event_order == 'first cap rows in global (ts, seq, token)
    order' for caps that land inside an interval, exactly on an
    interval boundary, at 0, and past the total."""
    from pyspark.sql.window import Window

    from angelone_clickhouse_spark.streaming.ingest import cap_in_event_order

    t = ticks(spark, sf_dir)
    total = t.count()
    rows = t.select("ts", "sequence_number", "token").collect()
    rows.sort(key=lambda r: (r.ts, r.sequence_number, r.token))
    # an exact interval-boundary cap: cumulative count of the first hour
    first_hour = rows[0].ts.replace(minute=0, second=0, microsecond=0)
    hour_n = sum(
        1
        for r in rows
        if r.ts.replace(minute=0, second=0, microsecond=0) == first_hour
    )
    for cap in (0, 7, hour_n, hour_n + 3, total, total + 50):
        kept = cap_in_event_order(t, cap, "hour")
        got = kept.select("ts", "sequence_number", "token").collect()
        got.sort(key=lambda r: (r.ts, r.sequence_number, r.token))
        want = rows[:cap]
        assert [(r.ts, r.sequence_number, r.token) for r in got] == [
            (r.ts, r.sequence_number, r.token) for r in want
        ], f"cap={cap}"


def test_cap_in_event_order_row_sort_is_partitioned(spark, sf_dir):
    """The only row_number window in the plan must be partitioned by
    the interval key — the whole point of the rewrite is that row data
    never funnels through an unpartitioned (SinglePartition) sort.
    The count-preaggregate's running-total window IS global, but it
    sees one row per interval, not the data."""
    from angelone_clickhouse_spark.streaming.ingest import cap_in_event_order

    t = ticks(spark, sf_dir)
    plan = (
        cap_in_event_order(t, 100, "hour")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "row_number()" in line:
            # windowspecdefinition(partition_cols..., order...) — an
            # unpartitioned spec starts the arg list with the order col
            assert "windowspecdefinition(_iv" in line, line


def test_streaming_ingest_load_shedding(spark, tmp_path):
    frames_dir = str(tmp_path / "frames")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    n = 400
    write_frames_parquet(spark, generate_frames(n, seed=7), frames_dir, n_files=4)

    capacity = 60  # < rows per epoch, so every epoch sheds
    q, drop_log = ingest_with_load_shedding(
        spark, frames_dir, out_dir, ckpt, capacity, max_files_per_trigger=1
    )
    q.awaitTermination(180)

    assert len(drop_log) >= 2, "maxFilesPerTrigger=1 over 4 files -> epochs"
    total_arrived = sum(e["arrived"] for e in drop_log)
    total_kept = sum(e["kept"] for e in drop_log)
    total_dropped = sum(e["dropped"] for e in drop_log)
    assert total_arrived == total_kept + total_dropped
    assert total_dropped > 0
    for e in drop_log:
        assert e["kept"] <= capacity
        assert e["dropped"] == e["arrived"] - e["kept"]

    sink_rows = spark.read.parquet(out_dir).count()
    assert sink_rows == total_kept
