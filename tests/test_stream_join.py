"""Stream-stream interval join: the streaming plan must produce the
same pairs as the batch twin over an availableNow replay.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from angelone_clickhouse_spark.sources.decoder import decode_frames
from angelone_clickhouse_spark.sources.frames import frames_df, generate_frames
from angelone_clickhouse_spark.streaming.ingest import read_frame_stream
from angelone_clickhouse_spark.streaming.stream_join import (
    interval_join,
    tick_interval_join_stream,
    tick_sides,
)


@pytest.fixture(scope="module")
def frames():
    return generate_frames(800, seed=7, duplicate_every=9)


@pytest.fixture(scope="module")
def frames_dir(spark, frames, tmp_path_factory):
    d = tmp_path_factory.mktemp("sj_frames")
    frames_df(spark, frames).write.mode("overwrite").parquet(str(d))
    return str(d)


def test_stream_join_equals_batch(spark, frames, frames_dir):
    stream = read_frame_stream(spark, frames_dir)
    q = (
        tick_interval_join_stream(stream)
        .writeStream.format("memory")
        .queryName("sj_pairs")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("sj_pairs")
        .groupBy(F.col("l_token").alias("token"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.abs(F.col("lite_paise") - F.col("full_paise"))).alias(
                "sum_abs_spread_paise"
            ),
        )
        .collect()
    )
    lite, full = tick_sides(decode_frames(frames_df(spark, frames)))
    want = interval_join(lite, full).collect()
    as_map = lambda rows: {
        r.token: (r.n_pairs, r.sum_abs_spread_paise) for r in rows
    }
    assert as_map(got) == as_map(want)
    assert got, "join must produce pairs on the mixed-mode fixture"


def test_interval_bound_respected(spark, frames):
    lite, full = tick_sides(decode_frames(frames_df(spark, frames)))
    pairs = lite.join(
        full,
        (F.col("l_token") == F.col("f_token"))
        & (F.col("full_ts") <= F.col("lite_ts"))
        & (F.col("full_ts") >= F.col("lite_ts") - F.expr("INTERVAL 300 SECOND")),
    ).select(
        (F.col("lite_ts").cast("long") - F.col("full_ts").cast("long")).alias(
            "gap_s"
        )
    )
    stats = pairs.agg(
        F.min("gap_s").alias("lo"), F.max("gap_s").alias("hi")
    ).collect()[0]
    assert stats.lo >= 0 and stats.hi <= 300


def test_stream_static_enrichment_equals_batch(spark, frames, frames_dir):
    """Stream-static broadcast join: the decoded tick stream enriched
    with the static token-config dimension (the reference's O10/O11
    startup lookup, applied continuously). availableNow replay must
    equal the batch twin exactly."""
    from angelone_clickhouse_spark.sources.token_config import (
        enriched_token_config,
    )
    from angelone_clickhouse_spark.streaming.ingest import decode_tick_stream

    cfg = F.broadcast(enriched_token_config(spark))
    stream = decode_tick_stream(read_frame_stream(spark, frames_dir))
    q = (
        stream.join(cfg, "token")
        .writeStream.format("memory")
        .queryName("ss_enriched")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("ss_enriched")
        .groupBy("symbol", "exchange")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("sequence_number").alias("s"))
        .collect()
    )
    batch = decode_tick_stream(frames_df(spark, frames))
    want = (
        batch.join(cfg, "token")
        .groupBy("symbol", "exchange")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("sequence_number").alias("s"))
        .collect()
    )
    key = lambda rows: {(r.symbol, r.exchange): (r.n, r.s) for r in rows}
    assert key(got) == key(want)
    assert got, "config universe should intersect the generated tokens"
