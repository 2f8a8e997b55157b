"""Streaming semantics tests per SURVEY §5.2(3): deterministic replay
(availableNow) of a generated frame file; stream result must equal the
batch computation on the same data."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from angelone_clickhouse_spark.sources.decoder import decode_frames, wire_to_ticks
from angelone_clickhouse_spark.sources.frames import (
    frames_df,
    generate_frames,
    write_frames_parquet,
)
from angelone_clickhouse_spark.streaming.bars import hopping_bars, minute_bars
from angelone_clickhouse_spark.streaming.ingest import (
    corrupt_frame_count,
    decode_tick_stream,
    ingest_to_parquet,
)


@pytest.fixture(scope="module")
def frames():
    return generate_frames(2000, seed=42, duplicate_every=10, corrupt_every=100)


@pytest.fixture(scope="module")
def frames_dir(spark, frames, tmp_path_factory):
    d = tmp_path_factory.mktemp("frames")
    write_frames_parquet(spark, frames, str(d / "in"), n_files=4)
    return str(d / "in")


def _batch_ticks(spark, frames):
    return wire_to_ticks(decode_frames(frames_df(spark, frames))).dropDuplicates(
        ["token", "sequence_number"]
    )


def test_ingest_stream_equals_batch(spark, frames, frames_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = ingest_to_parquet(spark, frames_dir, out, ckpt, available_now=True)
    q.awaitTermination(120)

    got = spark.read.parquet(out).drop("date")
    expected = _batch_ticks(spark, frames)
    assert got.count() == expected.count()
    cols = sorted(got.columns)
    assert cols == sorted(expected.columns)
    sg = sorted(map(tuple, got.select(*cols).collect()), key=repr)
    se = sorted(map(tuple, expected.select(*cols).collect()), key=repr)
    assert sg == se
    # duplicates dropped: sequence numbers unique per token
    n_keys = got.select("token", "sequence_number").distinct().count()
    assert n_keys == got.count()
    # sink is date-partitioned
    files = spark.read.parquet(out).inputFiles()
    assert any("date=" in f for f in files)


def test_ingest_is_idempotent_on_restart(spark, frames_dir, tmp_path):
    """Re-running with the same checkpoint must not duplicate output."""
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    q = ingest_to_parquet(spark, frames_dir, out, ckpt, available_now=True)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    q2 = ingest_to_parquet(spark, frames_dir, out, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n1


def test_epoch_appender_retry_is_idempotent(spark, frames, tmp_path):
    """foreachBatch is AT-LEAST-ONCE: a crash between the sink write
    and the streaming commit log re-delivers the same epoch. The
    epoch-prefixed staged commit must make the retry replace its own
    files, never append duplicates — while a NEW epoch still
    appends."""
    from angelone_clickhouse_spark.streaming.ingest import (
        make_epoch_appender,
    )

    ticks = _batch_ticks(spark, frames)
    out = str(tmp_path / "sink")
    append = make_epoch_appender(out)
    append(ticks, 0)
    n1 = spark.read.parquet(out).count()
    assert n1 == ticks.count()
    append(ticks, 0)  # retried epoch (same id, same data)
    assert spark.read.parquet(out).count() == n1
    append(ticks.limit(50), 1)  # a genuinely new epoch appends
    assert spark.read.parquet(out).count() == n1 + 50


def test_hopping_bars_stream_equals_batch(spark, frames, frames_dir, tmp_path):
    """Sliding-window state: each tick must appear in exactly two
    overlapping windows, identically in stream and batch replays."""
    from angelone_clickhouse_spark.streaming.ingest import read_frame_stream

    ticks_stream = decode_tick_stream(read_frame_stream(spark, frames_dir))
    q = (
        hopping_bars(ticks_stream, watermark=None)
        .writeStream.format("memory")
        .queryName("hop_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("hop_test")
    expected = hopping_bars(_batch_ticks(spark, frames))
    cols = sorted(got.columns)
    sg = sorted(map(tuple, got.select(*cols).collect()), key=repr)
    se = sorted(map(tuple, expected.select(*cols).collect()), key=repr)
    assert sg == se
    # every tick lands in exactly 2 windows: total tick_count doubles
    n_ticks = _batch_ticks(spark, frames).count()
    assert sum(r.tick_count for r in sg_rows(got)) == 2 * n_ticks


def sg_rows(df):
    return df.select("tick_count").collect()


def test_minute_bars_stream_equals_batch(spark, frames, frames_dir, tmp_path):
    ticks_stream = decode_tick_stream(
        __import__(
            "angelone_clickhouse_spark.streaming.ingest", fromlist=["read_frame_stream"]
        ).read_frame_stream(spark, frames_dir)
    )
    bars_q = (
        minute_bars(ticks_stream, watermark=None)
        .writeStream.format("memory")
        .queryName("bars_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    bars_q.awaitTermination(120)
    got = spark.table("bars_test")
    expected = minute_bars(_batch_ticks(spark, frames))
    cols = sorted(got.columns)
    assert cols == sorted(expected.columns)
    sg = sorted(map(tuple, got.select(*cols).collect()), key=repr)
    se = sorted(map(tuple, expected.select(*cols).collect()), key=repr)
    assert sg == se
    # OHLC sanity on one bar
    row = got.orderBy("bar_ts", "token").first()
    assert row.low <= row.high


def test_media_gate_stream_equals_batch(spark, tmp_path):
    """The multimodal gate is stateless, so the SAME media_gate
    function must produce identical per-doc decisions through
    readStream → writeStream (multi-file source, availableNow) as in
    batch — the stream==batch guarantee the tick path pins, extended
    to the media decode path."""
    from angelone_clickhouse_spark.operators.multimodal import (
        media_gate,
        media_table,
    )
    from angelone_clickhouse_spark.streaming.media import gate_media_stream

    sf_dir = "/root/testdata/sf0.001"
    in_dir = str(tmp_path / "media_in")
    media = media_table(spark, sf_dir).select(
        "doc_id", "media_type", "content"
    )
    media.repartition(4).write.parquet(in_dir)

    out = str(tmp_path / "gated")
    ckpt = str(tmp_path / "ckpt")
    q = gate_media_stream(
        spark, in_dir, out, ckpt, max_files_per_trigger=2
    )
    q.awaitTermination(120)

    got = sorted(
        map(tuple, spark.read.parquet(out).collect()), key=repr
    )
    expected = sorted(map(tuple, media_gate(media).collect()), key=repr)
    assert got == expected
    assert len(got) == media.count()


def test_corrupt_counter(spark, frames):
    r = corrupt_frame_count(frames_df(spark, frames)).collect()[0]
    assert r.n_frames == len(frames)
    # every corrupt index (i%100==99) is also a duplicated index
    # (i%10==9), so each of the 20 corrupt frames appears twice
    assert r.n_corrupt == 40


def test_subscription_filter(spark, frames):
    from angelone_clickhouse_spark.sources.decoder import decode_frames
    from angelone_clickhouse_spark.streaming.ingest import subscription_filter

    decoded = decode_frames(frames_df(spark, frames))
    sub = subscription_filter(decoded, ["2885", "1594"], min_mode=2)
    rows = sub.select("token", "subscription_mode").distinct().collect()
    assert {r.token for r in rows} == {"2885", "1594"}
    assert all(r.subscription_mode >= 2 for r in rows)


def test_ingest_row_cap_per_file(spark, frames, frames_dir, tmp_path):
    """Size half of the reference's size-OR-time flush (BATCH_SIZE=1000
    OR 5 s): with max_records_per_file set, no flushed parquet file
    exceeds the cap, and the sink still equals the batch computation."""
    import glob

    import pyarrow.parquet as pq

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    cap = 200
    q = ingest_to_parquet(
        spark, frames_dir, out, ckpt, available_now=True,
        max_records_per_file=cap,
    )
    q.awaitTermination(180)
    # committed ingest files carry the e<epoch>- idempotence prefix
    files = glob.glob(f"{out}/date=*/e*-part-*.parquet")
    assert files
    sizes = [pq.read_metadata(f).num_rows for f in files]
    assert max(sizes) <= cap
    assert any(s == cap for s in sizes), "cap must actually split files"
    got = spark.read.parquet(out).drop("date")
    expected = _batch_ticks(spark, frames)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )


def test_subscribe_request_matches_reference_contract(spark):
    """VERDICT r3 #5: the subscribe message must be byte-compatible
    with the reference's SubscribeRequest (angel/types.go:13-27,
    main.go:287-304): {correlationID, action: 1, params: {mode,
    tokenList: [{exchangeType, tokens}]}}, built from config/tokens.json
    with unknown exchanges dropped."""
    import json

    from angelone_clickhouse_spark.sources.token_config import (
        DEFAULT_CONFIG_PATH,
        EXCHANGE_TYPE_MAP,
    )
    from angelone_clickhouse_spark.streaming.subscription import (
        build_subscribe_request,
        reference_request_dict,
        roundtrip_equal,
    )

    msg = build_subscribe_request(spark)
    with open(DEFAULT_CONFIG_PATH) as f:
        cfg = json.load(f)
    by_exchange: dict[int, list[str]] = {}
    for row in cfg:
        et = EXCHANGE_TYPE_MAP.get(row["exchange"])
        if et is None:  # the reference's log-and-skip for unknowns
            continue
        by_exchange.setdefault(et, []).append(row["token"])
    assert json.loads(msg) == reference_request_dict(by_exchange)
    # parse(build(x)) is a fixed point
    assert roundtrip_equal(spark, msg)


def test_subscribe_message_filters_decoded_stream(spark, frames):
    """The parsed control message drives the data-path filter: only
    subscribed tokens at >= the subscribed mode survive."""
    import json

    from angelone_clickhouse_spark.sources.decoder import decode_frames
    from angelone_clickhouse_spark.streaming.subscription import (
        QUOTE_MODE,
        SUBSCRIBE_ACTION,
        apply_subscribe_message,
    )

    msg = json.dumps(
        {
            "correlationID": "ws_test",
            "action": SUBSCRIBE_ACTION,
            "params": {
                "mode": QUOTE_MODE,
                "tokenList": [
                    {"exchangeType": 1, "tokens": ["2885", "1594"]}
                ],
            },
        }
    )
    decoded = decode_frames(frames_df(spark, frames))
    out = apply_subscribe_message(decoded, spark, msg)
    rows = out.select("token", "subscription_mode").distinct().collect()
    assert {r.token for r in rows} == {"2885", "1594"}
    assert all(r.subscription_mode >= QUOTE_MODE for r in rows)
    # malformed JSON -> empty result, not an exception (parse-skip)
    assert apply_subscribe_message(decoded, spark, "{not json").count() == 0


def test_worker_stats_partition_counters(spark, frames):
    """WorkerStats analogue (models/stats.go:15-20): per-partition
    processed/error counts must sum to the stream totals."""
    from angelone_clickhouse_spark.sources.decoder import decode_frames
    from angelone_clickhouse_spark.streaming.observability import worker_stats

    decoded = decode_frames(frames_df(spark, frames)).repartition(4)
    rows = worker_stats(decoded).collect()
    assert 1 < len(rows) <= 4  # one row per non-empty worker partition
    assert sum(r.processed_count for r in rows) == len(frames)
    total_corrupt = decoded.filter("is_corrupt").count()
    assert sum(r.error_count for r in rows) == total_corrupt
    assert all(r.last_processed_ms is not None for r in rows)


def test_unsubscribe_message_yields_empty_stream(spark, frames):
    """UnsubscribeAction (models/token.go:12): a control message with
    action=0 subscribes nothing — the data path goes empty rather than
    erroring, matching the reference's action dispatch."""
    import json

    from angelone_clickhouse_spark.sources.decoder import decode_frames
    from angelone_clickhouse_spark.streaming.subscription import (
        QUOTE_MODE,
        UNSUBSCRIBE_ACTION,
        apply_subscribe_message,
    )

    msg = json.dumps(
        {
            "correlationID": "ws_test",
            "action": UNSUBSCRIBE_ACTION,
            "params": {
                "mode": QUOTE_MODE,
                "tokenList": [{"exchangeType": 1, "tokens": ["2885"]}],
            },
        }
    )
    decoded = decode_frames(frames_df(spark, frames))
    assert apply_subscribe_message(decoded, spark, msg).count() == 0
