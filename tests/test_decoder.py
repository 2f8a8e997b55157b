"""Decoder unit tests per SURVEY §5.2(2): hand-built binary frames
(mode 1 vs mode>=2, NUL-padded tokens, truncated frames per D5) with
exact expected values, on both the pandas-UDF and the pure-column
decoder."""

from __future__ import annotations

import pytest

from angelone_clickhouse_spark.sources.decoder import (
    decode_frames,
    decode_frames_native,
    wire_to_ticks,
)
from angelone_clickhouse_spark.sources.frames import (
    FULL_LEN,
    HEADER_LEN,
    encode_frame,
    frames_df,
    generate_frames,
)


def _one(spark, frame, decoder):
    return decoder(frames_df(spark, [frame])).collect()[0]


@pytest.mark.parametrize("decoder", [decode_frames, decode_frames_native])
def test_mode1_frame(spark, decoder):
    f = encode_frame(1, 1, "2885", 7, 1_704_067_200_123, 250_075)
    assert len(f) == HEADER_LEN
    r = _one(spark, f, decoder)
    assert r.subscription_mode == 1
    assert r.exchange_type == 1
    assert r.token == "2885"  # NUL padding trimmed (parser/binary.go:55-57)
    assert r.sequence_number == 7
    assert r.exchange_timestamp == 1_704_067_200_123
    assert r.last_traded_price == 250_075
    assert r.last_traded_quantity is None  # mode-1: no tail fields
    assert r.open_price_of_the_day is None
    assert not r.is_corrupt


@pytest.mark.parametrize("decoder", [decode_frames, decode_frames_native])
def test_mode3_frame_full_tail(spark, decoder):
    f = encode_frame(
        3, 2, "NIFTY25JAN23200PE", 99, 1_704_067_260_000, 123_456,
        ltq=10, atp_paise=123_400, volume=5_000,
        total_buy_qty=1234.0, total_sell_qty=567.0,
        open_paise=120_000, high_paise=125_000, low_paise=-150, close_paise=121_000,
    )
    assert len(f) == FULL_LEN
    r = _one(spark, f, decoder)
    assert r.token == "NIFTY25JAN23200PE"
    assert r.last_traded_quantity == 10
    assert r.average_traded_price == 123_400
    assert r.volume_trade == 5_000
    assert r.open_price_of_the_day == 120_000
    assert r.high_price_of_the_day == 125_000
    assert r.low_price_of_the_day == -150  # negative LE two's-complement
    assert r.closed_price == 121_000
    if decoder is decode_frames:  # doubles only on the pandas path
        assert r.total_buy_quantity == 1234.0
        assert r.total_sell_quantity == 567.0
    assert not r.is_corrupt


@pytest.mark.parametrize("decoder", [decode_frames, decode_frames_native])
def test_truncated_frame_yields_nulls_not_zeros(spark, decoder):
    """Reference zero-fills short frames silently (D5); engine nulls +
    flags them."""
    f = encode_frame(3, 1, "2885", 1, 1_704_067_200_000, 100, open_paise=5)[:60]
    r = _one(spark, f, decoder)
    assert r.is_corrupt
    assert r.open_price_of_the_day is None  # not 0
    # header still parseable
    assert r.token == "2885"


@pytest.mark.parametrize("decoder", [decode_frames, decode_frames_native])
def test_garbage_short_frame(spark, decoder):
    r = _one(spark, b"\x01\x02\x03", decoder)
    assert r.is_corrupt
    assert r.token is None
    assert r.sequence_number is None


def test_native_and_pandas_decoders_agree(spark):
    frames = generate_frames(500, seed=7, corrupt_every=25)
    common = [
        "subscription_mode", "exchange_type", "token", "sequence_number",
        "exchange_timestamp", "last_traded_price", "last_traded_quantity",
        "average_traded_price", "volume_trade", "open_price_of_the_day",
        "high_price_of_the_day", "low_price_of_the_day", "closed_price",
        "is_corrupt",
    ]
    df = frames_df(spark, frames)
    a = [tuple(r) for r in decode_frames(df).select(common).collect()]
    b = [tuple(r) for r in decode_frames_native(df).select(common).collect()]
    assert a == b


def test_wire_to_ticks_scaling(spark):
    """paise -> rupees /100 (parser/binary.go:27-45), volume -> double."""
    f = encode_frame(
        2, 1, "2885", 5, 1_704_067_200_500, 250_075,
        volume=42, open_paise=100, high_paise=200, low_paise=50, close_paise=150,
    )
    t = wire_to_ticks(decode_frames(frames_df(spark, [f]))).collect()[0]
    assert t.last_traded_price == 2500.75
    assert t.open_price == 1.0
    assert t.volume == 42.0
    assert t.ts.isoformat().startswith("2024-01-01T00:00:00.500")
    assert t.sequence_number == 5


def test_corrupt_frames_filtered_from_ticks(spark):
    frames = generate_frames(200, seed=1, corrupt_every=10)
    decoded = decode_frames(frames_df(spark, frames))
    n_corrupt = decoded.filter("is_corrupt").count()
    assert n_corrupt == 20
    assert wire_to_ticks(decoded).count() == 180
