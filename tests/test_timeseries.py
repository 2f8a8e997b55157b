"""Gap-fill semantics for the hourly resample operator."""

from __future__ import annotations

from angelone_clickhouse_spark.operators.timeseries import resample_ffill


def test_resample_fills_gaps_with_last_price(spark):
    sf = "/root/testdata/sf0.01"
    rows = resample_ffill(spark, sf).collect()
    assert rows
    by_tok = {}
    for r in rows:
        by_tok.setdefault(r.token, []).append(r)
    saw_gap = False
    for tok, rs in by_tok.items():
        rs.sort(key=lambda r: r.hour_ts)
        # contiguous hourly grid
        for a, b in zip(rs, rs[1:]):
            assert (b.hour_ts - a.hour_ts).total_seconds() == 3600
        # first hour always contains the token's first tick
        assert rs[0].n_ticks >= 1 and rs[0].price is not None
        last_px = None
        for r in rs:
            if r.n_ticks == 0:
                saw_gap = True
                # gap hour carries the previous price forward
                assert r.price == last_px
            last_px = r.price
            assert r.price is not None
    assert saw_gap, "fixture should contain empty hours (10k events/30d)"
