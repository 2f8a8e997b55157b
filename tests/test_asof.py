from __future__ import annotations

import datetime as dt

from angelone_clickhouse_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    events = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:00:00"), 1.0),
            ("A", _ts("2024-01-01T10:05:00"), 2.0),
            ("A", _ts("2024-01-01T11:00:00"), 3.0),
            ("B", _ts("2024-01-01T12:00:00"), 9.0),
        ],
        "key string, ts timestamp, px double",
    )
    probes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:04:59")),  # between ticks -> 1.0
            ("A", _ts("2024-01-01T10:05:00")),  # exact match inclusive -> 2.0
            ("A", _ts("2024-01-01T23:00:00")),  # after last -> 3.0
            ("B", _ts("2024-01-01T11:59:59")),  # before first B -> dropped
            ("C", _ts("2024-01-01T10:00:00")),  # unknown key -> dropped
        ],
        "key string, pts timestamp",
    )
    out = {
        (r.key, r.pts.isoformat()): r.px
        for r in asof_join(
            probes, events, key="key", probe_ts="pts",
            event_ts="ts", value_cols=["px"],
        ).collect()
    }
    assert out == {
        ("A", "2024-01-01T10:04:59"): 1.0,
        ("A", "2024-01-01T10:05:00"): 2.0,
        ("A", "2024-01-01T23:00:00"): 3.0,
    }


def test_asof_join_null_valued_event_wins(spark):
    """A legitimately NULL-valued event must win the as-of match (the
    semantics of DuckDB's native ASOF JOIN) — last(col, ignorenulls)
    would silently skip back to the older non-null price; and a probe
    whose ONLY preceding event is null-valued must be kept (with the
    NULL), not dropped as if no event preceded it."""
    from angelone_clickhouse_spark.operators.asof import asof_join

    events = spark.createDataFrame(
        [
            ("K", 10, 5.0),
            ("K", 20, None),   # latest event before the probe: NULL price
            ("L", 10, None),   # L's only event is null-valued
        ],
        "token string, ts long, ltp double",
    )
    probes = spark.createDataFrame(
        [("K", 30), ("L", 30), ("M", 30)],  # M: no events at all
        "token string, pts long",
    )
    out = {
        (r.token, r.pts): r.ltp
        for r in asof_join(
            probes, events, "token", "pts", "ts", ["ltp"]
        ).collect()
    }
    assert out == {("K", 30): None, ("L", 30): None}  # M dropped
