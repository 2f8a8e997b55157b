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
