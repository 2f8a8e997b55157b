from __future__ import annotations

from angelone_clickhouse_spark.operators.text import (
    text_fingerprint,
    text_langid,
    text_quality,
    text_token_stats,
)


def test_token_stats_consistency(spark, sf_dir):
    rows = text_token_stats(spark, sf_dir).collect()
    assert len(rows) == 500
    for r in rows:
        assert r.n_distinct_tokens <= r.n_tokens
        assert 0 < r.avg_token_len < 30


def test_quality_flags(spark, sf_dir):
    rows = text_quality(spark, sf_dir).collect()
    assert all(0.0 <= r.stopword_ratio <= 1.0 for r in rows)
    assert all(0.0 < r.type_token_ratio <= 1.0 for r in rows)
    assert any(r.passes_quality for r in rows)


def test_langid_deterministic_and_covering(spark, sf_dir):
    a = sorted(map(tuple, text_langid(spark, sf_dir).collect()))
    b = sorted(map(tuple, text_langid(spark, sf_dir).collect()))
    assert a == b
    langs = {r[1] for r in a}
    assert langs <= {"en", "es", "fr", "de", "zh", "und"}
    assert sum(r[2] for r in a) == 500


def test_fingerprints_stable_and_bounded(spark, sf_dir):
    rows = text_fingerprint(spark, sf_dir).collect()
    for r in rows:
        assert 1 <= r.n_fingerprints <= r.n_shingles
