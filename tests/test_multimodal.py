from __future__ import annotations

import pytest

from angelone_clickhouse_spark.operators.multimodal import (
    _decode_stub,
    extract_features,
    media_table,
)


def test_media_table_schema(spark, sf_dir):
    m = media_table(spark, sf_dir)
    assert dict(m.dtypes)["content"] == "binary"
    assert m.count() == 500


def test_extract_features_deterministic(spark, sf_dir):
    m = media_table(spark, sf_dir)
    a = sorted(map(tuple, extract_features(m).collect()))
    b = sorted(map(tuple, extract_features(m).collect()))
    assert a == b
    for row in a:
        doc_id, media_type, byte_len, width, height, n_frames = row
        assert byte_len > 0
        assert 64 <= width < 64 + 1024
        if media_type == "image":
            assert n_frames == 1
        else:
            assert n_frames >= 1


def test_decode_stub_rejects_unknown_type():
    with pytest.raises(NotImplementedError):
        _decode_stub("hologram", b"abc")
