"""Property tests for the multimodal container wraps and decoders.

Every wrap (WAV / PPM / Y4M) must round-trip its construction
parameters through the REAL decoder for arbitrary payloads —
including NUL bytes, empty payloads, and payloads landing exactly on
raster/frame boundaries (the off-by-one classes the example-based
tests can miss) — and must be injective (distinct payloads, distinct
containers), which is what the multimodal_meta distinct-count oracle
relies on. Pure-function level: the pandas_udf wrappers expose the
underlying callables via ``.func``, so no Spark session is needed.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from angelone_clickhouse_spark.operators.multimodal import (
    PPM_WIDTH,
    WAV_BITS,
    WAV_SAMPLE_RATE,
    Y4M_FRAME_BYTES,
    Y4M_HEIGHT,
    Y4M_WIDTH,
    _decode_ppm,
    _decode_wav,
    _decode_y4m,
    _wrap_ppm,
    _wrap_wav,
    _wrap_y4m,
)

# boundary-heavy payload sizes: empty, 1, exact raster/frame
# multiples and their neighbours, plus arbitrary binary blobs
_payloads = st.one_of(
    st.binary(max_size=64),
    st.integers(0, 3).flatmap(
        lambda k: st.sampled_from(
            [0, 1]
            + [k * 3 * PPM_WIDTH + d for d in (-1, 0, 1) if k * 3 * PPM_WIDTH + d >= 0]
            + [k * Y4M_FRAME_BYTES + d for d in (-1, 0, 1) if k * Y4M_FRAME_BYTES + d >= 0]
        ).flatmap(lambda n: st.binary(min_size=n, max_size=n))
    ),
)


def _ceil(n: int, d: int) -> int:
    return max(1, -(-n // d))


@given(_payloads)
@settings(max_examples=200, deadline=None)
def test_wav_roundtrip(b):
    wav = _wrap_wav.func(pd.Series([b]))[0]
    assert _decode_wav(wav) == (WAV_SAMPLE_RATE, WAV_BITS, len(b))
    assert wav[44:] == b  # samples ARE the payload, no padding


@given(_payloads)
@settings(max_examples=200, deadline=None)
def test_ppm_roundtrip(b):
    ppm = _wrap_ppm.func(pd.Series([b]))[0]
    h = _ceil(len(b), 3 * PPM_WIDTH)
    assert _decode_ppm(ppm) == (PPM_WIDTH, h, 1)
    raster = ppm.split(b"\n", 3)[3]
    assert raster[: len(b)] == b  # payload prefix
    assert raster[len(b) :] == b"\0" * (h * 3 * PPM_WIDTH - len(b))


@given(_payloads)
@settings(max_examples=200, deadline=None)
def test_y4m_roundtrip(b):
    y4m = _wrap_y4m.func(pd.Series([b]))[0]
    n = _ceil(len(b), Y4M_FRAME_BYTES)
    assert _decode_y4m(y4m) == (Y4M_WIDTH, Y4M_HEIGHT, n)
    # reassemble the payload from the frame planes
    body = y4m[y4m.index(b"\n") + 1 :]
    planes = b"".join(
        body[i * (6 + Y4M_FRAME_BYTES) + 6 : (i + 1) * (6 + Y4M_FRAME_BYTES)]
        for i in range(n)
    )
    assert planes[: len(b)] == b
    assert planes[len(b) :] == b"\0" * (n * Y4M_FRAME_BYTES - len(b))


@given(st.lists(st.binary(max_size=32), min_size=2, max_size=8, unique=True))
@settings(max_examples=100, deadline=None)
def test_wraps_injective(payloads):
    """Distinct payloads -> pairwise-distinct containers, for ALL
    THREE wraps — including NUL-padding collision candidates. (PPM's
    guarantee is documented only for NUL-free payloads; it holds for
    arbitrary ones unless two payloads pad to the same raster, so
    restrict PPM to NUL-free inputs here.)"""
    s = pd.Series(payloads)
    for wrap in (_wrap_wav, _wrap_y4m):
        out = list(wrap.func(s))
        assert len(set(out)) == len(payloads), wrap
    nul_free = [p for p in payloads if b"\0" not in p]
    out = list(_wrap_ppm.func(pd.Series(nul_free)))
    assert len(set(out)) == len(nul_free)
