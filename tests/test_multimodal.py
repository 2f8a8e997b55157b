from __future__ import annotations

import pytest

from angelone_clickhouse_spark.operators.multimodal import (
    PPM_WIDTH,
    RESIZE_H,
    RESIZE_W,
    WAV_BITS,
    WAV_HEADER_BYTES,
    WAV_SAMPLE_RATE,
    Y4M_FRAME_BYTES,
    Y4M_HDR,
    Y4M_HEIGHT,
    Y4M_WIDTH,
    _decode,
    _decode_ppm,
    _decode_wav,
    _decode_y4m,
    extract_features,
    media_table,
    resize_ppm,
)


def test_media_table_schema(spark, sf_dir):
    m = media_table(spark, sf_dir)
    assert dict(m.dtypes)["content"] == "binary"
    assert m.count() == 500


def test_audio_payloads_are_real_wav(spark, sf_dir):
    """Audio content must be a well-formed RIFF/WAV container the
    stdlib wave module can open, with the document bytes as PCM."""
    import io
    import wave

    rows = (
        media_table(spark, sf_dir)
        .filter("media_type = 'audio'")
        .limit(5)
        .collect()
    )
    assert rows
    for r in rows:
        blob = bytes(r.content)
        assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
        with wave.open(io.BytesIO(blob), "rb") as w:
            assert w.getframerate() == WAV_SAMPLE_RATE
            assert 8 * w.getsampwidth() == WAV_BITS
            assert w.getnchannels() == 1
            pcm = w.readframes(w.getnframes())
        assert blob[WAV_HEADER_BYTES:] == pcm  # samples == document bytes


def test_extract_features_deterministic(spark, sf_dir):
    m = media_table(spark, sf_dir)
    a = sorted(map(tuple, extract_features(m).collect()))
    b = sorted(map(tuple, extract_features(m).collect()))
    assert a == b
    for row in a:
        doc_id, media_type, byte_len, width, height, n_frames = row
        assert byte_len > 0
        if media_type == "audio":
            # real decode: header params + PCM frame count read back
            assert width == WAV_SAMPLE_RATE
            assert height == WAV_BITS
            assert n_frames == byte_len - WAV_HEADER_BYTES
        elif media_type == "image":
            # real decode: P6 header dims + verified raster
            assert width == PPM_WIDTH
            assert height >= 1
            assert n_frames == 1
            assert byte_len == 11 + len(str(height)) + height * 3 * PPM_WIDTH
        else:
            # real decode: Y4M header dims + walked frame count; the
            # header length varies with the Xlen injectivity param
            assert width == Y4M_WIDTH
            assert height == Y4M_HEIGHT
            assert n_frames >= 1
            data_len = n_frames * (6 + Y4M_FRAME_BYTES)
            hdr_len = byte_len - data_len
            assert 42 <= hdr_len <= 42 + 10  # 42 + digits(dlen)


def test_decode_wav_rejects_malformed():
    """A real decoder fails loudly on garbage — it never emits fake
    features for a corrupt container (unlike the deterministic stub)."""
    import struct
    import wave

    with pytest.raises(wave.Error):
        _decode_wav(b"not a riff container at all......")
    # valid header lying about its frame count -> truncation error
    n_claimed = 100
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + n_claimed)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data"
        + struct.pack("<I", n_claimed)
        + b"only-these-bytes"
    )
    with pytest.raises((ValueError, EOFError, wave.Error)):
        _decode_wav(hdr)


def test_image_payloads_are_real_ppm(spark, sf_dir):
    """Image content must be a well-formed binary PPM the real parser
    decodes, with the document bytes as the raster prefix."""
    rows = (
        media_table(spark, sf_dir)
        .filter("media_type = 'image'")
        .limit(5)
        .collect()
    )
    assert rows
    for r in rows:
        blob = bytes(r.content)
        assert blob.startswith(b"P6\n")
        w, h, n = _decode_ppm(blob)
        assert (w, n) == (PPM_WIDTH, 1)
        raster = blob.split(b"\n", 3)[3]
        assert len(raster) == w * h * 3
        assert raster.rstrip(b"\0") or h == 1  # text prefix + NUL pad


def test_decode_ppm_rejects_malformed():
    with pytest.raises(ValueError):
        _decode_ppm(b"JFIF not a ppm")
    with pytest.raises(ValueError):
        _decode_ppm(b"P6\n4 x\n255\nxxxx")
    with pytest.raises(ValueError):
        _decode_ppm(b"P6\n2 2\n255\nshort")  # truncated raster
    with pytest.raises(ValueError):
        _decode_ppm(b"P6\n2 2\n65535\n" + b"\0" * 12)  # bad maxval


def test_decode_rejects_unknown_type():
    with pytest.raises(NotImplementedError):
        _decode("hologram", b"abc")


def test_video_payloads_are_real_y4m(spark, sf_dir):
    """Video content must be a well-formed YUV4MPEG2 stream the real
    parser walks, with the document bytes as the frame-plane prefix."""
    rows = (
        media_table(spark, sf_dir)
        .filter("media_type = 'video'")
        .limit(5)
        .collect()
    )
    assert rows
    for r in rows:
        blob = bytes(r.content)
        assert blob.startswith(b"YUV4MPEG2 ")
        assert b" Xlen=" in blob.split(b"\n", 1)[0]  # injectivity param
        w, h, n = _decode_y4m(blob)
        assert (w, h) == (Y4M_WIDTH, Y4M_HEIGHT)
        assert n >= 1
        # first frame's plane bytes are the document's leading bytes
        body = blob.index(b"\n") + 1 + 6  # header + 'FRAME\n'
        first = blob[body : body + Y4M_FRAME_BYTES]
        assert first.rstrip(b"\0")  # text prefix + NUL pad only


def test_decode_y4m_rejects_malformed():
    ok = Y4M_HDR + b"FRAME\n" + b"x" * Y4M_FRAME_BYTES
    assert _decode_y4m(ok) == (Y4M_WIDTH, Y4M_HEIGHT, 1)
    with pytest.raises(ValueError):
        _decode_y4m(b"AVI not a y4m stream")
    with pytest.raises(ValueError):
        _decode_y4m(b"YUV4MPEG2 Wx H8 C444\nFRAME\n")  # bad dims
    with pytest.raises(ValueError):
        # C420 (the default) is unsupported: frame size would differ
        _decode_y4m(b"YUV4MPEG2 W32 H8\nFRAME\n" + b"x" * 768)
    with pytest.raises(ValueError):
        _decode_y4m(ok + b"FRAME\n" + b"x" * (Y4M_FRAME_BYTES - 1))
    with pytest.raises(ValueError):
        _decode_y4m(ok + b"GARBAGE\n" + b"x" * Y4M_FRAME_BYTES)
    with pytest.raises(ValueError):
        _decode_y4m(Y4M_HDR)  # zero frames


def test_resize_ppm_nearest_neighbor_reference(spark):
    """The distributed resize must equal a direct numpy nearest-
    neighbor gather image-for-image — on a VARIABLE-width corpus, so
    a column-gather map cached across images of different widths (the
    bug class the per-width sx cache exists for) cannot pass."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows, rasters = [], {}
    for doc_id, (w0, h0) in enumerate([(32, 5), (16, 4), (7, 9), (8, 4)]):
        img = rng.integers(0, 256, size=(h0, w0, 3), dtype=np.uint8)
        blob = f"P6\n{w0} {h0}\n255\n".encode("ascii") + img.tobytes()
        rows.append((doc_id, "image", bytearray(blob)))
        rasters[doc_id] = img
    rows.append((99, "audio", bytearray(b"not touched")))  # filtered out
    df = spark.createDataFrame(
        rows, "doc_id long, media_type string, content binary"
    )
    out = {r.doc_id: r for r in resize_ppm(df).collect()}
    assert set(out) == set(rasters)  # non-image rows excluded
    for doc_id, img in rasters.items():
        h0, w0, _ = img.shape
        sy = (np.arange(RESIZE_H) * h0) // RESIZE_H
        sx = (np.arange(RESIZE_W) * w0) // RESIZE_W
        ref = img[sy][:, sx]
        r = out[doc_id]
        assert (r.src_width, r.src_height) == (w0, h0)
        assert (r.out_width, r.out_height) == (RESIZE_W, RESIZE_H)
        blob = bytes(r.content)
        assert _decode_ppm(blob) == (RESIZE_W, RESIZE_H, 1)  # valid P6 out
        assert blob.split(b"\n", 3)[3] == ref.tobytes()
        assert r.pixel_checksum == int(ref.sum())
        assert r.out_bytes == len(blob)


def test_resize_ppm_rejects_malformed(spark):
    """A truncated raster fails the job loudly (decode-before-resize),
    never yields a silently wrong thumbnail."""
    df = spark.createDataFrame(
        [(1, "image", bytearray(b"P6\n4 4\n255\nshort"))],
        "doc_id long, media_type string, content binary",
    )
    with pytest.raises(Exception, match="truncated raster"):
        resize_ppm(df).collect()


def test_extract_frames_multi_frame_reference(spark):
    """Sampled-frame extraction on a synthetic MULTI-frame stream
    (driver data is mostly 1-frame videos, so the stride arithmetic
    — header_end + idx*(marker+frame) + marker — is pinned here):
    every extracted frame must equal the direct payload slice."""
    import numpy as np

    from angelone_clickhouse_spark.operators.multimodal import (
        FRAME_SAMPLES,
        extract_frames,
    )

    rng = np.random.default_rng(11)
    n_frames = 13  # > FRAME_SAMPLES: distinct sampled indices
    payload = rng.integers(
        0, 256, size=n_frames * Y4M_FRAME_BYTES - 100, dtype=np.uint8
    ).tobytes()
    frames_ref = [
        payload[i * Y4M_FRAME_BYTES : (i + 1) * Y4M_FRAME_BYTES].ljust(
            Y4M_FRAME_BYTES, b"\0"
        )
        for i in range(n_frames)
    ]
    blob = Y4M_HDR + b"".join(b"FRAME\n" + f for f in frames_ref)
    df = spark.createDataFrame(
        [(5, "video", bytearray(blob)), (6, "image", bytearray(b"skip"))],
        "doc_id long, media_type string, content binary",
    )
    rows = extract_frames(df).collect()
    want_idxs = sorted({(j * n_frames) // FRAME_SAMPLES for j in range(FRAME_SAMPLES)})
    assert sorted(r.frame_idx for r in rows) == want_idxs
    for r in rows:
        assert (r.doc_id, r.n_frames, r.frame_bytes) == (
            5, n_frames, Y4M_FRAME_BYTES,
        )
        assert bytes(r.frame) == frames_ref[r.frame_idx]
        assert r.frame_checksum == sum(frames_ref[r.frame_idx])


def test_audio_stats_numpy_reference(spark):
    """Exact amplitude stats + decimation resample vs a direct numpy
    reference, including the empty-payload edge (0 samples, all-zero
    stats — the row must still be emitted)."""
    import numpy as np

    from angelone_clickhouse_spark.operators.multimodal import (
        RESAMPLE_STEP,
        _wrap_wav,
        audio_stats,
    )
    from pyspark.sql import functions as F

    payloads = {1: b"hello sampled world" * 3, 2: b"", 3: bytes(range(256))}
    df = spark.createDataFrame(
        [(k, v.decode("latin-1")) for k, v in payloads.items()],
        "doc_id long, text string",
    ).select(
        "doc_id",
        F.lit("audio").alias("media_type"),
        _wrap_wav(F.encode("text", "ISO-8859-1")).alias("content"),
    )
    out = {r.doc_id: r for r in audio_stats(df).collect()}
    assert set(out) == set(payloads)
    for k, b in payloads.items():
        a = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
        r = out[k]
        assert r.sample_rate == WAV_SAMPLE_RATE
        assert r.n_samples == len(b)
        assert r.amp_sum == int(a.sum())
        assert r.amp_sumsq == int((a * a).sum())
        assert r.resampled_n == len(a[::RESAMPLE_STEP])
        assert r.resampled_sum == int(a[::RESAMPLE_STEP].sum())


def test_y4m_parameterized_frame_markers(spark):
    """The Y4M spec allows per-frame parameters ('FRAME Ip\\n'), so
    marker lines are variable-length: frame slicing MUST use the
    walked offsets, never a fixed header+idx*(6+fb) stride. Pins the
    walk, extraction, and the gate's first-frame checksum on a stream
    whose markers would break any fixed-stride arithmetic."""
    from angelone_clickhouse_spark.operators.multimodal import (
        Y4M_HDR_BASE,
        _walk_y4m,
        extract_frames,
        media_gate,
    )

    p0 = bytes(range(256)) * 3  # frame 0 planes (768 bytes)
    p1 = b"x" * Y4M_FRAME_BYTES
    blob = (
        Y4M_HDR_BASE + b"\n"
        + b"FRAME Ip Xvendor=1\n" + p0  # 19-byte marker line
        + b"FRAME\n" + p1               # 6-byte marker line
    )
    assert _decode_y4m(blob) == (Y4M_WIDTH, Y4M_HEIGHT, 2)
    w, h, offs = _walk_y4m(blob)
    assert blob[offs[0] : offs[0] + Y4M_FRAME_BYTES] == p0
    assert blob[offs[1] : offs[1] + Y4M_FRAME_BYTES] == p1

    df = spark.createDataFrame(
        [(9, "video", bytearray(blob))],
        "doc_id long, media_type string, content binary",
    )
    frames = {r.frame_idx: r for r in extract_frames(df).collect()}
    assert bytes(frames[0].frame) == p0
    assert bytes(frames[1].frame) == p1
    assert frames[0].frame_checksum == sum(p0)
    (g,) = media_gate(df).collect()
    assert g.metric == sum(p0)  # first-frame checksum at walked offset


def test_pcm_var_metric_exact_beyond_int64():
    """The gate's variance metric must be exact arbitrary-precision
    arithmetic: at ~17M samples of max-variance PCM the naive
    numpy-int64 product n*sum(a^2) exceeds 2^63 and would silently
    wrap (flipping the keep decision), while the true metric still
    fits int64."""
    import numpy as np

    from angelone_clickhouse_spark.operators.multimodal import (
        _pcm_var_metric,
    )

    n = 17_000_000
    a = np.zeros(n, dtype=np.uint8)
    a[1::2] = 255
    exact = 255 * 255 * n * n // 4  # n*ss - s^2 for the 0/255 square wave
    assert exact < 2**63 - 1  # the true metric is representable...
    ss = int((a.astype(np.int64) ** 2).sum())
    assert n * ss > 2**63 - 1  # ...but the naive int64 product wraps
    assert _pcm_var_metric(a) == exact


def test_audio_stats_rejects_unsupported_pcm(spark):
    """A 16-bit WAV must fail loudly, never be silently
    reinterpreted as 8-bit samples (which would yield wrong — not
    missing — statistics)."""
    import struct

    from angelone_clickhouse_spark.operators.multimodal import audio_stats

    n = 8  # frames; 16-bit mono -> 2 bytes per frame
    blob = (
        b"RIFF" + struct.pack("<I", 36 + 2 * n) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 2 * n) + b"\x01\x02" * n
    )
    df = spark.createDataFrame(
        [(1, "audio", bytearray(blob))],
        "doc_id long, media_type string, content binary",
    )
    with pytest.raises(Exception, match="8-bit mono"):
        audio_stats(df).collect()


def test_media_gate_branches(spark):
    """Every modality's keep AND drop branch, pinned on synthetic
    payloads with hand-computable metrics."""
    import numpy as np

    from angelone_clickhouse_spark.operators.multimodal import (
        GATE_MIN_FRAME_MEAN,
        GATE_MIN_MEAN,
        GATE_MIN_SAMPLES,
        GATE_MIN_VAR,
        RESIZE_H,
        RESIZE_W,
        media_gate,
    )

    n_thumb = RESIZE_W * RESIZE_H * 3

    def ppm(fill):
        return bytearray(
            f"P6\n{PPM_WIDTH} 2\n255\n".encode("ascii")
            + bytes([fill]) * (2 * 3 * PPM_WIDTH)
        )

    def wav(samples):
        import struct

        n = len(samples)
        return bytearray(
            b"RIFF" + struct.pack("<I", 36 + n) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
            + b"data" + struct.pack("<I", n) + bytes(samples)
        )

    def y4m(frame_fill):
        return bytearray(
            Y4M_HDR + b"FRAME\n" + bytes([frame_fill]) * Y4M_FRAME_BYTES
        )

    loud = list(range(64, 192)) * 2  # variance >> GATE_MIN_VAR
    rows = [
        (0, "image", ppm(100)),           # mean 100: keep
        (1, "image", ppm(4)),             # mean 4 < GATE_MIN_MEAN: drop
        (2, "image", ppm(250)),           # mean 250 > GATE_MAX_MEAN: drop
        (3, "audio", wav(loud)),          # long + varied: keep
        (4, "audio", wav([7] * 100)),     # flat (var 0): drop
        (5, "audio", wav(loud[:8])),      # < GATE_MIN_SAMPLES: drop
        (6, "video", y4m(50)),            # lead-frame mean 50: keep
        (7, "video", y4m(2)),             # lead-frame mean 2: drop
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, media_type string, content binary"
    )
    out = {r.doc_id: r for r in media_gate(df).collect()}
    assert {k: v.keep for k, v in out.items()} == {
        0: True, 1: False, 2: False,
        3: True, 4: False, 5: False,
        6: True, 7: False,
    }
    # metric spot checks: exact integer semantics
    assert out[0].metric == 100 * n_thumb
    a = np.array(loud, dtype=np.int64)
    assert out[3].metric == len(a) * int((a * a).sum()) - int(a.sum()) ** 2
    assert out[3].metric >= GATE_MIN_VAR * len(a) * len(a)
    assert out[4].metric == 0
    assert out[5].metric > 0  # varied but too short: length is the cause
    assert len(loud[:8]) < GATE_MIN_SAMPLES
    assert out[6].metric == 50 * Y4M_FRAME_BYTES
    assert out[7].metric == 2 * Y4M_FRAME_BYTES < GATE_MIN_FRAME_MEAN * Y4M_FRAME_BYTES
    assert out[1].metric == 4 * n_thumb < GATE_MIN_MEAN * n_thumb


def test_wrap_y4m_injective_for_nul_bytes(spark):
    """The Xlen header param must keep the video wrap injective even
    for payloads that differ only by trailing NUL bytes (which pad to
    identical frame planes) — the same guarantee the WAV data-chunk
    size gives _wrap_wav, and the case the driver differential would
    hit if distinct texts ever wrapped identically."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("x",), ("x\x00",), ("",), ("\x00",)], "text string"
    )
    from angelone_clickhouse_spark.operators.multimodal import _wrap_y4m

    blobs = [
        bytes(r.c)
        for r in df.select(
            _wrap_y4m(F.encode("text", "UTF-8")).alias("c")
        ).collect()
    ]
    assert len(set(blobs)) == len(blobs)
