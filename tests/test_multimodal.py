"""Multimodal plumbing: binary columns through mapInPandas, frame-sample and
resize planning — decode itself is stubbed (no media libs in container)."""

from __future__ import annotations

import pytest

from soict20221_bigdata_financialplatform_spark.operators import multimodal as mm


def _media(spark):
    rows = [
        (1, "image", "image/png", bytes([10, 20, 30, 40] * 25), 640, 480, -1),
        (2, "image", "image/jpeg", bytes(range(256)), 2048, 1024, -1),
        (3, "video", "video/mp4", b"\x00\x01", 1920, 1080, 3500),
        (4, "audio", "audio/wav", b"\x05" * 10, -1, -1, 2000),
        (5, "image", "image/png", b"", 0, 0, -1),
    ]
    return spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)


def test_image_features_shape_and_determinism(spark):
    out = mm.extract_image_features(_media(spark), feature_dim=8)
    rows = {r.media_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 5}  # only images cross the Arrow boundary
    assert rows[1].n_bytes == 100
    assert rows[2].n_bytes == 256
    # entropy: 4 distinct bytes equally likely -> 2 bits; 256 distinct -> 8
    assert rows[1].byte_entropy == pytest.approx(2.0)
    assert rows[2].byte_entropy == pytest.approx(8.0)
    assert len(rows[1].feature) == 8
    assert sum(rows[1].feature) == pytest.approx(1.0)
    # deterministic across runs
    again = {r.media_id: r for r in
             mm.extract_image_features(_media(spark), feature_dim=8).collect()}
    assert again[1].feature == rows[1].feature
    # empty blob: defined output, no crash
    assert rows[5].n_bytes == 0 and rows[5].byte_entropy == 0.0


def test_decode_stub_is_loud():
    with pytest.raises(NotImplementedError):
        mm._decode_image_stub(b"\x89PNG")


def _make_bmp(width, height, px):
    """Build a real uncompressed 24-bit BMP: ``px[y][x] = (r, g, b)``
    (bottom-up row order, rows padded to 4 bytes — the format spec)."""
    import struct

    row_size = ((width * 3 + 3) // 4) * 4
    raster = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            r, g, b = px[y][x]
            row += bytes((b, g, r))
        row += b"\x00" * (row_size - len(row))
        raster += row
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return bytes(header) + bytes(raster)


def _make_ppm(width, height, px):
    raster = bytes(
        c for y in range(height) for x in range(width) for c in px[y][x]
    )
    return f"P6\n# test\n{width} {height}\n255\n".encode() + raster


_PX = [
    [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
    [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
]  # 3x2, mean = (62.5, 67.5, 72.5)


def test_decode_image_bmp_and_ppm_true_dimensions():
    for blob in (_make_bmp(3, 2, _PX), _make_ppm(3, 2, _PX)):
        d = mm.decode_image(blob)
        assert (d["width"], d["height"]) == (3, 2)
        assert d["mean_r"] == pytest.approx(62.5)
        assert d["mean_g"] == pytest.approx(67.5)
        assert d["mean_b"] == pytest.approx(72.5)
    with pytest.raises(NotImplementedError):  # compressed still stubbed
        mm.decode_image(b"\x89PNG\r\n\x1a\n....")


def test_decode_image_features_end_to_end(spark):
    """The full Spark-side decode path: BMP bytes through mapInPandas come
    back with TRUE decoded dimensions (media metadata lies: 640x480) and
    channel means; undecodable formats degrade to decoded=false metadata
    passthrough instead of failing the job."""
    bmp = _make_bmp(3, 2, _PX)
    rows = [
        (1, "image", "image/bmp", bmp, 640, 480, -1),       # metadata is WRONG
        (2, "image", "image/png", b"\x89PNG\r\n\x1a\n", 2048, 1024, -1),
        (3, "video", "video/mp4", b"\x00", 1920, 1080, 3500),
    ]
    media = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    out = {r.media_id: r for r in mm.decode_image_features(media).collect()}
    assert set(out) == {1, 2}  # images only
    assert out[1].decoded and (out[1].width, out[1].height) == (3, 2)
    assert out[1].mean_r == pytest.approx(62.5)
    assert not out[2].decoded  # stubbed format: metadata passthrough
    assert (out[2].width, out[2].height) == (2048, 1024)
    assert out[2].mean_r is None


def test_frame_sample_plan(spark):
    out = mm.frame_sample_plan(_media(spark), every_ms=1000).collect()
    # 3500ms video at 1s cadence -> frames at 0,1000,2000
    assert [(r.media_id, r.frame_ts_ms) for r in out] == [
        (3, 0), (3, 1000), (3, 2000)]


def test_resize_metadata(spark):
    out = {r.media_id: r for r in
           mm.resize_metadata(_media(spark), max_side=512).collect()}
    assert out[1].needs_resize and (out[1].target_width, out[1].target_height) == (512, 384)
    assert out[2].needs_resize and (out[2].target_width, out[2].target_height) == (512, 256)
    assert not out[3].needs_resize or out[3].target_width == 512  # video 1920x1080 -> 512x288
    assert out[5].needs_resize is False  # unknown dims: passthrough
    assert (out[5].target_width, out[5].target_height) == (0, 0)


def _make_wav(rate=8000, n_ch=1, bits=16, samples=None):
    """Build a real RIFF/WAVE PCM file from integer samples."""
    import struct

    samples = samples if samples is not None else [0, 16384, -16384, 0] * 100
    if bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    else:
        data = bytes((s + 128) & 0xFF for s in samples)
    byte_rate = rate * n_ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, byte_rate, n_ch * bits // 8, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_decode_wav_true_features():
    import math

    # constant half-scale amplitude -> rms = 0.5 exactly
    wav = _make_wav(rate=8000, samples=[16384, -16384] * 400)
    d = mm.decode_audio(wav)
    assert d["sample_rate"] == 8000 and d["n_channels"] == 1 and d["bits"] == 16
    assert d["duration_ms"] == 100  # 800 frames at 8 kHz
    assert math.isclose(d["rms"], 0.5, rel_tol=1e-9)
    # non-WAV bytes stay loudly stubbed
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"\x00\x01\x02ID3")


def test_decode_audio_features_end_to_end(spark):
    wav = _make_wav(rate=16000, samples=[8192, -8192] * 160)
    rows = [
        (10, "audio", "audio/wav", wav, -1, -1, -1),
        (11, "audio", "audio/mpeg", b"ID3\x03" + b"\x00" * 64, -1, -1, 7500),
        (12, "image", "image/png", b"\x89PNG", 64, 64, -1),
    ]
    media = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    out = {r.media_id: r for r in mm.decode_audio_features(media).collect()}
    assert set(out) == {10, 11}  # only audio rows cross the Arrow boundary
    assert out[10].decoded and out[10].sample_rate == 16000
    assert out[10].duration_ms == 20  # 320 frames at 16 kHz
    assert out[10].rms == pytest.approx(0.25)
    # stubbed codec: metadata passthrough, flagged undecoded
    assert not out[11].decoded and out[11].duration_ms == 7500
