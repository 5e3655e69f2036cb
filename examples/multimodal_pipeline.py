"""Multimodal corpus pipeline on this engine — the driver-brief media
surface end-to-end on synthesized blobs (no media libraries needed):

 1. build a mixed media table (BMP image, WAV audio, AVI video, JPEG header)
 2. decode: true dimensions / sample rates / frame cadence per modality
 3. resize every decodable image to a fixed raw RGB tensor (mapInPandas)
 4. extract real frames from the uncompressed AVI at a sampling cadence
 5. byte-level features (entropy, deterministic fake embedding)

Run: python examples/multimodal_pipeline.py   (read-only; one line per stage)
"""

from __future__ import annotations

import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from soict20221_bigdata_financialplatform_spark import get_spark
from soict20221_bigdata_financialplatform_spark.operators import multimodal as mm
from soict20221_bigdata_financialplatform_spark.plans.linter import assert_scalable


def launch(df):
    """Pre-launch scale gate (r9 VERDICT task 4): every stage frame goes
    through ``assert_scalable`` BEFORE its first action — plan-shape only,
    runs no tasks. The mapInPandas media decoders are Arrow-batched (the
    licensed vectorized escape hatch), so they pass the per-row-UDF rule."""
    assert_scalable(df)
    return df


def _bmp(width, height, rgb):
    row_size = ((width * 3 + 3) // 4) * 4
    row = (bytes(rgb[::-1]) * width) + b"\x00" * (row_size - width * 3)
    raster = row * height
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return header + raster


def _wav(rate, samples):
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _avi(width, height, frames_rgb, us_per_frame=40_000):
    avih = struct.pack("<14I", us_per_frame, 1_000_000, 0, 0, len(frames_rgb),
                       0, 1, 0, width, height, 0, 0, 0, 0)
    chunk = b"avih" + struct.pack("<I", len(avih)) + avih
    hdrl = b"LIST" + struct.pack("<I", 4 + len(chunk)) + b"hdrl" + chunk
    row_size = ((width * 3 + 3) // 4) * 4
    movi = b"movi"
    for rgb in frames_rgb:
        row = (bytes(rgb[::-1]) * width) + b"\x00" * (row_size - width * 3)
        dib = row * height
        movi += b"00db" + struct.pack("<I", len(dib)) + dib
    movi = b"LIST" + struct.pack("<I", len(movi)) + movi
    return b"RIFF" + struct.pack("<I", 4 + len(hdrl) + len(movi)) + b"AVI " + hdrl + movi


def _jpeg(width, height):
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes([3])
    return (b"\xff\xd8" + b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
            + b"\xff\xda\x00\x02" + b"\xff\xd9")


def main() -> None:
    spark = get_spark("multimodal-example")
    spark.sparkContext.setLogLevel("ERROR")
    rows = [
        (1, "image", "image/bmp", _bmp(6, 4, (200, 10, 10)), -1, -1, -1),
        (2, "image", "image/jpeg", _jpeg(4032, 3024), -1, -1, -1),
        (3, "audio", "audio/wav", _wav(8000, [12000, -12000] * 800), -1, -1, -1),
        (4, "video", "video/avi",
         _avi(2, 2, [(255, 0, 0), (0, 255, 0), (0, 0, 255)]), -1, -1, -1),
    ]
    media = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)

    img = {r.media_id: r for r in launch(mm.decode_image_features(media)).collect()}
    print(f"[2] image decode: bmp {img[1].width}x{img[1].height} "
          f"mean_r={img[1].mean_r:.0f}; jpeg header {img[2].width}x{img[2].height}")
    aud = {r.media_id: r for r in launch(mm.decode_audio_features(media)).collect()}
    print(f"[2] audio decode: {aud[3].sample_rate} Hz, "
          f"{aud[3].duration_ms} ms, rms={aud[3].rms:.3f}")
    vid = {r.media_id: r for r in launch(mm.decode_video_features(media)).collect()}
    print(f"[2] video decode: {vid[4].width}x{vid[4].height}, "
          f"{vid[4].n_frames} frames @ {vid[4].fps:.0f} fps")

    resized = {r.media_id: r for r in launch(mm.resize_to_raw(media, side=8)).collect()}
    print(f"[3] resize: bmp -> {len(resized[1].raw_rgb)} raw bytes "
          f"(8x8 RGB); jpeg passthrough decoded={resized[2].decoded}")

    frames = [r for r in launch(mm.extract_frames(media, every_ms=40)).collect()
              if r.media_id == 4]
    print(f"[4] frames: {len(frames)} sampled, first pixel RGB="
          f"{tuple(frames[0].raw_rgb[:3])}")

    feats = {r.media_id: r for r in launch(mm.extract_image_features(media)).collect()}
    print(f"[5] features: entropy(bmp)={feats[1].byte_entropy:.2f}, "
          f"embedding dim={len(feats[1].feature)}")
    print("multimodal pipeline complete")


if __name__ == "__main__":
    main()
