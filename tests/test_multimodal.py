"""Multimodal binary columns: real Spark mechanics, real BMP/PPM codecs
(from-scratch numpy parsers — codecs.py); only video demux is stubbed."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from multi_task_offensive_language_detection_spark.multimodal import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    frame_sample_stub,
    with_image_features,
)


def test_bmp_roundtrip_bit_exact():
    rng = np.random.default_rng(7)
    for hw in [(1, 1), (2, 2), (5, 7), (16, 9), (8, 3)]:  # odd widths → row padding
        img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all(), hw


def test_bmp_handcrafted_bytes_decode_exactly():
    # 2×1 24-bit bottom-up BMP written field by field from the spec:
    # pixels (RGB) = (255,0,0), (0,128,64); row 6 B padded to 8
    px = bytes([0, 0, 255, 64, 128, 0, 0, 0])
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 2, 1, 1, 24, 0, len(px), 2835, 2835, 0, 0
    )
    out = decode_bmp(hdr + px)
    assert out.shape == (1, 2, 3)
    assert (out[0, 0] == [255, 0, 0]).all() and (out[0, 1] == [0, 128, 64]).all()
    # top-down variant (negative height)
    hdr2 = struct.pack("<2sIHHI", b"BM", 54 + 16, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, 16, 2835, 2835, 0, 0
    )
    px2 = bytes([1, 2, 3, 4, 5, 6, 0, 0, 7, 8, 9, 10, 11, 12, 0, 0])
    td = decode_bmp(hdr2 + px2)
    assert (td[0, 0] == [3, 2, 1]).all() and (td[1, 1] == [12, 11, 10]).all()


def test_ppm_roundtrip_and_comments():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    gray = rng.integers(0, 256, (3, 2, 1), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(gray)) == gray).all()
    ppm = b"P6\n# a comment\n2 1\n# more\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    assert (decode_ppm(ppm) == np.array([[[1, 2, 3], [4, 5, 6]]], np.uint8)).all()


def test_decode_image_rejects_unknown_magic():
    for bad in (b"\x89PNG....", b"", b"X"):
        with pytest.raises(ValueError):
            decode_image(bad)


def test_image_features_decode_real_images(spark):
    rng = np.random.default_rng(3)
    rows = []
    expected = {}
    for i in range(30):
        h, w = int(rng.integers(1, 12)), int(rng.integers(1, 12))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        data = encode_bmp(img) if i % 2 == 0 else encode_ppm(img)
        rows.append((f"c{i}", data))
        expected[f"c{i}"] = (w, h, float(img.mean()))
    rows.append(("bad", b"not an image"))
    rows.append(("null", None))
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = {r["clip_id"]: r for r in with_image_features(df).select("clip_id", "image_meta.*").collect()}
    assert len(out) == 32
    for cid, (w, h, mean) in expected.items():
        r = out[cid]
        assert r["ok"] and r["width"] == w and r["height"] == h and r["channels"] == 3
        assert abs(r["mean_intensity"] - mean) < 1e-9
    assert not out["bad"]["ok"] and not out["null"]["ok"]


def test_frame_sample_explodes_rows(spark):
    df = spark.createDataFrame(
        [("a", b"x" * 2600), ("b", b"y" * 100), ("c", None)],
        "clip_id string, bytes binary",
    )
    out = frame_sample_stub(df, every_n=2).collect()
    by_clip = {}
    for r in out:
        by_clip.setdefault(r["clip_id"], []).append(r["frame_idx"])
    assert len(by_clip["a"]) == 6  # ceil(2600/256)=11 frames, every 2nd → 6
    assert by_clip["b"] == [0]
    assert "c" not in by_clip
