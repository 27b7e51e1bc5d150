"""Multimodal binary-column plumbing: real Spark mechanics, stubbed codecs."""

from __future__ import annotations

from multi_task_offensive_language_detection_spark.multimodal import (
    frame_sample_stub,
    with_image_features,
)


def test_image_features_schema_and_batching(spark):
    df = spark.createDataFrame(
        [(f"c{i}", bytes(range(i % 250)) * 2) for i in range(50)],
        "clip_id string, bytes binary",
    )
    out = with_image_features(df).select("clip_id", "image_meta.*").collect()
    assert len(out) == 50
    for r in out:
        assert r["width"] == 8 and r["height"] == 8 and r["channels"] == 1
        assert 0.0 <= r["mean_intensity"] <= 255.0


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
