"""Image/video binary-column operators — REAL Spark plumbing, REAL
codecs end to end (multimodal/codecs.py: from-scratch numpy BMP +
PPM/PGM image parsers and the RIFF/AVI demuxer, built the way
operators/audio.py built its WAV/µ-law codec). Nothing here is stubbed:
frame sampling demuxes actual uncompressed-DIB AVI payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .codecs import decode_avi, decode_image, encode_bmp

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("ok", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def with_image_features(df: DataFrame, bytes_col: str = "bytes", out_col: str = "image_meta") -> DataFrame:
    """Arrow-batched feature extraction over a binary column: decodes each
    payload with the from-scratch BMP/PPM codec and emits typed metadata.
    Undecodable payloads yield ok=false rows instead of failing the task
    (decode health is aggregated by the audit path, mirroring
    plans/pipeline.audit_audio)."""

    @F.pandas_udf(IMAGE_META_SCHEMA)
    def _features(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for s in it:
            n = len(s)
            ok = np.zeros(n, dtype=bool)
            w = np.zeros(n, dtype=np.int32)
            h = np.zeros(n, dtype=np.int32)
            c = np.zeros(n, dtype=np.int32)
            m = np.zeros(n, dtype=np.float64)
            for i in range(n):
                try:
                    img = decode_image(s.iloc[i])
                except (ValueError, TypeError):
                    continue
                ok[i] = True
                h[i], w[i], c[i] = img.shape
                m[i] = float(img.mean())
            yield pd.DataFrame(
                {"ok": ok, "width": w, "height": h, "channels": c, "mean_intensity": m}
            )

    return df.withColumn(out_col, _features(F.col(bytes_col)))


FRAME_SCHEMA = "clip_id string, frame_idx int, frame_bytes binary"


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling via mapInPandas: demuxes each AVI payload
    with the from-scratch RIFF parser (codecs.decode_avi), keeps every
    ``every_n``-th frame (frame_idx = index in the source stream), and
    re-encodes kept frames as standalone BMP bytes so downstream image
    operators (with_image_features / decode_image) consume them as-is.

    Undecodable or NULL payloads contribute zero rows rather than
    failing the task — decode health belongs to a sampled audit pass,
    mirroring plans/pipeline.audit_audio. mapInPandas (not a scalar
    UDF) because the op changes cardinality: one clip row explodes
    into n_frames/every_n frame rows."""

    def sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for clip_id, data in zip(pdf["clip_id"], pdf["bytes"]):
                if data is None:
                    continue
                try:
                    frames, _meta = decode_avi(bytes(data))
                except (ValueError, TypeError):
                    continue
                for j in range(0, len(frames), every_n):
                    rows.append((clip_id, j, encode_bmp(frames[j])))
            yield pd.DataFrame(rows, columns=["clip_id", "frame_idx", "frame_bytes"])

    return df.select("clip_id", "bytes").mapInPandas(sample, FRAME_SCHEMA)


def synthetic_avi_udf():
    """Deterministic AVI generator for fixtures/checks: geometry and
    frame count are pure functions of an integer id (w = 4 + id%3,
    h = 3 + id%2, n_frames = 3 + id%7, frame j filled with
    (id*31 + j*7) % 256), so a SQL oracle can recompute the demuxed
    frame set and byte geometry without decoding anything. Distributed
    (pandas UDF), unlike a driver-side synthesis loop."""

    @F.pandas_udf(T.BinaryType())
    def _make(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from .codecs import encode_avi

        for ids in it:
            out = []
            for doc_id in ids:
                d = int(doc_id)
                w, h, nf = 4 + d % 3, 3 + d % 2, 3 + d % 7
                frames = [
                    np.full((h, w, 3), (d * 31 + j * 7) % 256, dtype=np.uint8)
                    for j in range(nf)
                ]
                out.append(encode_avi(frames, fps=10))
            yield pd.Series(out)

    return _make


def resize_images(
    df: DataFrame,
    out_h: int,
    out_w: int,
    bytes_col: str = "bytes",
    out_col: str = "resized",
) -> DataFrame:
    """Arrow-batched image resize: decode (BMP/PNM), nearest-neighbor
    resample to (out_h, out_w) with numpy index maps (the standard
    half-pixel-center grid: src = floor((dst + 0.5) * scale)), re-encode
    as BMP. Nearest-neighbor on purpose: it is exactly reproducible in
    integer arithmetic (no resampling-kernel ambiguity across libraries),
    which keeps the byte output deterministic for oracles; a bilinear
    kernel would slot into the same index-map structure. Undecodable
    payloads yield NULL, mirroring with_image_features' ok=false."""

    @F.pandas_udf(T.BinaryType())
    def _resize(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from .codecs import encode_bmp

        for s in it:
            out = []
            for data in s:
                if data is None:
                    out.append(None)
                    continue
                try:
                    img = decode_image(bytes(data))
                except (ValueError, TypeError):
                    out.append(None)
                    continue
                h, w = img.shape[:2]
                ys = np.minimum(
                    ((np.arange(out_h) + 0.5) * (h / out_h)).astype(np.int64), h - 1
                )
                xs = np.minimum(
                    ((np.arange(out_w) + 0.5) * (w / out_w)).astype(np.int64), w - 1
                )
                res = img[ys][:, xs]
                if res.ndim == 2:  # grayscale PGM → 3-channel for BMP
                    res = np.repeat(res[:, :, None], 3, axis=2)
                out.append(encode_bmp(np.ascontiguousarray(res)))
            yield pd.Series(out)

    return df.withColumn(out_col, _resize(F.col(bytes_col)))


def synthetic_bmp_udf():
    """Deterministic BMP generator for fixtures/checks: id → constant
    image of (h, w) = (3 + id%4, 4 + id%5) filled with (id*37) % 256 —
    constant fill makes every downstream pixel statistic (and any
    resample of it) a closed form a SQL oracle can recompute."""

    @F.pandas_udf(T.BinaryType())
    def _make(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from .codecs import encode_bmp

        for ids in it:
            out = []
            for raw_id in ids:
                d = int(raw_id)
                h, w, fill = 3 + d % 4, 4 + d % 5, (d * 37) % 256
                out.append(encode_bmp(np.full((h, w, 3), fill, dtype=np.uint8)))
            yield pd.Series(out)

    return _make
