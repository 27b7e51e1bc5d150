"""Image/video binary-column operators — REAL Spark plumbing, STUBBED codecs.

The decode kernels raise/fake deterministically because no image/audio
libs ship in this container (the audio codec in operators/audio.py is the
fully-real template these follow). Swapping a stub for a real decoder
changes ONLY the marked inner function — schema, batching, and
partitioning stay as tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def decode_image_stub(data: bytes | None) -> np.ndarray:
    """STUB — deterministic fake decode: byte histogram → 8×8×1 'image'.

    Real implementation would be e.g. ``PIL.Image.open(io.BytesIO(data))``;
    raise instead of faking if strictness is preferred::

        raise NotImplementedError("image codec libs absent in this container")
    """
    if not data:
        return np.zeros((8, 8, 1), dtype=np.uint8)
    arr = np.frombuffer(data[:64].ljust(64, b"\0"), dtype=np.uint8)
    return arr.reshape(8, 8, 1)


def with_image_features(df: DataFrame, bytes_col: str = "bytes", out_col: str = "image_meta") -> DataFrame:
    """mapInPandas-shaped feature extraction over a binary column —
    Arrow-batched, artifact-free, schema-typed."""

    @F.pandas_udf(IMAGE_META_SCHEMA)
    def _features(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for s in it:
            n = len(s)
            w = np.zeros(n, dtype=np.int32)
            h = np.zeros(n, dtype=np.int32)
            c = np.zeros(n, dtype=np.int32)
            m = np.zeros(n, dtype=np.float64)
            for i in range(n):
                img = decode_image_stub(s.iloc[i])
                h[i], w[i], c[i] = img.shape
                m[i] = float(img.mean())
            yield pd.DataFrame(
                {"width": w, "height": h, "channels": c, "mean_intensity": m}
            )

    return df.withColumn(out_col, _features(F.col(bytes_col)))


FRAME_SCHEMA = "clip_id string, frame_idx int, frame_bytes binary"


def frame_sample_stub(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling via mapInPandas — STUB slices the raw byte
    stream into fixed-size pseudo-frames (a real impl would demux with
    pyav/ffmpeg); batch shape & explode semantics are the real thing."""

    def sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                data = r["bytes"] or b""
                frames = [data[i : i + 256] for i in range(0, len(data), 256)]
                for j, fb in enumerate(frames[::every_n]):
                    rows.append((r["clip_id"], j, fb))
            yield pd.DataFrame(rows, columns=["clip_id", "frame_idx", "frame_bytes"])

    return df.select("clip_id", "bytes").mapInPandas(sample, FRAME_SCHEMA)
