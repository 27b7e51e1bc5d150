"""Image/video binary-column operators — REAL Spark plumbing, REAL image
codecs (multimodal/codecs.py: from-scratch numpy BMP + PPM/PGM parsers,
built the way operators/audio.py built its WAV/µ-law codec). Only the
video frame DEMUXER below remains a clearly-marked stub (no container
demux without ffmpeg); its batch shape and explode semantics are real.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .codecs import decode_image

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
