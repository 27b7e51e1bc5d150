"""Audio decode + SNR invariant (SURVEY.md F19, M6; BASELINE.json:15).

Decodes the ``bytes`` binary column to float32 PCM in [-1, 1] according to
``codec`` ∈ {``wav-pcm16``, ``pcm_s16le``, ``ulaw``} — pure numpy, from
scratch (G.711 µ-law expansion implemented here; the pytest oracle uses the
independent stdlib ``wave``/``audioop`` path, giving real cross-checking).

Exposed two ways:
- ``decode_stats_udf`` — Arrow-batched pandas UDF returning
  struct<ok, n_samples, rms, snr_db_vs_sine> for the sampled audit pass
  (kept OFF the hot filter path so Parquet column pruning never reads the
  huge ``bytes`` column during text scoring — SURVEY.md §4.2).
- ``decode_pcm(bytes, codec)`` — plain numpy function for tests/tools.

Multimodal note: this is the pattern for all opaque-binary payload
columns — multimodal/ applies it to images (from-scratch BMP/PPM codecs)
and video (from-scratch RIFF/AVI demuxer), all pure numpy like this file.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- codecs (pure numpy) ---------------------------------------------------

_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


_ULAW_SEG_ENDS = np.array(
    [0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF], dtype=np.int32
)


def ulaw_encode(pcm16: np.ndarray) -> np.ndarray:
    """G.711 µ-law compression: int16 → uint8, bit-exact with the classic
    CCITT implementation (14-bit domain, arithmetic >>2 BEFORE magnitude —
    that floor on negatives is why a naive abs-first version is off by one
    code for some negative inputs)."""
    x = pcm16.astype(np.int32) >> 2
    mask = np.where(x < 0, 0x7F, 0xFF)
    x = np.minimum(np.abs(x), 8159) + 33
    seg = np.searchsorted(_ULAW_SEG_ENDS, x, side="left")
    uval = (seg << 4) | ((x >> (seg + 1)) & 0x0F)
    return (np.where(seg >= 8, 0x7F, uval) ^ mask).astype(np.uint8)


def ulaw_decode(u8: np.ndarray) -> np.ndarray:
    """G.711 µ-law expansion: uint8 → int16 (vectorized)."""
    u = ~u8.astype(np.int32) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    x = (((mant << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    return np.where(sign, -x, x).astype(np.int16)


def _parse_wav(data: bytes) -> np.ndarray:
    """Minimal RIFF/WAVE PCM16 parser (mono/stereo), no stdlib wave."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt_ok = False
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt = int.from_bytes(body[0:2], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported wav fmt={audio_fmt} bits={bits}")
            fmt_ok = True
        elif cid == b"data":
            if not fmt_ok:
                raise ValueError("data chunk before fmt")
            return np.frombuffer(body[: size - (size % 2)], dtype="<i2")
        pos += 8 + size + (size % 2)
    raise ValueError("no data chunk")


def decode_pcm(data: bytes | None, codec: str | None) -> np.ndarray:
    """bytes + codec → float32 PCM in [-1, 1]."""
    if data is None or codec is None:
        return np.empty(0, dtype=np.float32)
    if codec == "pcm_s16le":
        pcm = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2")
    elif codec == "wav-pcm16":
        pcm = _parse_wav(data)
    elif codec == "ulaw":
        pcm = ulaw_decode(np.frombuffer(data, dtype=np.uint8))
    else:
        raise ValueError(f"unknown codec {codec!r}")
    return pcm.astype(np.float32) / 32768.0


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """10·log10(Σref² / Σ(ref−test)²); inf when identical."""
    n = min(len(ref), len(test))
    if n == 0:
        return float("-inf")
    ref, test = ref[:n].astype(np.float64), test[:n].astype(np.float64)
    noise = float(np.sum((ref - test) ** 2))
    sig = float(np.sum(ref**2))
    if noise == 0.0:
        return float("inf")
    if sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(sig / noise)


# --- Spark surface ---------------------------------------------------------

DECODE_STATS = T.StructType(
    [
        T.StructField("ok", T.BooleanType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("dur_ms_decoded", T.DoubleType()),
    ]
)


@F.pandas_udf(DECODE_STATS)
def decode_stats_udf(
    it: Iterator[tuple[pd.Series, pd.Series, pd.Series]],
) -> Iterator[pd.DataFrame]:
    """(bytes, codec, sr_hz) → decode stats struct; Arrow-batched."""
    for data, codec, sr in it:
        n = len(data)
        ok = np.zeros(n, dtype=bool)
        ns = np.zeros(n, dtype=np.int32)
        rms = np.full(n, np.nan)
        dur = np.full(n, np.nan)
        for i in range(n):
            try:
                pcm = decode_pcm(data.iloc[i], codec.iloc[i])
                ok[i] = len(pcm) > 0
                ns[i] = len(pcm)
                if len(pcm):
                    rms[i] = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2)))
                    s = sr.iloc[i]
                    if s and s > 0:
                        dur[i] = 1000.0 * len(pcm) / float(s)
            except (ValueError, IndexError):
                pass
        yield pd.DataFrame({"ok": ok, "n_samples": ns, "rms": rms, "dur_ms_decoded": dur})


def with_audio_stats(df, out_col: str = "audio"):
    """Attach decode stats. Run on a SAMPLED slice in production audits —
    touching ``bytes`` defeats column pruning on the text hot path."""
    return df.withColumn(out_col, decode_stats_udf("bytes", "codec", "sr_hz"))


def synthetic_pcm_udf(sr_hz: int = 16000):
    """Deterministic audio generator for fixtures/checks: given an
    integer id, emits a ±A square wave with A = 1024·2^(id%3) (a power
    of two, so A/32768 — and therefore the decoded RMS — is exactly
    representable in binary floating point) over n = 800 + (id%5)·160
    samples (divisible by 16, so dur_ms = n/16 is exact at 16 kHz).
    Even ids are raw pcm_s16le payloads, odd ids minimal RIFF/WAVE
    files — both decode paths exercised. The closed forms make the
    decode stats SQL-derivable (checks.audio_decode_stats)."""

    @F.pandas_udf(T.BinaryType())
    def _make(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            out = []
            for raw_id in ids:
                d = int(raw_id)
                n = 800 + (d % 5) * 160
                amp = 1024 << (d % 3)
                pcm = np.empty(n, dtype=np.int16)
                pcm[0::2] = amp
                pcm[1::2] = -amp
                payload = pcm.tobytes()
                if d % 2 == 1:  # wrap in a minimal 44-byte WAV header
                    hdr = (
                        b"RIFF"
                        + (36 + len(payload)).to_bytes(4, "little")
                        + b"WAVEfmt "
                        + (16).to_bytes(4, "little")
                        + (1).to_bytes(2, "little")   # PCM
                        + (1).to_bytes(2, "little")   # mono
                        + sr_hz.to_bytes(4, "little")
                        + (sr_hz * 2).to_bytes(4, "little")
                        + (2).to_bytes(2, "little")
                        + (16).to_bytes(2, "little")
                        + b"data"
                        + len(payload).to_bytes(4, "little")
                    )
                    payload = hdr + payload
                out.append(payload)
            yield pd.Series(out)

    return _make


RESAMPLE_RESULT = T.StructType(
    [
        T.StructField("bytes", T.BinaryType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
    ]
)


def resample_udf(target_sr: int):
    """(bytes, codec, sr_hz) → struct<bytes, sr_hz, n_samples>: decode by
    codec, linearly interpolate onto the target rate's sample grid
    (np.interp over sample times — the deterministic, library-free
    resampler; a windowed-sinc kernel would slot into the same shape),
    re-encode as raw pcm_s16le. The standard corpus-normalization step
    (e.g. everything → 16 kHz mono) ahead of feature extraction.
    Undecodable or NULL payloads yield a sentinel struct — bytes NULL,
    sr_hz=target, n_samples=0 (branch on ``bytes IS NULL``)."""

    @F.pandas_udf(RESAMPLE_RESULT)
    def _rs(
        it: Iterator[tuple[pd.Series, pd.Series, pd.Series]],
    ) -> Iterator[pd.DataFrame]:
        for data, codec, sr in it:
            n = len(data)
            out_b: list = [None] * n
            out_sr = np.full(n, target_sr, dtype=np.int32)
            out_n = np.zeros(n, dtype=np.int32)
            for i in range(n):
                try:
                    src_sr = int(sr.iloc[i])
                    if data.iloc[i] is None or src_sr <= 0:
                        continue
                    pcm = decode_pcm(data.iloc[i], codec.iloc[i])
                except (ValueError, IndexError, TypeError):
                    continue
                if len(pcm) == 0:
                    continue
                n_out = max(int(round(len(pcm) * target_sr / src_sr)), 1)
                t_out = np.arange(n_out, dtype=np.float64) * (src_sr / target_sr)
                res = np.interp(t_out, np.arange(len(pcm), dtype=np.float64), pcm)
                q = np.clip(np.rint(res * 32768.0), -32768, 32767).astype(np.int16)
                out_b[i] = q.tobytes()
                out_n[i] = n_out
            yield pd.DataFrame(
                {"bytes": out_b, "sr_hz": out_sr, "n_samples": out_n}
            )

    return _rs


def resample_clips(df, target_sr: int, out_col: str = "audio_rs"):
    """Attach the resampled payload; downstream decode uses codec
    'pcm_s16le' with the new sr_hz."""
    return df.withColumn(out_col, resample_udf(target_sr)("bytes", "codec", "sr_hz"))
