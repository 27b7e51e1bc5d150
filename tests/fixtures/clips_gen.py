"""Deterministic ``clips`` fixture generator (FIXTURES.md §1) + golden
reference decisions (keep / drop_reason / A-B-C labels / scrubbed text).

Pure template code — NO imports from the engine package. The golden
columns are assigned BY CONSTRUCTION per stratum (each stratum violates
exactly one quality gate, or none), which is what makes them "the
reference's decisions" the engine must independently reproduce.

Audio bytes are encoded with the stdlib ``wave``/``audioop`` path — the
engine decodes with its own numpy codecs, so the SNR invariant is a real
cross-implementation check.
"""

from __future__ import annotations

import io
import wave
from dataclasses import dataclass

import numpy as np
import pandas as pd

from . import templates as T

SEED = 42
CODECS = ("wav-pcm16", "pcm_s16le", "ulaw")
SAMPLE_RATES = (8000, 16000, 44100)
#: samples per clip are capped so fixtures stay small; dur_ms metadata is
#: still log-normal (the skew the salt must defeat) — nothing cross-checks
#: metadata duration against decoded duration.
MAX_SAMPLES = 2000

STRATA = (
    # (name, weight)
    ("clean", 0.26),
    ("pii", 0.08),
    ("off_unt", 0.08),
    ("off_ind", 0.08),
    ("off_grp", 0.08),
    ("off_oth", 0.06),
    ("foreign", 0.12),
    ("gibberish", 0.06),
    ("short", 0.04),
    ("rep_char", 0.04),
    ("rep_tok", 0.04),
    ("caps", 0.04),
    ("toxic", 0.02),
)


@dataclass
class Row:
    transcript: str
    keep: bool
    drop_reason: str | None
    label_a: str
    label_b: str | None
    label_c: str | None
    scrubbed: str
    n_edits: int


def _pick(rng: np.random.Generator, seq):
    return seq[int(rng.integers(0, len(seq)))]


def _clean_text(rng) -> str:
    n = int(rng.integers(1, 3))
    return " ".join(_pick(rng, T.CLEAN_SENTENCES) for _ in range(n))


def _make_row(rng: np.random.Generator, stratum: str) -> Row:
    if stratum == "clean":
        t = _clean_text(rng)
        return Row(t, True, None, "NOT", None, None, t, 0)

    if stratum == "pii":
        base = _pick(rng, T.CLEAN_SENTENCES).split()
        k = int(rng.integers(1, 3))
        raw_parts, exp_parts, edits = list(base), list(base), 0
        for _ in range(k):
            raw, ph = _pick(rng, T.PII_ITEMS)
            pos = int(rng.integers(0, len(raw_parts) + 1))
            raw_parts.insert(pos, raw)
            exp_parts.insert(pos, ph)
            edits += 1
        return Row(
            " ".join(raw_parts), True, None, "NOT", None, None, " ".join(exp_parts), edits
        )

    if stratum in ("off_unt", "off_ind", "off_grp", "off_oth"):
        ins = _pick(rng, T.INSULTS)
        if stratum == "off_unt":
            t = _pick(rng, T.UNT_TEMPLATES).format(ins=ins)
            b, c = "UNT", None
        elif stratum == "off_ind":
            t = _pick(rng, T.IND_TEMPLATES).format(ins=ins, handle=_pick(rng, T.HANDLES))
            b, c = "TIN", "IND"
        elif stratum == "off_grp":
            t = _pick(rng, T.GRP_TEMPLATES).format(ins=ins, grp=_pick(rng, T.GROUP_TARGETS))
            b, c = "TIN", "GRP"
        else:
            t = _pick(rng, T.OTH_TEMPLATES).format(ins=ins, ent=_pick(rng, T.ENTITY_TARGETS))
            b, c = "TIN", "OTH"
        # golden scrub: insult tokens → <PROFANITY>; @handle → @USER.
        scrubbed, edits = t, 0
        for w in sorted(set(t.split())):
            bare = w.lstrip("@")
            if w.startswith("@") and bare in T.HANDLES:
                scrubbed = scrubbed.replace(w, "@USER")
                edits += 1
        for ins_word in T.INSULTS + ("fools", "clowns"):
            n_hits = scrubbed.split().count(ins_word)
            if n_hits:
                scrubbed = " ".join(
                    "<PROFANITY>" if tok == ins_word else tok for tok in scrubbed.split()
                )
                edits += n_hits
        return Row(t, True, None, "OFF", b, c, scrubbed, edits)

    if stratum == "foreign":
        lang = _pick(rng, sorted(T.FOREIGN_WORDS))
        words = T.FOREIGN_WORDS[lang]
        t = " ".join(_pick(rng, words) for _ in range(int(rng.integers(8, 16))))
        return Row(t, False, "langid", "NOT", None, None, t, 0)

    if stratum == "gibberish":
        t = " ".join(_pick(rng, T.PSEUDO_WORDS) for _ in range(int(rng.integers(6, 13))))
        return Row(t, False, "perplexity", "NOT", None, None, t, 0)

    if stratum == "short":
        t = _pick(rng, T.SHORT_TEXTS)
        return Row(t, False, "length", "NOT", None, None, t, 0)

    if stratum == "rep_char":
        t = _pick(
            rng,
            (
                "it was soooooooo good today by the river",
                "we waited tooooooo long near the old house",
                "that was the one yessssss we heard it",
            ),
        )
        return Row(t, False, "repetition", "NOT", None, None, t, 0)

    if stratum == "rep_tok":
        w = _pick(rng, ("again", "more", "really"))
        t = " ".join([w, "and"] * 5 + [w])
        return Row(t, False, "repetition", "NOT", None, None, t, 0)

    if stratum == "caps":
        t = _pick(rng, T.CLEAN_SENTENCES).upper()
        return Row(t, False, "caps", "NOT", None, None, t, 0)

    if stratum == "toxic":
        t = _pick(rng, T.TOXIC_TEMPLATES)
        scrubbed = " ".join(
            "<PROFANITY>" if tok in T.INSULTS + ("fools", "clowns") else tok
            for tok in t.split()
        )
        edits = sum(1 for tok in t.split() if tok in T.INSULTS + ("fools", "clowns"))
        return Row(t, False, "toxicity", "OFF", "UNT", None, scrubbed, edits)

    raise ValueError(stratum)


# --- audio -----------------------------------------------------------------


def synth_waveform(rng: np.random.Generator, n_samples: int) -> np.ndarray:
    """1-3 sinusoids + gaussian noise, float in [-1, 1]."""
    t = np.arange(n_samples, dtype=np.float64)
    x = np.zeros(n_samples)
    for _ in range(int(rng.integers(1, 4))):
        f = rng.uniform(0.01, 0.3)
        x += rng.uniform(0.2, 0.6) * np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
    x += rng.normal(0, 0.01, n_samples)
    peak = np.abs(x).max()
    return x / peak * 0.9 if peak > 0 else x


def encode_audio(wave_f: np.ndarray, codec: str, sr: int) -> bytes:
    """Stdlib/audioop encode path (independent of the engine's numpy path)."""
    import audioop

    pcm16 = np.clip(np.round(wave_f * 32767.0), -32768, 32767).astype("<i2")
    if codec == "pcm_s16le":
        return pcm16.tobytes()
    if codec == "wav-pcm16":
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm16.tobytes())
        return buf.getvalue()
    if codec == "ulaw":
        return audioop.lin2ulaw(pcm16.tobytes(), 2)
    raise ValueError(codec)


# --- table assembly ----------------------------------------------------------


def make_clips(n_rows: int = 2000, rows_per_part: int | None = None, seed: int = SEED,
               with_audio: bool = True) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (clips_df, golden_df). Deterministic for a given (n, seed)."""
    rng = np.random.default_rng(seed)
    rows_per_part = rows_per_part or max(n_rows // 16, 1)
    names = [s for s, _ in STRATA]
    weights = np.array([w for _, w in STRATA])
    weights = weights / weights.sum()
    strata = rng.choice(np.array(names, dtype=object), size=n_rows, p=weights)

    clips, golden = [], []
    for i in range(n_rows):
        r = _make_row(rng, str(strata[i]))
        clip_id = f"clip_{i:012d}"
        sr = int(_pick(rng, SAMPLE_RATES))
        # log-normal duration, 200-30000 ms → the length skew (FIXTURES §1)
        dur_ms = int(np.clip(np.exp(rng.normal(7.2, 1.0)), 200, 30000))
        codec = str(_pick(rng, CODECS))
        if with_audio:
            n_samp = min(int(dur_ms * sr / 1000), MAX_SAMPLES)
            wav = synth_waveform(rng, max(n_samp, 64))
            data = encode_audio(wav, codec, sr)
        else:
            data = None
        clips.append(
            {
                "clip_id": clip_id,
                "bytes": data,
                "sr_hz": sr,
                "dur_ms": dur_ms,
                "codec": codec,
                "transcript": r.transcript,
                "part_id": i // rows_per_part,
            }
        )
        golden.append(
            {
                "clip_id": clip_id,
                "stratum": str(strata[i]),
                "keep": r.keep,
                "drop_reason": r.drop_reason,
                "label_a": r.label_a,
                "label_b": r.label_b,
                "label_c": r.label_c,
                "scrubbed_transcript": r.scrubbed,
                "n_edits": r.n_edits,
            }
        )
    return pd.DataFrame(clips), pd.DataFrame(golden)


def write_clips_parquet(out_dir: str, n_rows: int = 2000, seed: int = SEED) -> tuple[str, str]:
    """Hive-partitioned clips table + golden sidecar parquet."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    clips, golden = make_clips(n_rows=n_rows, seed=seed)
    clips_dir = os.path.join(out_dir, "clips")
    for part_id, grp in clips.groupby("part_id"):
        d = os.path.join(clips_dir, f"part_id={part_id}")
        os.makedirs(d, exist_ok=True)
        tbl = pa.Table.from_pandas(
            grp.drop(columns=["part_id"]), preserve_index=False
        ).cast(
            pa.schema(
                [
                    ("clip_id", pa.string()),
                    ("bytes", pa.binary()),
                    ("sr_hz", pa.int32()),
                    ("dur_ms", pa.int32()),
                    ("codec", pa.string()),
                    ("transcript", pa.string()),
                ]
            )
        )
        pq.write_table(tbl, os.path.join(d, "data.parquet"))
    golden_path = os.path.join(out_dir, "golden.parquet")
    pq.write_table(pa.Table.from_pandas(golden, preserve_index=False), golden_path)
    return clips_dir, golden_path
