"""OLID-shaped golden fixture (FIXTURES.md §2) — pinned reference labels.

13,240-row-shaped train stratum + 860-row-shaped test stratum following
the published OLID label distribution (Zampieri et al. 2019,
arXiv:1902.09666): A ≈ 1:2 OFF:NOT; B TIN≫UNT (≈3876:524 of OFF);
C ≈ 2407:1074:395 IND:GRP:OTH of TIN. Split by hash-mod on id, not
random (SURVEY.md U2). No engine imports (anti-tautology rule)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import templates as T

SEED = 42
N_TOTAL = 14100  # 13240-shaped train + 860-shaped test via id-mod split


def _pick(rng, seq):
    return seq[int(rng.integers(0, len(seq)))]


def _make(rng: np.random.Generator):
    """One (transcript, a, b, c) following the OLID hierarchy."""
    u = rng.random()
    if u < 2 / 3:  # NOT
        n = int(rng.integers(1, 3))
        t = " ".join(_pick(rng, T.CLEAN_SENTENCES) for _ in range(n))
        return t, "NOT", None, None
    ins = _pick(rng, T.INSULTS)
    v = rng.random()
    if v < 524 / 4400:  # UNT
        return _pick(rng, T.UNT_TEMPLATES).format(ins=ins), "OFF", "UNT", None
    w = rng.random()
    if w < 2407 / 3876:
        t = _pick(rng, T.IND_TEMPLATES).format(ins=ins, handle=_pick(rng, T.HANDLES))
        return t, "OFF", "TIN", "IND"
    if w < (2407 + 1074) / 3876:
        t = _pick(rng, T.GRP_TEMPLATES).format(ins=ins, grp=_pick(rng, T.GROUP_TARGETS))
        return t, "OFF", "TIN", "GRP"
    t = _pick(rng, T.OTH_TEMPLATES).format(ins=ins, ent=_pick(rng, T.ENTITY_TARGETS))
    return t, "OFF", "TIN", "OTH"


def make_olid(n: int = N_TOTAL, seed: int = SEED) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 11)
    rows = []
    for i in range(n):
        t, a, b, c = _make(rng)
        rows.append(
            {
                "id": f"olid_{i:08d}",
                "transcript": t,
                "subtask_a": a,
                "subtask_b": b,
                "subtask_c": c,
                # deterministic mod split: ~1/16 test ≈ the 860-row stratum
                "split": "test" if i % 16 == 7 else "train",
            }
        )
    return pd.DataFrame(rows)
