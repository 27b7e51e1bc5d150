"""Scrub golden-pair generator (FIXTURES.md §3) — template code only,
no engine imports (anti-tautology rule)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import templates as T

PROFANE_SAMPLE = T.INSULTS


def make_scrub_golden(n: int = 300, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed + 3)
    rows = []
    for _ in range(n):
        base = T.CLEAN_SENTENCES[int(rng.integers(0, len(T.CLEAN_SENTENCES)))].split()
        raw_parts, exp_parts, edits = list(base), list(base), 0
        for _ in range(int(rng.integers(0, 4))):
            kind = int(rng.integers(0, 3))
            if kind == 0:
                item, ph = T.PII_ITEMS[int(rng.integers(0, len(T.PII_ITEMS)))]
            elif kind == 1:
                h = T.HANDLES[int(rng.integers(0, len(T.HANDLES)))]
                item, ph = "@" + h, "@USER"
            else:
                item = PROFANE_SAMPLE[int(rng.integers(0, len(PROFANE_SAMPLE)))]
                ph = "<PROFANITY>"
            pos = int(rng.integers(0, len(raw_parts) + 1))
            raw_parts.insert(pos, item)
            exp_parts.insert(pos, ph)
            edits += 1
        rows.append(
            {"raw": " ".join(raw_parts), "expected": " ".join(exp_parts), "n_edits": edits}
        )
    return pd.DataFrame(rows)
