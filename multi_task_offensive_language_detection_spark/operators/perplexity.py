"""Word-level perplexity gate — KenLM-STYLE, not KenLM (SURVEY.md M4).

Hashed unigram + bigram count tables (dense numpy int64 arrays — the
hashing trick again, no vocab dict) with Stupid Backoff scoring
(Brants et al. 2007, public):

    p(wᵢ | wᵢ₋₁) = c₂(wᵢ₋₁,wᵢ) / c₁(wᵢ₋₁)          if c₂ > 0
                 = λ · c₁(wᵢ) / N                   elif c₁(wᵢ) > 0
                 = λ · P_UNK                        otherwise

    ppl(text)   = exp( − mean log p )

Unigram-heavy backoff is deliberate: the gate must separate "known-word
English" (low ppl even when word ORDER is novel) from pseudo-word
gibberish (unseen unigrams → P_UNK floor → ppl ≥ 10⁶), which is the
quality-filter semantic the north_rule asks for — not next-word modeling.

Trained offline by artifacts_build.py on the engine's English corpus
(includes the scrub placeholder tokens so post-scrub transcripts score
over a fully known vocabulary); shipped as .npz broadcast artifact.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import token_buckets, token_ngram_buckets

UNI_BUCKETS = 1 << 18
BI_BUCKETS = 1 << 20
BACKOFF = 0.4
P_UNK = 1e-9


class NgramLM:
    def __init__(self, uni: np.ndarray, bi: np.ndarray, total: int):
        self.uni = uni
        self.bi = bi
        self.total = total

    @classmethod
    def train(cls, texts: list[str]) -> "NgramLM":
        uni = np.zeros(UNI_BUCKETS, dtype=np.int64)
        bi = np.zeros(BI_BUCKETS, dtype=np.int64)
        total = 0
        for text in texts:
            toks = text.lower().split()
            if not toks:
                continue
            total += len(toks)
            np.add.at(uni, token_buckets(toks, UNI_BUCKETS), 1)
            b2 = token_ngram_buckets(toks, 2, BI_BUCKETS)
            if len(b2):
                np.add.at(bi, b2, 1)
        return cls(uni, bi, total)

    def save(self, path: str) -> None:
        np.savez_compressed(path, uni=self.uni, bi=self.bi, total=np.int64(self.total))

    @classmethod
    def load(cls, path: str) -> "NgramLM":
        z = np.load(path, allow_pickle=False)
        return cls(z["uni"], z["bi"], int(z["total"]))

    def ppl(self, text: str) -> float:
        return float(self.ppl_batch(pd.Series([text])).iloc[0])

    def ppl_batch(self, texts: pd.Series) -> pd.Series:
        ppl, _, _ = self.ppl_stats_batch(texts)
        return pd.Series(ppl, index=texts.index)

    def ppl_stats_batch(self, texts: pd.Series, return_stream: bool = False):
        """Batch Stupid-Backoff perplexity — one vectorized hash pass over
        the flattened token stream of the whole Arrow batch, per-row
        reduction via bincount. No Python loop beyond tokenization.

        Returns ``(ppl, n_tokens, rep_tok_ratio)`` ndarrays: the token
        stream is already flattened and hashed for scoring, so the
        whitespace-token count and the token-repeat ratio
        (1 − distinct/total, distinct by token hash — 16-char-prefix
        exact, see token_hash_batch) fall out of the same pass. The
        pipeline reads them from here instead of paying a second JVM
        split + array_distinct over the same strings.

        With ``return_stream`` a 4th element ``(flat_tokens, hashes,
        row_ids, pure_word_mask)`` is returned so downstream lexicon
        matching (operators/scoring.py) reuses this tokenization+hash
        pass instead of paying its own."""
        from ..functions.hashing import combine_hashes, token_hash_batch_ex

        tok_lists = [str(t).lower().split() for t in texts.fillna("")]
        n_rows = len(tok_lists)
        n_tok = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n_rows)
        flat: list[str] = [t for toks in tok_lists for t in toks]
        if not flat:
            empty = (
                np.full(n_rows, np.inf),
                n_tok,
                np.zeros(n_rows, dtype=np.float64),
            )
            if return_stream:
                return (*empty, (flat, np.empty(0, np.uint64), np.empty(0, np.int64), np.empty(0, bool)))
            return empty
        rows = np.repeat(np.arange(n_rows), n_tok)

        h, pure = token_hash_batch_ex(flat, want_pure=return_stream)
        c1 = self.uni[(h % np.uint64(UNI_BUCKETS)).astype(np.int64)].astype(np.float64)
        p = np.where(c1 > 0, BACKOFF * c1 / self.total, BACKOFF * P_UNK)

        if len(flat) >= 2:
            same_row = rows[:-1] == rows[1:]
            g = combine_hashes(h[:-1], h[1:])
            c2 = self.bi[(g % np.uint64(BI_BUCKETS)).astype(np.int64)].astype(np.float64)
            prev, cur = c1[:-1], c1[1:]
            # cur > 0 guard: a bigram containing an unseen word cannot have
            # been counted — any c2 > 0 there is pure table collision, and
            # without the guard a collision can REWARD corruption
            # (property-tested in test_scoring_properties)
            p_bi = np.where(
                same_row & (c2 > 0) & (prev > 0) & (cur > 0),
                c2 / np.maximum(prev, 1),
                0.0,
            )
            p[1:] = np.maximum(p[1:], p_bi)

        logs = np.log(np.maximum(p, 1e-300))
        sums = np.bincount(rows, weights=logs, minlength=n_rows)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.exp(-sums / np.maximum(n_tok, 1))
        out[n_tok == 0] = np.inf

        # distinct tokens per row from the sorted (row, hash) stream
        order = np.lexsort((h, rows))
        hs, rs = h[order], rows[order]
        first = np.concatenate(([True], (hs[1:] != hs[:-1]) | (rs[1:] != rs[:-1])))
        uniq = np.bincount(rs[first], minlength=n_rows)
        with np.errstate(divide="ignore", invalid="ignore"):
            rep = 1.0 - uniq / n_tok
        rep[n_tok == 0] = 0.0
        if return_stream:
            return out, n_tok, rep, (flat, h, rows, pure)
        return out, n_tok, rep


# --- Spark surface ---------------------------------------------------------

_LM_CACHE: dict[str, NgramLM] = {}


def _load(path: str) -> NgramLM:
    m = _LM_CACHE.get(path)
    if m is None:
        m = _LM_CACHE[path] = NgramLM.load(path)
    return m


def ppl_udf(artifact_path: str):
    @F.pandas_udf(T.DoubleType())
    def _ppl(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        lm = _load(artifact_path)  # once per worker
        for s in it:
            yield lm.ppl_batch(s)

    return _ppl


def with_ppl(df, text_col: str, artifact_path: str, out_col: str = "ppl"):
    return df.withColumn(out_col, ppl_udf(artifact_path)(F.col(text_col)))


def ppl_gate(ppl_col: Column, ppl_max: float) -> Column:
    """P8 — boolean keep-gate."""
    return ppl_col <= ppl_max
