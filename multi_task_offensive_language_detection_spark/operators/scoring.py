"""Combined Python scoring stage: langid + perplexity + token metrics +
lexicon signals in ONE pandas UDF.

Iterator-type pandas UDFs cannot be fused by Spark's ExtractPythonUDFs
(one UDF per ArrowEvalPython node), so scoring as separate UDFs would
cost one JVM↔Python Arrow round-trip each. This module folds everything
that needs the token stream into a single iterator UDF returning
struct<lang, conf, ppl, n_tokens, rep_tok_ratio, prof_hits, sig> — one
Arrow boundary, all artifacts loaded once per worker (verified in
tests/test_plan_shape.py: the pipeline plan has exactly ONE
ArrowEvalPython node).

Why the lexicon signals live here and not in JVM regexes: each
``\\b(w1|...|wN)\\b`` alternation is a full NFA scan over every row —
four of them (profanity + 3 taxonomy signals) dominated the native
stage's memory traffic. The UDF already flattens and hashes the token
stream for the LM, so lexicon membership is a sorted-array lookup on
hashes it has anyway, plus one C-level ``\\w+`` findall. Semantics are
EXACT: for an all-word-char lexeme, ``\\b(w)\\b`` matches iff ``w``
occurs as a maximal word-char run, which is precisely membership of the
``re.ASCII``-``\\w+`` runs (ASCII flag = Java regex default classes).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lexicons import ENTITY_NOUNS, GROUP_NOUNS, PROFANITY, SECOND_PERSON
from .langid import LangidModel, _MODEL_CACHE as _LANGID_CACHE
from .perplexity import NgramLM, _LM_CACHE

COMBINED_RESULT = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("conf", T.DoubleType()),
        T.StructField("ppl", T.DoubleType()),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("rep_tok_ratio", T.DoubleType()),
        T.StructField("prof_hits", T.IntegerType()),
        T.StructField("sig", T.IntegerType()),
    ]
)

#: sig bitmask (taxonomy targeting signals)
SIG_SECOND_PERSON = 1
SIG_GROUP = 2
SIG_ENTITY = 4

_WORD_RUN = re.compile(r"\w+", re.ASCII)


def _load_langid(path: str) -> LangidModel:
    m = _LANGID_CACHE.get(path)
    if m is None:
        m = _LANGID_CACHE[path] = LangidModel.load(path)
    return m


def _load_lm(path: str) -> NgramLM:
    m = _LM_CACHE.get(path)
    if m is None:
        m = _LM_CACHE[path] = NgramLM.load(path)
    return m


def _hash_lexicon(words: tuple[str, ...]) -> np.ndarray:
    from ..functions.hashing import token_hash_batch

    return np.sort(token_hash_batch(list(words)))


class LexiconSignals:
    """Vectorized whole-word lexicon membership over an Arrow batch."""

    def __init__(self):
        self.prof = _hash_lexicon(PROFANITY)
        self.second = _hash_lexicon(SECOND_PERSON)
        self.group = _hash_lexicon(GROUP_NOUNS)
        self.entity = _hash_lexicon(ENTITY_NOUNS)

    def score(self, texts: list[str]):
        """(prof_hits int32[n], sig int32[n]) for lowercased texts —
        standalone form: builds its own \\w+-run stream."""
        from ..functions.hashing import token_hash_batch

        n = len(texts)
        runs = [_WORD_RUN.findall(t) for t in texts]
        counts = np.fromiter((len(r) for r in runs), dtype=np.int64, count=n)
        flat = [w for r in runs for w in r]
        rows = np.repeat(np.arange(n), counts)
        h = token_hash_batch(flat) if flat else np.empty(0, np.uint64)
        return self._score_hashes(n, h, rows)

    def score_stream(self, n: int, flat: list, h: np.ndarray, rows: np.ndarray, pure: np.ndarray):
        """(prof_hits, sig) reusing an existing WHITESPACE-token stream.

        Maximal \\w-runs never span whitespace, so: a pure-\\w whitespace
        token IS a maximal run (hash membership applies directly); only
        tokens carrying punctuation (rare in normalized transcripts) are
        re-split into runs and re-hashed. Result is exactly equal to
        ``score`` over the joined text."""
        from ..functions.hashing import token_hash_batch

        if len(h) == 0:
            return np.zeros(n, dtype=np.int32), np.zeros(n, dtype=np.int32)
        if pure.all():
            return self._score_hashes(n, h, rows)
        prof_hits, sig = self._score_hashes(n, h[pure], rows[pure])
        impure_idx = np.nonzero(~pure)[0]
        sub_runs = [_WORD_RUN.findall(flat[i]) for i in impure_idx]
        sub_counts = np.fromiter((len(r) for r in sub_runs), dtype=np.int64, count=len(sub_runs))
        sub_flat = [w for r in sub_runs for w in r]
        if sub_flat:
            sub_rows = np.repeat(rows[impure_idx], sub_counts)
            sub_h = token_hash_batch(sub_flat)
            p2, s2 = self._score_hashes(n, sub_h, sub_rows)
            prof_hits += p2
            sig |= s2
        return prof_hits, sig

    def _score_hashes(self, n: int, h: np.ndarray, rows: np.ndarray):
        prof_hits = np.zeros(n, dtype=np.int32)
        sig = np.zeros(n, dtype=np.int32)
        if len(h) == 0:
            return prof_hits, sig
        prof_hits += np.bincount(rows[_member(h, self.prof)], minlength=n).astype(
            np.int32
        )
        for hashes, bit in (
            (self.second, SIG_SECOND_PERSON),
            (self.group, SIG_GROUP),
            (self.entity, SIG_ENTITY),
        ):
            hit_rows = rows[_member(h, hashes)]
            if len(hit_rows):
                mask = np.zeros(n, dtype=bool)
                mask[hit_rows] = True
                sig[mask] |= bit
        return prof_hits, sig


def _member(h: np.ndarray, sorted_hashes: np.ndarray) -> np.ndarray:
    """Boolean membership of h in a small sorted hash array (searchsorted —
    cheaper than np.isin's merge for a ~50-entry lexicon)."""
    idx = np.searchsorted(sorted_hashes, h)
    idx[idx == len(sorted_hashes)] = 0
    return sorted_hashes[idx] == h


_SIGNALS_CACHE: dict[str, LexiconSignals] = {}


def _load_signals() -> LexiconSignals:
    s = _SIGNALS_CACHE.get("x")
    if s is None:
        s = _SIGNALS_CACHE["x"] = LexiconSignals()
    return s


def combined_scores_udf(langid_path: str, lm_path: str):
    """norm_text → struct<lang, conf, ppl, n_tokens, rep_tok_ratio,
    prof_hits, sig> — one input column, one output struct, one Arrow
    boundary. The LM scores the same normalized text langid sees
    (profanity words and lowercased placeholders are in the LM
    vocabulary, so no separate masked column is needed)."""

    @F.pandas_udf(COMBINED_RESULT)
    def _score(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        langid = _load_langid(langid_path)  # once per worker
        lm = _load_lm(lm_path)
        lex = _load_signals()
        for norm_text in it:
            out = langid.score_batch(norm_text)
            ppl, n_tok, rep, stream = lm.ppl_stats_batch(
                norm_text, return_stream=True
            )
            out["ppl"] = ppl
            out["n_tokens"] = n_tok.astype(np.int32)
            out["rep_tok_ratio"] = rep
            # lexicon signals ride the SAME tokenization+hash pass the LM
            # just did (norm_text is already lowercased)
            prof_hits, sig = lex.score_stream(len(norm_text), *stream)
            out["prof_hits"] = prof_hits
            out["sig"] = sig
            yield out

    return _score
