"""F5 — hashtag segmentation (SURVEY.md §2.8).

The reference preprocessed tweets with a dictionary-based hashtag
segmenter (low-confidence feature; the lib is absent in this sandbox), so
this is a from-scratch greedy longest-match segmenter over the engine's
own LM vocabulary:

- ``#CamelCaseTags`` split on case boundaries first (deterministic, no
  dictionary needed);
- lowercase runs are split by greedy longest-prefix match against the
  vocabulary (longest word first, scanning left to right); characters
  that start no vocabulary word accrete into an unknown chunk so the
  output always reassembles to the input tag.

Runs as an Arrow-batched pandas UDF (the dictionary loads once per
worker; no per-row Python at the Spark level). Not SQL-expressible —
driver check is rows-only; goldens live in tests/test_text_ops.py.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HASHTAG_RE = re.compile(r"#(\w+)")
_CAMEL_RE = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z]*|[a-z]+|\d+")


def _default_vocab() -> frozenset[str]:
    from ..artifacts_build import WORDS

    return frozenset(w for ws in WORDS.values() for w in ws)


def dict_split(run: str, vocab: frozenset[str], max_word_len: int) -> list[str]:
    """Greedy longest-prefix split of a lowercase run; unmatched chars
    accrete into 'unknown' chunks so ''.join(result) == run always."""
    out: list[str] = []
    unk = []
    i = 0
    while i < len(run):
        for length in range(min(max_word_len, len(run) - i), 0, -1):
            w = run[i : i + length]
            if w in vocab:
                if unk:
                    out.append("".join(unk))
                    unk = []
                out.append(w)
                i += length
                break
        else:
            unk.append(run[i])
            i += 1
    if unk:
        out.append("".join(unk))
    return out


def segment_tag(tag: str, vocab: frozenset[str], max_word_len: int) -> str:
    """One hashtag body → space-joined words (lowercased)."""
    pieces: list[str] = []
    for m in _CAMEL_RE.finditer(tag):
        p = m.group(0)
        if p.islower():
            pieces.extend(dict_split(p, vocab, max_word_len))
        else:
            pieces.append(p.lower())
    return " ".join(pieces) if pieces else tag.lower()


def segment_hashtags_in_text(text: str, vocab: frozenset[str], max_word_len: int) -> str:
    return _HASHTAG_RE.sub(lambda m: segment_tag(m.group(1), vocab, max_word_len), text)


def hashtag_segment_udf(vocab: frozenset[str] | None = None):
    """text → text with every #hashtag replaced by its segmentation."""

    @F.pandas_udf(T.StringType())
    def _seg(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        v = vocab if vocab is not None else _default_vocab()  # once per worker
        mx = max(map(len, v)) if v else 1
        for s in it:
            # NULL in → NULL out (like the engine's native string ops):
            # compute on fillna("") but restore the null mask afterwards
            out = s.fillna("").map(
                lambda t: segment_hashtags_in_text(str(t), v, mx)
                if "#" in str(t)
                else str(t)
            )
            out[s.isna()] = None
            yield out

    return _seg


def segment_hashtags(col: Column, vocab: frozenset[str] | None = None) -> Column:
    return hashtag_segment_udf(vocab)(col)


def synth_hashtags_col(text_col: str = "text") -> Column:
    """The synthetic-hashtag expression shared by the str_hashtag_segment
    driver check and its pinned-fixture builder
    (tools/build_pinned_oracles.py) — one definition so the check and
    the committed oracle cannot drift apart: one #CamelCase tag plus one
    concatenated tag derived from the document's own text."""
    return F.concat(
        F.lit("#GoodMorning "),
        F.col(text_col),
        F.lit(" #"),
        F.regexp_replace(F.substring(text_col, 1, 24), r"\s+", ""),
    )
