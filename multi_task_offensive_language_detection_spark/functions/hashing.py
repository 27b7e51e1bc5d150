"""Vectorized n-gram hashing kernels (SURVEY.md F13) — pure numpy.

Shared feature extractor for the langid scorer (char n-grams) and the
perplexity scorer (word n-grams). fastText-style hashing trick: n-grams
are bucketed by a multiplicative rolling hash into a fixed-size table, so
model artifacts are dense numpy arrays that broadcast cheaply to
executors (no vocabulary dictionaries to pickle).

Everything operates on batches (lists/Series of strings) and returns
numpy arrays — these run inside Arrow-batched pandas UDFs only.
"""

from __future__ import annotations

import numpy as np

# FNV-1a-style constants; fixed forever (artifact compatibility).
_H_INIT = np.uint64(0xCBF29CE484222325)
_H_MULT = np.uint64(0x100000001B3)
MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def hash_bytes_u64(data: bytes) -> int:
    """FNV-1a of a byte string → uint64 (scalar; used for keys/fingerprints)."""
    h = int(_H_INIT)
    for b in data:
        h = ((h ^ b) * int(_H_MULT)) & 0xFFFFFFFFFFFFFFFF
    return h


def char_ngram_buckets(text: str, n: int, n_buckets: int) -> np.ndarray:
    """Bucket ids of all char n-grams of ``text`` (vectorized rolling FNV).

    Returns an int64 array of length max(len(text)-n+1, 0).
    """
    if len(text) < n:
        return np.empty(0, dtype=np.int64)
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    h = np.full(len(codes) - n + 1, _H_INIT, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in range(n):
            h = (h ^ codes[k : k + len(h)]) * _H_MULT
    return (h % np.uint64(n_buckets)).astype(np.int64)


def token_ngram_buckets(tokens: list[str], n: int, n_buckets: int) -> np.ndarray:
    """Bucket ids of word n-grams (tokens joined by '\\x1f' then hashed)."""
    if len(tokens) < n:
        return np.empty(0, dtype=np.int64)
    out = np.empty(len(tokens) - n + 1, dtype=np.int64)
    for i in range(len(out)):
        out[i] = hash_bytes_u64("\x1f".join(tokens[i : i + n]).encode()) % n_buckets
    return out


def token_buckets(tokens: list[str], n_buckets: int) -> np.ndarray:
    """Unigram bucket ids."""
    out = np.empty(len(tokens), dtype=np.int64)
    for i, t in enumerate(tokens):
        out[i] = hash_bytes_u64(t.encode()) % n_buckets
    return out
