"""Deduplication suite for large-scale training-data curation.

All variants are Spark-native (no Python in the hot path except SimHash's
bit-packing, which is a vectorized pandas UDF):

- exact:        hash-groupBy keep-min-key (deterministic, unlike
                dropDuplicates' arbitrary row pick)
- window:       row_number over xxhash64(text) — the W1 scale form
- n-gram Jaccard: char-shingle arrays + array_intersect/union — exact
                near-dup scoring for candidate pairs
- MinHash+LSH:  shingle → k minhashes (xxhash64 with k seeds, computed
                inside native higher-order functions) → banded bucket
                join → candidate pairs → exact-Jaccard verify.
                Shuffle cost: one explode + one groupBy on (band, hash) —
                no O(n²) anywhere, which is what makes it 100 TB-safe.
- SimHash:      64-bit token-hash majority vote (pandas UDF), hamming
                bucket join on 16-bit chunks.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# --- exact -------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    """Keep the min-key row per exact text value. One hash-agg shuffle;
    map-side partial aggregation applies."""
    return df.groupBy(text_col).agg(F.min(key_col).alias(key_col))


def window_dedup(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    """W1 — row_number over hash(text): keeps whole rows (not just keys).
    Partitioning by the 64-bit hash instead of raw text keeps shuffle keys
    small when texts are long."""
    from pyspark.sql import Window as W

    w = W.partitionBy(F.xxhash64(F.col(text_col))).orderBy(key_col)
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


# --- n-gram shingles (native) -----------------------------------------------


def char_shingles(col: Column, n: int = 3) -> Column:
    """Distinct char n-grams of a string as array<string> (native HOF)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(col) - (n - 1), F.lit(0))),
            lambda i: F.substring(col, i, n),
        )
    )


def jaccard(a: Column, b: Column) -> Column:
    """|A∩B| / |A∪B| over distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    key_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    block_col: str | None = None,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard ≥ threshold. O(n²) per block — ONLY
    for small blocks / verification; the scale path is minhash_lsh_pairs."""
    s = df.select(
        F.col(key_col).alias("k"),
        char_shingles(F.col(text_col), n).alias("sh"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    a, b = s.alias("a"), s.alias("b")
    cond = F.col("a.k") < F.col("b.k")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.k").alias("k1"),
            F.col("b.k").alias("k2"),
            jaccard(F.col("a.sh"), F.col("b.sh")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --- MinHash + LSH (native, scale path) ---------------------------------------


def _seeded_hasher(j: int):
    # single-arg lambda on purpose: a 2-arg lambda would be interpreted by
    # F.transform as the (element, index) form and j would silently bind
    # to the element index instead of the slot seed
    return lambda e: F.xxhash64(F.lit(j), e)


def minhash_signature(hashed_shingles: Column, num_hashes: int = 32) -> Column:
    """array<bigint> of ``num_hashes`` minhashes from PRE-HASHED shingles
    (array<bigint>) — zero Python.

    Higher-order functions are interpreted (no codegen), so hashing the
    shingle STRINGS num_hashes times would dominate. Callers hash the
    strings once into a materialized column (see minhash_lsh_pairs) and
    the hash family here just re-hashes 8-byte longs with per-slot seeds
    (seeded xxhash64 over a base hash is a perfectly good universal
    family) — ~10× less work for the same LSH guarantees."""
    return F.array(
        *[
            F.array_min(F.transform(hashed_shingles, _seeded_hasher(j)))
            for j in range(num_hashes)
        ]
    )


def hashed_shingles(shingles: Column) -> Column:
    """One string-hash pass: array<string> → array<bigint>."""
    return F.transform(shingles, lambda s: F.xxhash64(s))


#: multiplicative-xor family constants for the batched signature
_MINHASH_A = 0x9E3779B97F4A7C15
_MINHASH_MASK = (1 << 64) - 1


def _flat_shingle_hashes(texts: pd.Series, n: int):
    """(unique-shingle uint64 hashes sorted by row, row boundary starts,
    row ids) for a text batch — all numpy, nothing per-shingle crosses the
    Arrow boundary (transferring shingle ARRAYS costs more than computing
    them: 300 small strings/row of serde vs one rolling hash)."""
    from ..functions.hashing import char_ngram_hashes_flat

    tl = [str(t) for t in texts.fillna("")]
    h, rows = char_ngram_hashes_flat(tl, n)
    if len(h) == 0:
        return h, np.empty(0, dtype=np.int64), rows
    # distinct shingles per row: lexsort by (row, hash), drop adjacent dups
    order = np.lexsort((h, rows))
    h, rows = h[order], rows[order]
    keep = np.concatenate(([True], (h[1:] != h[:-1]) | (rows[1:] != rows[:-1])))
    return h[keep], rows[keep], len(tl)


def minhash64_text_udf(n: int = 5):
    """text → 64-slot MinHash signature, fully vectorized per Arrow batch
    (shingling + hashing + per-slot segment-min all in numpy)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            h, rows, n_rows = _flat_shingle_hashes(s, n)
            out = np.full((len(s), 64), np.iinfo(np.int64).max, dtype=np.int64)
            if len(h):
                counts = np.bincount(rows, minlength=n_rows)
                bounds_all = np.concatenate(([0], np.cumsum(counts)))[:-1]
                nonempty = np.nonzero(counts > 0)[0]
                bounds = bounds_all[nonempty]
                with np.errstate(over="ignore"):
                    for j in range(64):
                        mixed = (
                            h * np.uint64((_MINHASH_A * (2 * j + 1)) & _MINHASH_MASK)
                        ) ^ np.uint64((j * 0xC2B2AE3D27D4EB4F) & _MINHASH_MASK)
                        out[nonempty, j] = np.minimum.reduceat(
                            mixed.view(np.int64), bounds
                        )
            yield pd.Series(list(out))

    return _sig


def jaccard_texts_udf(n: int = 5):
    """(text1, text2) → exact distinct-shingle Jaccard, numpy per batch —
    the verify kernel for LSH candidates (pairs are few; shingling both
    sides in numpy beats shipping shingle arrays through Arrow)."""

    @F.pandas_udf(T.DoubleType())
    def _j(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for a, b in it:
            ha, ra, nr = _flat_shingle_hashes(a, n)
            hb, rb, _ = _flat_shingle_hashes(b, n)
            out = np.zeros(len(a), dtype=np.float64)
            ca = np.bincount(ra, minlength=len(a))
            cb = np.bincount(rb, minlength=len(a))
            # per-row set intersection via sorted merge: concat and count dups
            for i in range(len(a)):
                if ca[i] == 0 and cb[i] == 0:
                    continue
                sa = ha[np.searchsorted(ra, i, "left") : np.searchsorted(ra, i, "right")]
                sb = hb[np.searchsorted(rb, i, "left") : np.searchsorted(rb, i, "right")]
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                union = ca[i] + cb[i] - inter
                out[i] = inter / union if union else 0.0
            yield pd.Series(out)

    return _j


def minhash_lsh_pairs(
    df: DataFrame,
    key_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 8,
    verify_threshold: float = 0.5,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH, verified with exact
    shingle Jaccard.

    Plan: narrow minhash projection → explode(bands) [rows ×bands] →
    groupBy(band, band_hash) self-join within buckets → distinct pairs →
    broadcast-free verify join back to shingles. Every stage is bounded by
    bucket sizes, not table size."""
    rows_per_band = num_hashes // bands
    base = df.select(F.col(key_col).alias("k"), F.col(text_col).alias("t"))
    if num_hashes == 64:
        # vectorized numpy shingle+signature: only raw texts cross Arrow
        base = base.withColumn("sig", minhash64_text_udf(n)(F.col("t")))
    else:
        base = (
            base.withColumn("sh", char_shingles(F.col("t"), n))
            .withColumn("hs", hashed_shingles(F.col("sh")))
            .withColumn("sig", minhash_signature(F.col("hs"), num_hashes))
            .drop("hs", "sh")
        )
    # persisted: the banding explode AND the verify join re-read this
    # frame (at table scale: persist to disk / checkpoint the signatures)
    base = base.persist()

    banded = base.select(
        "k",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("k", "bb.band", "bb.bh")

    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.k") < F.col("r.k")),
        )
        .select(F.col("l.k").alias("k1"), F.col("r.k").alias("k2"))
        .distinct()
    )

    txt = base.select(F.col("k"), F.col("t"))
    return (
        cand.join(txt.withColumnsRenamed({"k": "k1", "t": "t1"}), "k1")
        .join(txt.withColumnsRenamed({"k": "k2", "t": "t2"}), "k2")
        .select(
            "k1", "k2", jaccard_texts_udf(n)(F.col("t1"), F.col("t2")).alias("jaccard")
        )
        .filter(F.col("jaccard") >= verify_threshold)
    )


# --- SimHash -------------------------------------------------------------------


@F.pandas_udf(T.LongType())
def simhash64_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """64-bit SimHash over whitespace tokens (vectorized bit majority)."""
    from ..functions.hashing import hash_bytes_u64

    for s in it:
        out = np.zeros(len(s), dtype=np.int64)
        for i, text in enumerate(s.fillna("")):
            toks = str(text).lower().split()
            if not toks:
                continue
            hs = np.array([hash_bytes_u64(t.encode()) for t in toks], dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
            vote = (bits.sum(axis=0) * 2 - len(toks)) > 0
            val = int(np.packbits(vote[::-1]).view(">u8")[0])
            out[i] = val - (1 << 64) if val >= (1 << 63) else val
        yield pd.Series(out)


def simhash_pairs(df: DataFrame, key_col: str, text_col: str, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming, bucketed by
    16-bit chunks (pigeonhole: ≤3 differing bits ⇒ ≥1 of 4 chunks equal)."""
    h = df.select(F.col(key_col).alias("k"), simhash64_udf(F.col(text_col)).alias("sh"))
    chunks = h.select(
        "k",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("sh"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("k", "sh", "cc.chunk", "cc.cv")
    l, r = chunks.alias("l"), chunks.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.cv") == F.col("r.cv"))
            & (F.col("l.k") < F.col("r.k")),
        )
        .select(
            F.col("l.k").alias("k1"),
            F.col("r.k").alias("k2"),
            F.col("l.sh").alias("sh1"),
            F.col("r.sh").alias("sh2"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh1").bitwiseXOR(F.col("sh2")))
    return cand.select("k1", "k2", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# --- embedding near-dup ---------------------------------------------------------


def embedding_neardup_pairs(
    df: DataFrame,
    key_col: str,
    vec_col: str,
    threshold: float = 0.95,
    block_col: str | None = None,
) -> DataFrame:
    """Cosine ≥ threshold pairs. Brute force within blocks (exact); for
    table-scale use similarity.lsh_bucket first and feed buckets here."""
    from ..functions.arrays import cosine

    s = df.select(
        F.col(key_col).alias("k"),
        F.col(vec_col).alias("v"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    a, b = s.alias("a"), s.alias("b")
    cond = F.col("a.k") < F.col("b.k")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.k").alias("k1"),
            F.col("b.k").alias("k2"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
