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
                Shuffle cost: one explode + one groupBy on (band, hash);
                shingle-less texts are excluded and degenerate buckets
                capped (with stats accounting), so candidate volume is
                bounded by max_bucket_size — no O(n²) anywhere, which is
                what makes it 100 TB-safe.
- SimHash:      64-bit token-hash majority vote (pandas UDF), hamming
                bucket join on (m−h)-chunk combination keys (multi-index
                pigeonhole — bucket space tunable via num_chunks) with
                the same bucket cap.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
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
    """Distinct char n-grams of a string as array<string> (native HOF).

    Texts shorter than ``n`` yield an EMPTY array — the explicit guard
    matters because ``sequence(1, 0)`` in Spark is the descending
    ``[1, 0]``, not empty, which would silently give every short text the
    whole-text pseudo-shingle (and any two empty strings Jaccard 1.0)."""
    return F.when(
        F.length(col) < n, F.array().cast("array<string>")
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(col) - (n - 1)),
                lambda i: F.substring(col, i, n),
            )
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
    allow_unblocked_rows: int = 100_000,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard ≥ threshold. O(n²) per block — ONLY
    for small blocks / verification; the scale path is minhash_lsh_pairs.

    Guardrail: without ``block_col`` the self-join is a full cartesian, so
    the unblocked form refuses inputs larger than ``allow_unblocked_rows``
    (the check is one cheap count; at table scale you must block)."""
    if block_col is None:
        n_rows = df.count()
        if n_rows > allow_unblocked_rows:
            raise ValueError(
                f"ngram_jaccard_pairs without block_col is O(n^2): got "
                f"{n_rows} rows > allow_unblocked_rows={allow_unblocked_rows}. "
                "Pass block_col (or use minhash_lsh_pairs, the scale path)."
            )
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
    """(unique-shingle uint64 hashes sorted by row, row ids, row count)
    for a text batch — all numpy. Shingle STRINGS never cross Arrow
    (300 small strings/row of serde vs one rolling hash); the compact
    int64 HASH arrays do cross once per document in
    minhash64_features_udf, which is what lets verify run JVM-side
    instead of re-shingling texts per candidate pair."""
    from ..functions.hashing import char_ngram_hashes_flat

    tl = [str(t) for t in texts.fillna("")]
    h, rows = char_ngram_hashes_flat(tl, n)
    if len(h) == 0:
        # keep the (hashes, rows, nrows) contract: the row count goes in
        # the THIRD slot (an all-short/empty batch otherwise fed the empty
        # rows ndarray to np.full((nrows, 64), ...) in the callers)
        return h, rows, len(tl)
    # distinct shingles per row: lexsort by (row, hash), drop adjacent dups
    order = np.lexsort((h, rows))
    h, rows = h[order], rows[order]
    keep = np.concatenate(([True], (h[1:] != h[:-1]) | (rows[1:] != rows[:-1])))
    return h[keep], rows[keep], len(tl)


def minhash64_text_udf(n: int = 5):
    """text → 64-slot MinHash signature, fully vectorized per Arrow batch
    (shingling + hashing + per-slot segment-min all in numpy).

    Works on the RAW (non-deduped) shingle-hash stream — the min of a
    multiset equals the min of its distinct values. No longer on the hot
    path (the LSH base computes sig + sh together in
    minhash64_features_udf, whose signature comes from the DEDUPED
    stream); kept as the independent reference kernel pinning that the
    dedup changes nothing about signatures
    (tests/test_dedup_similarity.py cross-kernel equivalence)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from ..functions.hashing import char_ngram_hashes_flat

        for s in it:
            tl = [str(t) for t in s.fillna("")]
            h, rows = char_ngram_hashes_flat(tl, n)
            out = np.full((len(s), 64), np.iinfo(np.int64).max, dtype=np.int64)
            if len(h):
                counts = np.bincount(rows, minlength=len(tl))
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


LSH_FEATURES = T.StructType(
    [
        T.StructField("sig", T.ArrayType(T.LongType())),
        T.StructField("sh", T.ArrayType(T.LongType())),
    ]
)


def minhash64_features_udf(n: int = 5):
    """text → struct<sig: 64-slot MinHash signature, sh: per-row DISTINCT
    sorted shingle hashes> in ONE Arrow pass (iterator pandas UDFs are
    never fused by Catalyst, so emitting both from one UDF is what keeps
    the LSH base a single Python stage).

    The signature is computed FROM the deduped stream — the min of a
    multiset equals the min of its distinct values, so dedup changes
    nothing about the signature — and the lexsort the distinct arrays
    need is thereby shared with them. Emitting ``sh`` (int64 view of the
    rolling hashes) is what lets the VERIFY step run entirely JVM-side
    (array_intersect/array_union set ops): each document is shingled
    exactly ONCE here instead of once per candidate pair in a Python
    re-shingle kernel — measured 4-6× faster verify at sf0.1 (118k
    candidate pairs: 3.0-5.2s Arrow text-verify vs 0.77s JVM set ops),
    and the asymptotic win grows with candidate fan-out at 100 TB."""

    @F.pandas_udf(LSH_FEATURES)
    def _feat(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for s in it:
            h, rows, nrows = _flat_shingle_hashes(s, n)
            sig = np.full((nrows, 64), np.iinfo(np.int64).max, dtype=np.int64)
            if len(h):
                counts = np.bincount(rows, minlength=nrows)
                bounds_all = np.concatenate(([0], np.cumsum(counts)))[:-1]
                nonempty = np.nonzero(counts > 0)[0]
                bounds = bounds_all[nonempty]
                with np.errstate(over="ignore"):
                    for j in range(64):
                        mixed = (
                            h * np.uint64((_MINHASH_A * (2 * j + 1)) & _MINHASH_MASK)
                        ) ^ np.uint64((j * 0xC2B2AE3D27D4EB4F) & _MINHASH_MASK)
                        sig[nonempty, j] = np.minimum.reduceat(
                            mixed.view(np.int64), bounds
                        )
                sh_list = np.split(h.view(np.int64), np.cumsum(counts)[:-1])
            else:
                sh_list = [np.empty(0, dtype=np.int64)] * nrows
            yield pd.DataFrame({"sig": list(sig), "sh": sh_list})

    return _feat


LSH_BAND_FEATURES = T.StructType(
    [
        T.StructField("bhs", T.ArrayType(T.LongType())),
        T.StructField("sh", T.ArrayType(T.LongType())),
    ]
)


def minhash64_band_features_udf(n: int = 5, bands: int = 8):
    """text → struct<bhs: per-band bucket hashes, sh: DISTINCT shingle
    hashes (unsigned-64 sort order, int64 view)> in ONE Arrow pass.

    r7: the 64-slot signature never leaves Python. Its ONLY consumer was
    the JVM banding expression ``xxhash64(sig[b*r], ..., sig[b*r+r-1])``
    — an 8-struct array explode whose whole-stage codegen compiled to two
    ~81 KB Janino classes (one per consumer pipeline of the banded rows)
    and dominated the query's first-run wall (~22 s of compile at sf0.1,
    measured codegen-on vs codegen-off). Computing the band hashes here
    with the vectorized Spark-exact XXH64 chain
    (functions.hashing.xxhash64_longs, pinned bit-equal to F.xxhash64)
    emits 8 longs/row instead of 64, shrinks the persisted frame and the
    banding explode to a trivial posexplode, and keeps every downstream
    (band, bh) value BIT-IDENTICAL to the former JVM expression —
    pinned by tests/test_dedup_similarity.py banded-rows equality."""
    if 64 % bands:
        raise ValueError(f"bands={bands} must divide 64")
    rows_per_band = 64 // bands

    @F.pandas_udf(LSH_BAND_FEATURES)
    def _feat(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        from ..functions.hashing import xxhash64_longs

        for s in it:
            h, rows, nrows = _flat_shingle_hashes(s, n)
            sig = np.full((nrows, 64), np.iinfo(np.int64).max, dtype=np.int64)
            if len(h):
                counts = np.bincount(rows, minlength=nrows)
                bounds_all = np.concatenate(([0], np.cumsum(counts)))[:-1]
                nonempty = np.nonzero(counts > 0)[0]
                bounds = bounds_all[nonempty]
                with np.errstate(over="ignore"):
                    for j in range(64):
                        mixed = (
                            h * np.uint64((_MINHASH_A * (2 * j + 1)) & _MINHASH_MASK)
                        ) ^ np.uint64((j * 0xC2B2AE3D27D4EB4F) & _MINHASH_MASK)
                        sig[nonempty, j] = np.minimum.reduceat(
                            mixed.view(np.int64), bounds
                        )
                sh_list = np.split(h.view(np.int64), np.cumsum(counts)[:-1])
            else:
                sh_list = [np.empty(0, dtype=np.int64)] * nrows
            sig_u = sig.view(np.uint64)
            bhs = np.empty((nrows, bands), dtype=np.int64)
            for b in range(bands):
                bhs[:, b] = xxhash64_longs(
                    [sig_u[:, b * rows_per_band + r] for r in range(rows_per_band)]
                ).view(np.int64)
            yield pd.DataFrame({"bhs": list(bhs), "sh": sh_list})

    return _feat


def sh_jaccard(sh1: Column, sh2: Column) -> Column:
    """Exact distinct-shingle Jaccard of two precomputed hash arrays,
    pure JVM (array_intersect is a hash-set membership pass — O(n+m),
    whole-stage-codegen, no Python worker in the verify path). int/int
    division promotes to double, bit-identical to the numpy kernel's
    float64 division of the same exact integers (pinned by
    tests/test_dedup_similarity.py cross-kernel equivalence)."""
    inter = F.size(F.array_intersect(sh1, sh2))
    union = F.size(sh1) + F.size(sh2) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def jaccard_texts_udf(n: int = 5):
    """(text1, text2) → exact distinct-shingle Jaccard, numpy per batch —
    the INDEPENDENT reference kernel for the JVM set-op verify
    (sh_jaccard): re-shingles both sides from raw text, sharing nothing
    with the array path, so the cross-kernel equivalence test pins the
    whole features→set-ops chain. No longer on the hot path — verify
    joins precomputed ``sh`` arrays instead of re-shingling each text
    once per candidate pair.

    Fully vectorized: both sides' per-row-distinct shingle hashes are
    concatenated as (row, hash) pairs and lexsorted once — a (row, hash)
    appearing twice means both sides contain it, so the per-row
    intersection is one bincount over adjacent-duplicate positions. No
    per-row Python loop (the old row-loop at ~0.5 ms/pair dominated the
    whole LSH job once candidates landed on few tasks)."""

    @F.pandas_udf(T.DoubleType())
    def _j(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for a, b in it:
            ha, ra, _ = _flat_shingle_hashes(a, n)
            hb, rb, _ = _flat_shingle_hashes(b, n)
            ca = np.bincount(ra, minlength=len(a))
            cb = np.bincount(rb, minlength=len(a))
            rows = np.concatenate([ra, rb])
            hs = np.concatenate([ha, hb])
            order = np.lexsort((hs, rows))
            rs, hh = rows[order], hs[order]
            dup = (rs[1:] == rs[:-1]) & (hh[1:] == hh[:-1])
            inter = np.bincount(rs[1:][dup], minlength=len(a))
            union = ca + cb - inter
            with np.errstate(divide="ignore", invalid="ignore"):
                out = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
            yield pd.Series(out)

    return _j


def _underpartitioned(df: DataFrame) -> bool:
    """True when the frame's scan has fewer input files than cores.

    Partitioning is a pure performance decision here (the pair set is
    partition-invariant), so a cheap proxy beats the exact probe: r7
    replaced ``df.rdd.getNumPartitions()`` — which builds the full
    physical plan + RDD DAG on the driver, ~0.1 s per fresh DataFrame —
    with ``inputFiles()`` (a cached file listing, ~ms). Each input file
    yields at least one scan partition, so n_files ≥ cores means the UDF
    stage is already spread; the rare huge-files-few-of-them layout
    takes one unnecessary keyed shuffle, which is the safe direction."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        return len(df.inputFiles()) < target
    except Exception:  # non-file source — fall back to the exact probe
        return df.rdd.getNumPartitions() < target


def _lsh_base(df: DataFrame, key_col: str, text_col: str, n: int, num_hashes: int) -> DataFrame:
    """(k, t, sig, sh) projection for the LSH path — signature for the
    banding, distinct shingle-hash array for the JVM verify (each doc is
    shingled ONCE; the verify join never re-shingles). Texts with no
    n-shingles are excluded here — see minhash_lsh_pairs docstring."""
    base = df.select(F.col(key_col).alias("k"), F.col(text_col).alias("t")).filter(
        F.length(F.col("t")) >= F.lit(n)
    )
    # The signature UDF is the compute-heavy stage: spread it over every
    # core when the source arrives under-partitioned (one small parquet
    # file = one task would serialize the whole corpus through a single
    # Python worker). Keyed repartition, so the shuffle is deterministic;
    # a well-partitioned 100 TB source skips this branch entirely.
    if _underpartitioned(base):
        base = base.repartition(
            df.sparkSession.sparkContext.defaultParallelism, F.col("k")
        )
    if num_hashes == 64:
        # vectorized numpy shingle+signature+distinct-hash array, ONE
        # Arrow stage: only raw texts cross into Python, sig + sh come
        # back (field projection of one UDF struct — no re-evaluation)
        feat = base.withColumn("_feat", minhash64_features_udf(n)(F.col("t")))
        return feat.select(
            "k",
            "t",
            F.col("_feat.sig").alias("sig"),
            F.col("_feat.sh").alias("sh"),
        )
    # generic-width path: JVM shingles; sh lives in the xxhash64 space
    # here (vs the rolling-hash space of the 64 path) — Jaccard over
    # distinct hashes is hash-space-invariant up to negligible collisions
    return (
        base.withColumn("shst", char_shingles(F.col("t"), n))
        .withColumn("hs", hashed_shingles(F.col("shst")))
        .withColumn("sig", minhash_signature(F.col("hs"), num_hashes))
        .withColumn("sh", F.array_distinct(F.col("hs")))
        .drop("hs", "shst")
    )


def _lsh_base_banded(
    df: DataFrame, key_col: str, text_col: str, n: int, num_hashes: int, bands: int
) -> DataFrame:
    """(k, t, bhs, sh) projection for the LSH path: per-band bucket
    hashes (array<bigint>, ``bands`` entries) + distinct shingle-hash
    array, the signature itself consumed internally. The 64-hash path
    computes the band hashes inside the Arrow kernel (see
    minhash64_band_features_udf — kills the two ~81 KB banding codegen
    classes and shrinks what crosses Arrow from 64 to ``bands`` longs per
    row); the generic-width path keeps the JVM expression. (band, bh)
    values are identical either way."""
    rows_per_band = num_hashes // bands
    if num_hashes == 64:
        base = df.select(F.col(key_col).alias("k"), F.col(text_col).alias("t")).filter(
            F.length(F.col(text_col)) >= F.lit(n)
        )
        if _underpartitioned(base):
            base = base.repartition(
                df.sparkSession.sparkContext.defaultParallelism, F.col("k")
            )
        feat = base.withColumn("_feat", minhash64_band_features_udf(n, bands)(F.col("t")))
        return feat.select(
            "k",
            "t",
            F.col("_feat.bhs").alias("bhs"),
            F.col("_feat.sh").alias("sh"),
        )
    sig = _lsh_base(df, key_col, text_col, n, num_hashes)
    return sig.select(
        "k",
        "t",
        F.array(
            *[
                F.xxhash64(
                    *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                )
                for b in range(bands)
            ]
        ).alias("bhs"),
        "sh",
    )


def _lsh_banded_bhs(base: DataFrame) -> DataFrame:
    """(k, band, bh) explode of a precomputed band-hash frame — a plain
    posexplode, codegen-trivial (the band hash chain already ran)."""
    return base.select("k", F.posexplode("bhs").alias("band", "bh"))


def _drop_oversized_buckets(df: DataFrame, keys: list[str], cap: int) -> DataFrame:
    """Remove rows whose (keys) group exceeds ``cap`` rows, via
    count-aggregate → broadcast anti-join. The aggregate is map-side
    partial (small (keys, count) shuffle); the oversized-group list is
    tiny by construction, so the anti-join broadcasts and the data rows
    are never sorted or re-shuffled for the cap itself."""
    over = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .filter(F.col("_bsz") > cap)
        .drop("_bsz")
    )
    return df.join(F.broadcast(over), keys, "left_anti")


def _capped_buckets_one_exchange(df: DataFrame, keys: list[str], cap: int) -> DataFrame:
    """Same result as ``_drop_oversized_buckets`` but with the bucketed
    rows shuffled exactly ONCE (guide §2.4: two operations keyed the
    same way share one exchange): repartition by ``keys`` up front, so
    the oversized-bucket count-aggregate and every downstream
    groupBy(keys) consume the SAME exchange (ReusedExchange) instead of
    each paying its own shuffle of the banded rows. The broadcast
    anti-join preserves the streamed side's partitioning, so a
    following groupBy(keys) plans with no exchange at all.

    r7 A/B at sf1.0 (fresh JVMs, interleaved): the two-exchange shape
    medianed 6.2-6.5s inside the minhash headline query, this shape
    4.3-4.7s — and the OOM guard is unchanged: over-cap buckets are
    dropped BEFORE any per-bucket array materializes."""
    df = df.repartition(*keys)
    over = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .filter(F.col("_bsz") > cap)
        .drop("_bsz")
    )
    return df.join(F.broadcast(over), keys, "left_anti")


#: one live persisted frame per LSH operator (r6 verdict #4): the
#: operators return LAZY results, so no caller can know when their
#: internal cache is releasable — but by the time the SAME operator runs
#: again in a process, the previous invocation's plan is either consumed
#: or abandoned. Swapping on entry bounds the cache footprint at one
#: frame per operator instead of one per call (the r6 leak: three bench
#: runs stacked three cached copies of (k, sig, sh)).
_ACTIVE_CACHES: dict[str, DataFrame] = {}


def _swap_persist(df: DataFrame, slot: str) -> DataFrame:
    """Persist ``df``, releasing the slot's previous cache, and
    MATERIALIZE it eagerly before returning.

    The eager count matters as much as the persist (r7, event-log
    diagnosis): the LSH operators fan the persisted frame out to four
    consumers (banding explode, bucket-cap count, and both verify join
    sides), and AQE submits those leaf stages as CONCURRENT jobs. With a
    lazy persist no cache partition exists when the race starts, so each
    job recomputed the whole Arrow features stage — four overlapping
    ~3.6 s UDF stages per run at 10x bench scale, 4x the Python-worker
    demand (128 concurrent workers), and bimodal 5 s / 20 s walls
    depending on who won the race. One cheap count() populates the cache
    once; every consumer then reads InMemoryTableScan hits."""
    prev = _ACTIVE_CACHES.pop(slot, None)
    if prev is not None:
        try:
            prev.unpersist(blocking=False)
        except Exception:  # session already stopped — nothing to release
            pass
    df = df.persist()
    _ACTIVE_CACHES[slot] = df
    df.count()
    return df


def _lsh_banded(base: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(k, band, bh) banding explode of a signature frame."""
    rows_per_band = num_hashes // bands
    return base.select(
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


def minhash_lsh_bucket_stats(
    df: DataFrame,
    key_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 8,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """No-silent-caps accounting for ``minhash_lsh_pairs``: one row with
    the number of buckets / banded rows / distinct keys that the bucket
    cap drops, plus the short-text row count excluded from the LSH path.
    Run with the same parameters as the pairs call and log the result."""
    n_short = df.filter(F.length(F.col(text_col)) < F.lit(n)).count()
    banded = _lsh_banded_bhs(
        _lsh_base_banded(df, key_col, text_col, n, num_hashes, bands)
    )
    # sizes only — never collect keys per bucket: the over-cap buckets are
    # exactly the ones where a per-bucket collect would blow executor memory
    sizes = banded.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("sz"))
    agg = sizes.filter(F.col("sz") > max_bucket_size).agg(
        F.count(F.lit(1)).alias("dropped_buckets"),
        F.coalesce(F.sum("sz"), F.lit(0)).alias("dropped_banded_rows"),
        F.coalesce(F.max("sz"), F.lit(0)).alias("largest_bucket"),
    )
    return agg.withColumn("short_text_rows", F.lit(n_short))


def minhash_lsh_pairs(
    df: DataFrame,
    key_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 8,
    verify_threshold: float = 0.5,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH, verified with exact
    shingle Jaccard.

    Plan: narrow minhash projection → explode(bands) [rows ×bands] →
    bucket cap → groupBy(band, band_hash) collect_set → double explode
    (k1 < k2) candidate pairs → verify join back to the precomputed
    shingle-hash arrays (JVM set ops, sh_jaccard). Pair
    generation is ONE keyed shuffle: the capped banded rows group into
    ≤``max_bucket_size``-element key arrays (bounded: ≤8 KB per bucket
    by construction — with ``max_bucket_size=None`` the grouped path is
    unsafe, so pair generation falls back to the bucket self-join
    instead) and the k² pair explode runs inside the same stage
    — measured 2× faster than the former two-sided self-join at sf0.1
    (which shuffled the banded rows twice and built a join hash table
    per bucket), with identical output. Every stage is bounded by
    bucket sizes, not table size — which the two scale guards below
    make actually true:

    - texts with NO n-shingles (length < n) are excluded up front; they
      would otherwise all share one sentinel signature and form a single
      O(m²) bucket in every band. Short-text exact duplicates belong to
      ``exact_dedup``, not LSH (jaccard between empty shingle sets is 0
      by definition here anyway).
    - buckets larger than ``max_bucket_size`` are DROPPED before the
      self-join: a map-side-partial count of (band, bh) finds the
      oversized buckets (a tiny set by definition — only degenerate
      content produces them) which is then BROADCAST anti-joined against
      the banded rows, so the cap costs no extra sort or full-row
      shuffle. A degenerate bucket means boilerplate/identical content:
      exact_dedup catches the identical part, and emitting O(k²) pairs
      for k≈millions is THE failure mode of banded LSH at 100 TB. This
      is a recall cap, not a silent one — ``minhash_lsh_bucket_stats``
      reports the dropped mass with the same parameters."""
    base = _lsh_base_banded(df, key_col, text_col, n, num_hashes, bands)
    # persisted: the banding explode AND the verify join re-read this
    # frame (at table scale: persist to disk / checkpoint the features).
    # The raw text is dropped first — verify runs on the sh arrays, so
    # persisting t would only add bytes to the cache and the verify
    # joins' build sides. The 64-slot signature is gone too (r7): only
    # the per-band bucket hashes (bands longs/row) are kept, which is
    # all banding ever consumed. _swap_persist releases the PREVIOUS
    # invocation's cache (r6 leak fix): lazy returns mean no caller can
    # ever release it, so the next call does.
    base = _swap_persist(base.select("k", "bhs", "sh"), "minhash_lsh_pairs")

    banded = _lsh_banded_bhs(base)

    if max_bucket_size is not None:
        # ONE exchange serves the cap count, the anti-join and the
        # pair-generation groupBy (guide §2.4 — see
        # _capped_buckets_one_exchange; was two shuffles of the banded
        # rows before r7)
        banded = _capped_buckets_one_exchange(
            banded, ["band", "bh"], max_bucket_size
        )
        # pair generation: zero further shuffles — the capped rows are
        # already partitioned by (band, bh), so the groupBy is
        # exchange-free; arrays bounded by the cap above; nested explode
        # stays whole-stage-codegen (a transform()-based combination
        # build would run interpreted — SNIPPETS.md HOF note). The
        # grouped path REQUIRES the cap: each bucket materializes one
        # array row. collect_list, not collect_set: each doc contributes
        # exactly one (k, band, bh) row per band, so bucket members are
        # distinct by construction (and were duplicates ever fed in, the
        # candidate distinct() below absorbs them) — list skips the
        # per-row set dedup cost.
        grouped = (
            banded.groupBy("band", "bh")
            .agg(F.collect_list("k").alias("ks"))
            .filter(F.size("ks") >= 2)
        )
        # the pair dedup and the first verify join share ONE exchange:
        # hashpartitioning(k1) clusters (k1, k2) — partition keys are a
        # subset of the distinct keys — so distinct() plans with no
        # exchange of its own, and the k1 verify join below reuses the
        # same partitioning for its streamed side (guide §2.4)
        cand = (
            grouped.select("ks", F.explode("ks").alias("k1"))
            .select("k1", F.explode("ks").alias("k2"))
            .filter(F.col("k1") < F.col("k2"))
            .select("k1", "k2")
            .repartition(F.col("k1"))
            .distinct()
        )
    else:
        # uncapped: the self-join path — slower (two shuffles of the
        # banded rows + per-bucket hash build) but degrades smoothly on a
        # degenerate bucket instead of collecting one unbounded array
        # into a single executor row
        lhs = banded.select("band", "bh", F.col("k").alias("k1"))
        rhs = banded.select("band", "bh", F.col("k").alias("k2"))
        cand = (
            lhs.join(rhs, ["band", "bh"])
            .filter(F.col("k1") < F.col("k2"))
            .select("k1", "k2")
            .distinct()
        )

    # verify: join the candidates back to the PRECOMPUTED distinct
    # shingle-hash arrays and compute exact Jaccard as JVM set ops —
    # zero Python in the verify path, each doc shingled once at base
    # build instead of once per candidate pair (4-6× at sf0.1; the gap
    # widens with candidate fan-out at table scale). The sh side is
    # hinted shuffle_hash (guide §3.1): its row count is small but its
    # payload is the corpus's whole shingle-hash mass (~2.4 KB/doc), so
    # letting the planner broadcast it builds a several-hundred-MB hash
    # relation on the driver at sf1.0 — and an impossible one at table
    # scale. A per-partition hash build after a keyed shuffle costs
    # nothing extra and is scale-invariant (r7 A/B: the broadcast plan's
    # first run was 26.6s vs 10.1s shuffled, equal results).
    shs = base.select(F.col("k"), F.col("sh"))
    return (
        cand.join(
            shs.withColumnsRenamed({"k": "k1", "sh": "sh1"}).hint("shuffle_hash"),
            "k1",
        )
        .join(
            shs.withColumnsRenamed({"k": "k2", "sh": "sh2"}).hint("shuffle_hash"),
            "k2",
        )
        .select("k1", "k2", sh_jaccard(F.col("sh1"), F.col("sh2")).alias("jaccard"))
        .filter(F.col("jaccard") >= verify_threshold)
    )


# --- exact substring-duplication spans ----------------------------------------


def substring_dup_spans(
    df: DataFrame,
    key_col: str,
    text_col: str,
    k: int = 20,
    winnow_w: int = 1,
    min_docs: int = 2,
) -> DataFrame:
    """(key, span_start, span_len) of every maximal text span whose
    k-grams also appear in ≥ ``min_docs``−1 OTHER documents — the
    exact-substring dedup signal (boilerplate headers, license blocks,
    copied passages) that MinHash's whole-document similarity misses.

    Spark-first shape of the published suffix-array method (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"):
    - every k-char window becomes (key, pos, xxhash64(gram)) — hashing
      keeps the exploded shuffle rows fixed-width (~24 B) instead of k
      text bytes; the ~20× byte amplification vs the raw text is the
      honest cost of trading the suffix array for a hash-groupBy;
    - ``winnow_w`` > 1 cuts that shuffle ~w×: keep only windows whose
      hash is minimal among the next w windows — WINNOWING (Schleimer,
      Wilkerson, Aiken, SIGMOD 2003). A fixed-stride grid would NOT
      work (two copies of a passage at different offsets sample
      different grams); winnowing selects by CONTENT, so both copies
      pick the same fingerprints and any shared substring of length
      ≥ k + w − 1 is still caught. w=1 keeps every window (exact span
      boundaries); w>1 resolves boundaries to ±w chars;
    - one hash-agg finds fingerprints spanning ≥ min_docs distinct
      docs, a semi-join keeps the duplicated windows, and per key,
      surviving positions with gaps ≤ w merge into maximal spans via
      gaps-and-islands (one keyed window).

    Positions are 1-based (SQL substring convention); an island of
    windows [p1..pn] spans pn − p1 + k chars."""
    key, txt = F.col(key_col), F.col(text_col)
    grams = (
        df.select(key.alias("k"), txt.alias("t"))
        .filter(F.length("t") >= k)
        .select(
            "k",
            F.explode(F.sequence(F.lit(1), F.length("t") - (k - 1))).alias("pos"),
            "t",
        )
        .select("k", "pos", F.xxhash64(F.expr(f"substring(t, pos, {k})")).alias("gh"))
    )
    if winnow_w > 1:
        # true winnowing, two stacked frames over one sort: _mn[j] is each
        # length-w window's min; p survives iff SOME window containing p
        # has p as its argmin — since _mn[j] ≤ gh[p] for every window j
        # containing p, that is exactly max(_mn over those j) == gh[p].
        # Every window keeps its argmin, so selected positions are never
        # more than w apart (the density guarantee the island merge
        # below relies on); a keep-if-local-forward-min shortcut has NO
        # such bound (a descending hash run selects nothing).
        ws = W.partitionBy("k").orderBy("pos")
        grams = (
            grams.withColumn(
                "_mn", F.min("gh").over(ws.rowsBetween(0, winnow_w - 1))
            )
            .withColumn(
                "_keep",
                F.max("_mn").over(ws.rowsBetween(-(winnow_w - 1), 0))
                == F.col("gh"),
            )
            .filter("_keep")
            .drop("_mn", "_keep")
        )
    dup = (
        grams.groupBy("gh")
        .agg(F.count_distinct("k").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gh")
    )
    hits = grams.join(dup, "gh", "left_semi")
    w = W.partitionBy("k").orderBy("pos")
    islands = (
        hits.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            "new_island",
            (
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") > winnow_w)
            ).cast("int"),
        )
        .withColumn(
            "island", F.sum("new_island").over(w.rowsBetween(W.unboundedPreceding, 0))
        )
    )
    return (
        islands.groupBy("k", "island")
        .agg(F.min("pos").alias("span_start"), (F.max("pos") + k - 1).alias("span_end"))
        .select(
            F.col("k").alias(key_col),
            "span_start",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
        )
    )


# --- incremental LSH index -----------------------------------------------------
#
# A 100 TB corpus is not re-signed when a daily batch lands: the banded
# signatures are a persisted INDEX. Writing a batch appends its (k, band,
# bh) rows + partial bucket counts; querying signs only the new rows and
# joins them against the index on (band, bh). The bucket cap is applied
# to the COMBINED (index + batch) bucket size via the stored partial
# counts, so the incremental pair set for new↔old pairs is exactly what
# one monolithic minhash_lsh_pairs over (old ∪ new) would emit —
# pinned by tests/test_dedup_similarity.py.


def lsh_index_write(
    df: DataFrame,
    key_col: str,
    text_col: str,
    path: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 8,
    mode: str = "overwrite",
) -> None:
    """Sign + band a corpus (or an incremental batch: mode='append')
    into a persisted LSH index at ``path``: banded rows partitioned by
    band (partition-pruned reads), the verify features (raw text + the
    distinct shingle-hash array, so queries never re-shingle the stored
    corpus), and PARTIAL per-bucket counts (queries sum them, so
    appends never rewrite old counts — the same additive-ledger idea as
    the pipeline's counters)."""
    base = _lsh_base_banded(df, key_col, text_col, n, num_hashes, bands).persist()
    banded = _lsh_banded_bhs(base)
    banded.write.mode(mode).partitionBy("band").parquet(path + "/banded")
    banded.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("cnt")).write.mode(
        mode
    ).parquet(path + "/bucket_counts")
    base.select("k", "t", "sh").write.mode(mode).parquet(path + "/texts")
    base.unpersist()


def lsh_index_query(
    new_df: DataFrame,
    key_col: str,
    text_col: str,
    path: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 8,
    verify_threshold: float = 0.5,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Near-dup pairs (k_new, k_old, jaccard) between a new batch and
    the indexed corpus — the corpus is never re-signed or re-shingled
    (the verify step reads the STORED distinct shingle-hash arrays of
    matched candidates and runs JVM set ops; no Python, no text
    re-shingling). Returns the same pairs a monolithic run over
    (old ∪ new) would return for new↔old key pairs, including the
    bucket-cap decision, which uses index counts + batch counts."""
    spark = new_df.sparkSession
    # persist only what downstream re-reads: bhs for the banding explode
    # + counts, sh for the verify join (t was cached before r7 for no
    # consumer)
    new_base = _swap_persist(
        _lsh_base_banded(new_df, key_col, text_col, n, num_hashes, bands).select(
            "k", "bhs", "sh"
        ),
        "lsh_index_query",
    )
    new_banded = _lsh_banded_bhs(new_base)
    idx = spark.read.parquet(path + "/banded")

    if max_bucket_size is not None:
        idx_counts = (
            spark.read.parquet(path + "/bucket_counts")
            .groupBy("band", "bh")
            .agg(F.sum("cnt").alias("cnt_old"))
        )
        new_counts = new_banded.groupBy("band", "bh").agg(
            F.count(F.lit(1)).alias("cnt_new")
        )
        over = (
            new_counts.join(idx_counts, ["band", "bh"], "left")
            .filter(
                F.coalesce(F.col("cnt_old"), F.lit(0)) + F.col("cnt_new")
                > max_bucket_size
            )
            .select("band", "bh")
        )
        # only buckets the BATCH touches can produce new pairs, so the
        # oversized list stays batch-sized (broadcastable) even when the
        # index holds billions of rows
        new_banded = new_banded.join(F.broadcast(over), ["band", "bh"], "left_anti")
        idx = idx.join(F.broadcast(over), ["band", "bh"], "left_anti")

    cand = (
        new_banded.withColumnRenamed("k", "k_new")
        .join(idx.withColumnRenamed("k", "k_old"), ["band", "bh"])
        .filter(F.col("k_new") != F.col("k_old"))
        .select("k_new", "k_old")
        .distinct()
    )
    old_sh = spark.read.parquet(path + "/texts").select(
        F.col("k").alias("k_old"), F.col("sh").alias("sh_old")
    )
    new_sh = new_base.select(F.col("k").alias("k_new"), F.col("sh").alias("sh_new"))
    # shuffle_hash on the sh sides, same rationale as minhash_lsh_pairs:
    # small row counts but the whole shingle-hash mass as payload —
    # never driver-broadcast the corpus features
    return (
        cand.join(new_sh.hint("shuffle_hash"), "k_new")
        .join(old_sh.hint("shuffle_hash"), "k_old")
        .select(
            "k_new",
            "k_old",
            sh_jaccard(F.col("sh_new"), F.col("sh_old")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= verify_threshold)
    )


# --- SimHash -------------------------------------------------------------------


@F.pandas_udf(T.LongType())
def simhash64_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """64-bit SimHash over whitespace tokens — fully vectorized per Arrow
    batch: ONE token_hash_batch call over the flattened batch tokens
    (the perplexity gate's position-weighted polynomial kernel — SimHash
    only needs a uniform 64-bit token hash), one (T, 64) bit expansion,
    and per-row bit majorities via np.add.reduceat over row boundaries.
    r6: replaced a per-row Python loop that hashed each token with a
    per-BYTE scalar FNV — O(rows·tokens·bytes) interpreter work, the
    last non-vectorized kernel in the dedup suite and a real cost at
    10^12 rows. Measured 73 → 42 µs/row at 30 tokens/row (and the bit
    expansion MUST be np.unpackbits on the little-endian byte view: the
    obvious (T,64) uint64-shift expansion is 2× SLOWER than the old
    loop on memory traffic alone). Values changed with the hash family;
    every simhash property (identical→0, pigeonhole recall, cap) is
    hash-agnostic and pytest-pinned. Two consequences of the family
    (ADVICE r6): tokens sharing a 16-char prefix hash identically
    (noise to a majority-vote sketch, stated for consumers), and any
    simhash PERSISTED before the r6 swap is incomparable with current
    values — persisted simhash artifacts must be versioned alongside
    ARTIFACT_VERSION or rebuilt (this repo persists none)."""
    from ..functions.hashing import token_hash_batch

    shifts = np.arange(64, dtype=np.uint64)
    for s in it:
        n = len(s)
        out = np.zeros(n, dtype=np.int64)
        toks_rows = [str(t).lower().split() for t in s.fillna("")]
        counts = np.array([len(t) for t in toks_rows], dtype=np.int64)
        if n and counts.sum():
            flat = [w for row in toks_rows for w in row]
            hs = token_hash_batch(flat)  # uint64 (T,)
            bits = np.unpackbits(
                hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            )
            bounds = np.concatenate(([0], np.cumsum(counts)))[:-1]
            nonempty = counts > 0
            # reduceat segments run to the NEXT nonempty row's start;
            # empty rows contribute zero tokens, so each segment is
            # exactly one nonempty row's tokens. int32: uint8 sums would
            # wrap at 256 tokens per row
            sums = np.add.reduceat(bits.astype(np.int32), bounds[nonempty], axis=0)
            votes = (sums * 2 - counts[nonempty][:, None]) > 0
            vals = (votes.astype(np.uint64) << shifts).sum(axis=1, dtype=np.uint64)
            out[nonempty] = vals.view(np.int64)
        yield pd.Series(out)


def simhash_pairs(
    df: DataFrame,
    key_col: str,
    text_col: str,
    max_hamming: int = 3,
    num_chunks: int | None = None,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming via multi-index
    pigeonhole bucketing.

    With m = ``num_chunks`` bit-chunks and h = ``max_hamming``, a pair
    differing in ≤ h bits leaves ≥ m−h chunks untouched, so it shares at
    least one of the C(m, m−h) possible (m−h)-chunk combination keys —
    we bucket on every combination. m = h+1 is the classic minimal split
    (4×16-bit for h=3), but its 2^16 bucket space means expected bucket
    size n/65k — O(n²/65k) candidate pairs past ~10^7 rows. Larger m
    trades explode factor C(m, m−h) for exponentially tighter buckets:
    m=6, h=3 ⇒ 20 combos keyed on ~32 bits (space ~4×10^9); m=8 ⇒ 56
    combos on 40 bits. Pick m so n / 2^(combo bits) stays O(1) at your
    scale. Recall for hamming ≤ h is exact at ANY m > h (pigeonhole);
    only the candidate volume changes.

    Degenerate buckets (identical boilerplate ⇒ identical simhash) are
    additionally capped at ``max_bucket_size`` rows, same rationale and
    same window-count trick as minhash_lsh_pairs."""
    if num_chunks is None:
        num_chunks = max_hamming + 1  # classic minimal split
    if num_chunks <= max_hamming:
        raise ValueError(
            f"pigeonhole needs num_chunks > max_hamming (got {num_chunks} <= {max_hamming})"
        )
    import itertools

    m = num_chunks
    bounds = [round(64 * c / m) for c in range(m + 1)]

    def chunk_col(c: int) -> Column:
        lo, width = bounds[c], bounds[c + 1] - bounds[c]
        return F.shiftrightunsigned(F.col("sh"), lo).bitwiseAND(F.lit((1 << width) - 1))

    combos = list(itertools.combinations(range(m), m - max_hamming))
    h = df.select(F.col(key_col).alias("k"), simhash64_udf(F.col(text_col)).alias("sh"))
    buckets = h.select(
        "k",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).alias("combo"),
                        F.xxhash64(*[chunk_col(c) for c in combos[ci]]).alias("bv"),
                    )
                    for ci in range(len(combos))
                ]
            )
        ).alias("cc"),
    ).select("k", "sh", "cc.combo", "cc.bv")

    if max_bucket_size is not None:
        # cap + pair generation over ONE exchange on (combo, bv) — the
        # count-agg, anti-join and grouped collect all consume the same
        # repartition (see _capped_buckets_one_exchange); capped buckets
        # collect into ≤max_bucket_size struct arrays, pairs explode
        # in-stage (was a two-sided self-join = two shuffles of the
        # bucketed rows plus a per-bucket hash build). Requires the cap
        # — one array row per bucket. collect_list: one row per doc per
        # combo by construction, so members are already distinct and the
        # candidate distinct() below absorbs any upstream key dups.
        buckets = _capped_buckets_one_exchange(
            buckets, ["combo", "bv"], max_bucket_size
        )
        grouped = (
            buckets.groupBy("combo", "bv")
            .agg(F.collect_list(F.struct(F.col("k"), F.col("sh"))).alias("ks"))
            .filter(F.size("ks") >= 2)
        )
        cand = (
            grouped.select("ks", F.explode("ks").alias("a"))
            .select("a", F.explode("ks").alias("b"))
            .filter(F.col("a.k") < F.col("b.k"))
            .select(
                F.col("a.k").alias("k1"),
                F.col("b.k").alias("k2"),
                F.col("a.sh").alias("sh1"),
                F.col("b.sh").alias("sh2"),
            )
            .distinct()
        )
    else:
        # uncapped fallback: self-join degrades per-bucket without a
        # single unbounded collected array (see minhash_lsh_pairs)
        lhs = buckets.select(
            "combo", "bv", F.col("k").alias("k1"), F.col("sh").alias("sh1")
        )
        rhs = buckets.select(
            "combo", "bv", F.col("k").alias("k2"), F.col("sh").alias("sh2")
        )
        cand = (
            lhs.join(rhs, ["combo", "bv"])
            .filter(F.col("k1") < F.col("k2"))
            .select("k1", "k2", "sh1", "sh2")
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
    allow_unblocked_rows: int = 100_000,
) -> DataFrame:
    """Cosine ≥ threshold pairs. Brute force within blocks (exact); for
    table-scale use similarity.lsh_bucket first and feed buckets here.

    Guardrail (mirrors ngram_jaccard_pairs): without ``block_col`` the
    ``a.k < b.k`` self-join is a BroadcastNestedLoop cartesian, so the
    unblocked form refuses inputs larger than ``allow_unblocked_rows`` —
    one cheap count up front instead of an O(n²) job at table scale."""
    from ..functions.arrays import cosine

    if block_col is None:
        n_rows = df.count()
        if n_rows > allow_unblocked_rows:
            raise ValueError(
                f"embedding_neardup_pairs without block_col is O(n^2): got "
                f"{n_rows} rows > allow_unblocked_rows={allow_unblocked_rows}. "
                "Pass block_col (e.g. a similarity.lsh_bucket column)."
            )
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


# --- benchmark decontamination ------------------------------------------------


def token_ngram_hashes(col: Column, n: int = 13) -> Column:
    """Token-level n-gram hash array: lowercase, split on non-word runs,
    hash each n-token window once with xxhash64 over the joined window.
    Texts shorter than n tokens produce an EMPTY array (they cannot
    contain a full n-gram). All JVM-side; the transform/sequence HOF is
    interpreted, but it runs over ≤(tokens−n+1) slots per row and the
    per-slot work is one concat+hash — hashing each window ONCE here
    beats re-hashing grams in every downstream comparison."""
    toks = F.filter(F.split(F.lower(col), r"\W+"), lambda t: t != F.lit(""))
    k = F.size(toks) - F.lit(n - 1)
    return F.when(k <= 0, F.array().cast("array<bigint>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, n))),
        )
    )


def decontaminate(
    df: DataFrame,
    ref: DataFrame,
    text_col: str,
    key_col: str,
    ref_text_col: str | None = None,
    n: int = 13,
    broadcast_ref: bool = True,
) -> DataFrame:
    """Remove rows whose text shares ANY token-level n-gram with a
    reference corpus (benchmark decontamination — the standard guard
    against test-set leakage into training data; 13 tokens is the
    common published window).

    Plan: hash the reference's distinct n-grams once (tiny next to the
    training side — benchmarks are MBs, training sets are TBs), then a
    LEFT ANTI join from the exploded training grams' DISTINCT
    (key, gram) pairs back to doc keys. With ``broadcast_ref`` the anti
    join is map-side (zero shuffle of the big side beyond the explode's
    own stage); flip it off if the reference is genuinely large and let
    the shuffle hash join partition both sides by gram. Returns df rows
    that survive, original schema."""
    ref_grams = (
        ref.select(F.explode(token_ngram_hashes(F.col(ref_text_col or text_col), n)).alias("g"))
        .distinct()
    )
    if broadcast_ref:
        ref_grams = F.broadcast(ref_grams)
    doc_grams = df.select(
        F.col(key_col).alias("_k"),
        F.explode(token_ngram_hashes(F.col(text_col), n)).alias("g"),
    )
    contaminated = (
        doc_grams.join(ref_grams, "g", "left_semi").select("_k").distinct()
    )
    return df.join(
        contaminated, df[key_col] == contaminated["_k"], "left_anti"
    )
