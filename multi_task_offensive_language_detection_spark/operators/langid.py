"""Language identification — fastText-STYLE, not fastText (SURVEY.md M3).

A hashed char-n-gram multinomial Naive-Bayes scorer implementing the
north_rule's "fastText langid" gate (P6). Model = one dense float32
log-probability matrix per n-gram order, trained offline by
``artifacts_build.py`` on the engine's deterministic multilingual corpus
and shipped as an ``.npz`` broadcast artifact (the Spark analog of the
reference's torch checkpoint, SURVEY.md S5).

Scoring runs as an ``Iterator[pd.Series] → Iterator[pd.DataFrame]``
pandas UDF so the artifact loads ONCE per Python worker (Arrow-batched;
no per-row Python at the Spark level).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import char_ngram_buckets

NGRAM_ORDERS = (3,)
N_BUCKETS = 1 << 16
#: chars of text consulted per row — language ID saturates long before
#: this; capping bounds memory traffic per row (the scorer is
#: bandwidth-bound, not compute-bound)
MAX_CHARS = 128

LANGID_RESULT = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("conf", T.DoubleType()),
    ]
)


class LangidModel:
    """Dense NB model: ``logp[order][lang_idx, bucket]`` float32."""

    def __init__(self, langs: list[str], logp: dict[int, np.ndarray], prior: np.ndarray):
        self.langs = langs
        self.logp = logp
        # bucket-major copy for scoring: gathering rows of a (buckets, L)
        # table is contiguous (L floats per bucket); gathering columns of
        # the (L, buckets) artifact layout strides N_BUCKETS·4 bytes per
        # element — ~2× slower on the batch-scoring hot path
        self.logp_t = {n: np.ascontiguousarray(m.T) for n, m in logp.items()}
        self.prior = prior

    @classmethod
    def train(cls, corpus: list[tuple[str, str]], alpha: float = 0.5) -> "LangidModel":
        """corpus: (lang, text) pairs; add-alpha smoothed bucket counts."""
        langs = sorted({lang for lang, _ in corpus})
        idx = {lang: i for i, lang in enumerate(langs)}
        logp: dict[int, np.ndarray] = {}
        counts = {
            n: np.zeros((len(langs), N_BUCKETS), dtype=np.float64) for n in NGRAM_ORDERS
        }
        n_docs = np.zeros(len(langs), dtype=np.float64)
        for lang, text in corpus:
            i = idx[lang]
            n_docs[i] += 1
            for n in NGRAM_ORDERS:
                b = char_ngram_buckets(text.lower(), n, N_BUCKETS)
                if len(b):
                    np.add.at(counts[n][i], b, 1.0)
        for n in NGRAM_ORDERS:
            c = counts[n] + alpha
            logp[n] = np.log(c / c.sum(axis=1, keepdims=True)).astype(np.float32)
        prior = np.log(n_docs / n_docs.sum()).astype(np.float32)
        return cls(langs, logp, prior)

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            langs=np.array(self.langs),
            prior=self.prior,
            **{f"logp_{n}": self.logp[n] for n in NGRAM_ORDERS},
        )

    @classmethod
    def load(cls, path: str) -> "LangidModel":
        z = np.load(path, allow_pickle=False)
        return cls(
            langs=[str(x) for x in z["langs"]],
            logp={n: z[f"logp_{n}"] for n in NGRAM_ORDERS},
            prior=z["prior"],
        )

    def score_batch(self, texts: pd.Series) -> pd.DataFrame:
        """Batch argmax language + posterior confidence — fully vectorized:
        ONE rolling hash over the whole Arrow batch, per-row log-lik sums
        via bincount, no Python loop over rows."""
        from ..functions.hashing import char_ngram_buckets_flat

        tl = [str(t)[:MAX_CHARS].lower() for t in texts.fillna("")]
        n_rows = len(tl)
        ll = np.tile(self.prior.astype(np.float64)[:, None], (1, n_rows))
        n_feats = np.zeros(n_rows, dtype=np.int64)
        for n in NGRAM_ORDERS:
            buckets, rows = char_ngram_buckets_flat(tl, n, N_BUCKETS)
            if len(buckets) == 0:
                continue
            # stride-2 sampling: half the n-grams carry far more signal
            # than the decision needs (confidences sit at ~1.0) and the
            # scorer is bandwidth-bound — sampling halves memory traffic
            buckets, rows = buckets[::2], rows[::2]
            gathered = self.logp_t[n][buckets]  # (W, L) float32, contiguous rows
            # segment-sum via reduceat over NONEMPTY rows only (rows are
            # sorted by construction). Boundaries come from cumsum of the
            # per-row counts restricted to rows that actually have features
            # — clamping an end-of-array boundary would instead truncate
            # the last feature-bearing row whenever a batch ends with
            # featureless rows, making scores batch-composition-dependent.
            counts = np.bincount(rows, minlength=n_rows)
            nonempty = np.nonzero(counts > 0)[0]
            if len(nonempty):
                bounds_all = np.concatenate(([0], np.cumsum(counts)))[:-1]
                seg = np.add.reduceat(gathered, bounds_all[nonempty], axis=0)
                ll[:, nonempty] += seg.T
            n_feats += counts
        # length-normalized posterior (softmax over mean log-lik, sharpened)
        z = ll / np.maximum(n_feats, 1)[None, :]
        z = z - z.max(axis=0, keepdims=True)
        p = np.exp(z * 50.0)
        p /= p.sum(axis=0, keepdims=True)
        k = np.argmax(p, axis=0)
        langs = np.asarray(self.langs, dtype=object)[k]
        confs = p[k, np.arange(n_rows)]
        langs[n_feats == 0] = "und"
        confs[n_feats == 0] = 0.0
        return pd.DataFrame({"lang": langs, "conf": confs})


# --- Spark surface ---------------------------------------------------------

_MODEL_CACHE: dict[str, LangidModel] = {}


def _load(path: str) -> LangidModel:
    m = _MODEL_CACHE.get(path)
    if m is None:
        m = _MODEL_CACHE[path] = LangidModel.load(path)
    return m


def langid_udf(artifact_path: str):
    """Struct-returning pandas UDF: text → struct<lang:string, conf:double>."""

    @F.pandas_udf(LANGID_RESULT)
    def _langid(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        model = _load(artifact_path)  # once per worker
        for s in it:
            yield model.score_batch(s)

    return _langid


def with_langid(df, text_col: str, artifact_path: str, out_col: str = "langid") -> "DataFrame":  # noqa: F821
    return df.withColumn(out_col, langid_udf(artifact_path)(F.col(text_col)))


def langid_gate(lang_col: Column, conf_col: Column, target: str = "en", min_conf: float = 0.0) -> Column:
    """P6 — boolean keep-gate on the langid output."""
    return (lang_col == target) & (conf_col >= min_conf)
