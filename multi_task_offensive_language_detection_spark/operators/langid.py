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

NGRAM_ORDERS = (2, 3)
N_BUCKETS = 1 << 16

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
        """Per-text argmax language + posterior confidence (vectorized numpy
        per row over hashed n-gram buckets)."""
        langs = np.empty(len(texts), dtype=object)
        confs = np.empty(len(texts), dtype=np.float64)
        for i, text in enumerate(texts.fillna("")):
            ll = self.prior.astype(np.float64).copy()
            n_feats = 0
            for n in NGRAM_ORDERS:
                b = char_ngram_buckets(str(text).lower(), n, N_BUCKETS)
                if len(b):
                    ll += self.logp[n][:, b].sum(axis=1)
                    n_feats += len(b)
            if n_feats == 0:
                langs[i], confs[i] = "und", 0.0
                continue
            # length-normalized posterior (softmax over mean log-lik) so
            # confidence is comparable across transcript lengths
            z = ll / max(n_feats, 1)
            z = z - z.max()
            p = np.exp(z * 50.0)  # sharpen: mean-ll gaps are small
            p /= p.sum()
            k = int(np.argmax(p))
            langs[i], confs[i] = self.langs[k], float(p[k])
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
