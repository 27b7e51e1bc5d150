"""Combined Python scoring stage: langid + perplexity in ONE pandas UDF.

Iterator-type pandas UDFs cannot be fused by Spark's ExtractPythonUDFs
(one UDF per ArrowEvalPython node), so scoring langid and perplexity as
separate UDFs costs two JVM↔Python Arrow round-trips per batch. This
module folds both models into a single iterator UDF returning
struct<lang, conf, ppl> — one Arrow boundary, both artifacts loaded once
per worker (verified in tests/test_plan_shape.py: the pipeline plan has
exactly ONE ArrowEvalPython node)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .langid import LangidModel, _MODEL_CACHE as _LANGID_CACHE
from .perplexity import NgramLM, _LM_CACHE

COMBINED_RESULT = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("conf", T.DoubleType()),
        T.StructField("ppl", T.DoubleType()),
    ]
)


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


def combined_scores_udf(langid_path: str, lm_path: str):
    """norm_text → struct<lang, conf, ppl> — one input column, one
    output struct, one Arrow boundary. The LM scores the same normalized
    text langid sees (profanity words and lowercased placeholders are in
    the LM vocabulary, so no separate masked column is needed)."""

    @F.pandas_udf(COMBINED_RESULT)
    def _score(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        langid = _load_langid(langid_path)  # once per worker
        lm = _load_lm(lm_path)
        for norm_text in it:
            out = langid.score_batch(norm_text)
            out["ppl"] = lm.ppl_batch(norm_text).to_numpy()
            yield out

    return _score
