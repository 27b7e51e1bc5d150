"""Grouped-map operators (SURVEY.md X1 surface) — applyInPandas.

The z-score op is deliberately ALSO expressible as a SQL window, so the
driver oracle cross-checks the grouped-map execution path against plain
SQL — the two paradigms must agree bit-for-bit."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def grouped_zscore(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Per-group standardization (x − mean)/stddev_samp; 0.0 for
    singleton/zero-variance groups. One shuffle on the group key."""

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        sd = v.std(ddof=1)
        if pd.isna(sd) or sd == 0.0:
            pdf[out_col] = 0.0
        else:
            pdf[out_col] = (v - v.mean()) / sd
        return pdf

    return df.groupBy(group_col).applyInPandas(standardize, schema=schema)
