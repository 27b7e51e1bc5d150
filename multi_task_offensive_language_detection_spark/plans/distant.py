"""Distant-supervision preparation (SURVEY.md §3.3 — reference entry
point 3, the semantic ancestor of the whole quality filter).

SOLID rows carry ensemble statistics (average, std); the reference mints
silver labels by confidence thresholding and unions them into the OLID
training set ([R] ref:data.py; Rosenthal et al. 2020). Thresholds follow
the paper's regime (high-average → OFF, low-average → NOT, tight std).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: confidence regime (paper-style; pinned for determinism)
OFF_MIN_AVG = 0.7
NOT_MAX_AVG = 0.25
MAX_STD = 0.25


def mint_distant_labels(distant: DataFrame) -> DataFrame:
    """P4 + label minting: keep only confidently-labeled rows."""
    lab = (
        F.when((F.col("average") >= OFF_MIN_AVG) & (F.col("std") <= MAX_STD), "OFF")
        .when((F.col("average") <= NOT_MAX_AVG) & (F.col("std") <= MAX_STD), "NOT")
        .otherwise(F.lit(None))
    )
    return (
        distant.withColumn("subtask_a", lab)
        .filter(F.col("subtask_a").isNotNull())
        .select(
            "id",
            F.col("text").alias("tweet"),
            "subtask_a",
            F.lit(None).cast("string").alias("subtask_b"),
            F.lit(None).cast("string").alias("subtask_c"),
        )
    )


def union_training_sets(olid: DataFrame, distant_labeled: DataFrame) -> DataFrame:
    """U1 — OLID + filtered SOLID by name (silver rows lack B/C labels,
    matching the reference's masked-loss convention)."""
    return olid.unionByName(distant_labeled, allowMissingColumns=True)


def hash_mod_split(df: DataFrame, id_col: str = "id", n_buckets: int = 10, train_buckets: int = 8):
    """U2 — deterministic train/dev split, stable under retries (never
    randomSplit: it resamples per task attempt)."""
    bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    return df.filter(bucket < train_buckets), df.filter(bucket >= train_buckets)
