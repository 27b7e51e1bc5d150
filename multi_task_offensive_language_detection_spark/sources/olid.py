"""OLID/SOLID file readers (SURVEY.md S1-S4) — the reference's exact
input formats ([R] ref:data.py: pandas read_csv with sep='\\t'), as
schema-explicit Spark scans (no inference pass over 9M-row files).

Formats (Zampieri et al. 2019; Rosenthal et al. 2020):
- olid-training-v1.0.tsv: id \\t tweet \\t subtask_a \\t subtask_b \\t subtask_c
  ('NULL' strings mark hierarchy gaps → real nulls here)
- testset-level{a,b,c}.tsv: id \\t tweet
- labels-level{a,b,c}.csv:  id,label   (headerless)
- task_{a,b,c}_distant.tsv: id \\t text \\t average \\t std
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

OLID_TRAIN_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("tweet", T.StringType()),
        T.StructField("subtask_a", T.StringType()),
        T.StructField("subtask_b", T.StringType()),
        T.StructField("subtask_c", T.StringType()),
    ]
)

TEST_SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("tweet", T.StringType())]
)

LABELS_SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("label", T.StringType())]
)

DISTANT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("average", T.DoubleType()),
        T.StructField("std", T.DoubleType()),
    ]
)


def read_olid_train(spark: SparkSession, path: str) -> DataFrame:
    """S1 — the 'NULL' placeholder strings become real nulls so the
    hierarchy filters (P2/P3) work with isNotNull."""
    df = spark.read.csv(path, sep="\t", header=True, schema=OLID_TRAIN_SCHEMA)
    return df.withColumns(
        {
            c: F.when(F.col(c) == "NULL", F.lit(None)).otherwise(F.col(c))
            for c in ("subtask_b", "subtask_c")
        }
    )


def read_olid_test(spark: SparkSession, path: str) -> DataFrame:
    """S2."""
    return spark.read.csv(path, sep="\t", header=True, schema=TEST_SCHEMA)


def read_gold_labels(spark: SparkSession, path: str) -> DataFrame:
    """S3 — headerless id,label."""
    return spark.read.csv(path, header=False, schema=LABELS_SCHEMA)


def read_solid_distant(spark: SparkSession, path: str) -> DataFrame:
    """S4 — 9M-row distant-supervision TSV; explicit DoubleType so the
    confidence filter (P4) pushes down."""
    return spark.read.csv(path, sep="\t", header=True, schema=DISTANT_SCHEMA)
