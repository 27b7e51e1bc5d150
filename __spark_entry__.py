"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship quality-filter pipeline on sf0.001 documents.
queries()    — one entry per implemented operator (SURVEY.md §2), defined
               in multi_task_offensive_language_detection_spark.checks.
oracle_sql() — matching DuckDB ANSI SQL for every SQL-expressible op;
               hash/UDF-dependent ops are rows-only by design (the module
               docstring of checks.py explains each omission).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from multi_task_offensive_language_detection_spark import checks


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return checks.QUERIES["pipeline_documents"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(checks.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(checks.ORACLES)
