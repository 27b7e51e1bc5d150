"""Bucketed (pre-shuffled) co-located joins — the storage-layout lever
for repeated large⋈large joins at 100 TB.

A sort-merge join shuffles BOTH sides on the key every time it runs.
When the same join recurs (clips ⋈ per-clip labels, predictions ⋈ gold,
…), writing both tables bucketed by the join key amortizes that shuffle
into the write: `bucketBy(n, key)` hash-partitions rows into a fixed
bucket count at rest, and Spark's scan reports the bucketing as output
partitioning, so the join planner emits NO Exchange on either side
(locked by tests/test_plan_shape.py::test_bucketed_join_no_exchange).
At cluster scale this is the difference between re-shuffling ~100 TB
per run and never shuffling it again; the same mechanism underlies
Iceberg's bucket partition transform, which this maps onto when the
lakehouse runtime is present (SURVEY.md §0.4 Iceberg note).

Constraints the helper enforces rather than documents away:
- both sides must use the SAME bucket count (mismatch → one side
  re-shuffles anyway);
- bucketed writes go through the session catalog (`saveAsTable`) —
  plain `.parquet(path)` silently drops bucketing metadata.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int, sort: bool = True
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``key`` —
    sorting within buckets additionally removes the join's Sort nodes,
    leaving a pure zip-merge.

    Re-runnable across sessions: the in-memory catalog forgets tables a
    previous session created while their warehouse directories persist,
    and saveAsTable refuses a CREATE over an existing location — so the
    stale table AND its directory are dropped first."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{table}`")
    wh = spark.conf.get("spark.sql.warehouse.dir")
    loc = wh.removeprefix("file:") + "/" + table.lower()
    shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def bucketed_equijoin(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key with a
    merge hint: the bucketed layout already co-locates both sides, so
    sort-merge runs with ZERO Exchange nodes. Without the hint the
    planner may pick a broadcast join for a small side — correct, but a
    BroadcastExchange defeats the demonstration (and at the 100 TB
    sizes this layout targets, neither side broadcasts anyway).
    Callers wanting proof assert via .explain() or the plan-shape
    test."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table).hint("merge")
    return left.join(right, key, how)
