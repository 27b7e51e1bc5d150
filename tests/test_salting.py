"""X1 salted repartition: balances a pathologically skewed input and
preserves the exact multiset of rows (SURVEY.md §4.3, §5.2.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from multi_task_offensive_language_detection_spark.plans.pipeline import salted_repartition


def _partition_sizes(df):
    return [
        r["n"]
        for r in df.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]


def test_salt_balances_skewed_lengths(spark):
    # pathological skew: 5% of rows are 100× longer than the rest, and the
    # input arrives sorted so the long rows cluster in a few splits
    rows = [(f"c{i:06d}", ("x " * (2000 if i < 2500 else 20)).strip()) for i in range(50000)]
    df = spark.createDataFrame(rows, "clip_id string, transcript string").coalesce(4)
    salted = salted_repartition(df.withColumn("L", F.length("transcript")), 16)
    # bytes per partition (the thing UDF cost follows), not just row count
    per_part = [
        r["b"]
        for r in salted.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg(F.sum("L").alias("b"))
        .collect()
    ]
    assert len(per_part) == 16
    assert max(per_part) < 2.0 * (sum(per_part) / len(per_part)), per_part


def test_salt_preserves_multiset(spark):
    df = spark.createDataFrame(
        [(f"c{i}", f"t{i % 7}") for i in range(5000)], "clip_id string, transcript string"
    )
    salted = salted_repartition(df, 8)
    assert salted.count() == 5000
    assert salted.select("clip_id").distinct().count() == 5000
    assert salted.exceptAll(df).count() == 0 and df.exceptAll(salted).count() == 0


def test_salt_is_deterministic(spark):
    """Same input ⇒ same salt values (xxhash64 is seed-fixed) — required
    for retry determinism (SURVEY.md hard-parts #2)."""
    df = spark.createDataFrame([(f"c{i}",) for i in range(100)], "clip_id string")
    s1 = df.select(F.pmod(F.xxhash64("clip_id"), F.lit(64)).alias("s")).collect()
    s2 = df.select(F.pmod(F.xxhash64("clip_id"), F.lit(64)).alias("s")).collect()
    assert s1 == s2
