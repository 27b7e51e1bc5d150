"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what the production submit script would set on a
real cluster (AQE, Arrow, sane shuffle parallelism); see scripts/submit.sh
for the spark-submit --py-files form (BASELINE.json north_rule).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "mtold-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Parameters mirror the two knobs bench.py varies: ``master``
    (``local[8]`` vs ``local[32]`` for the N-vs-4N scaling evidence) and
    ``shuffle_partitions`` (sized to cores in local mode — the 200 default
    over-partitions small local runs).
    """
    # glibc malloc tuning for the Python scoring workers: without it every
    # large numpy temporary is mmap'd and munmap'd, and the TLB-shootdown
    # storm across 32 workers costs ~40% of scoring throughput (measured in
    # BENCH work, round 1). Must be in the env BEFORE the JVM forks workers.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master.split("[")[-1].rstrip("]")
        shuffle_partitions = 32 if n == "*" else max(int(n), 4)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst=true (the default) stops AQE from coalescing
        # below defaultParallelism, so every tiny post-shuffle stage pays
        # one task per core of scheduling + Arrow/Python overhead. The
        # Spark tuning guide itself recommends false on busy clusters;
        # with it, reduce-task count follows DATA SIZE (16 MB advisory —
        # small enough to keep compute-heavy stages parallel, large
        # enough that metadata-sized shuffles collapse to one task).
        # A/B at sf0.1 local[32]: every headline query improved, total
        # 14.2->10.3s and 11.4->9.7s back-to-back (r4).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ~10k rows per Arrow batch keeps the pandas-UDF stages (langid,
        # perplexity, audio) amortized without blowing Python worker memory
        # at wide transcript rows (SURVEY §4.1).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
