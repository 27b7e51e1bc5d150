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
        # parallelismFirst=true (Spark's default, restored r7): keep AQE
        # from coalescing reduce stages below defaultParallelism. r4 set
        # it false (data-sized 16 MB reduce tasks) when the engine's
        # post-shuffle stages were metadata-sized; the r6/r7 operator
        # shapes put real CPU after exchanges (window/session sort+agg,
        # LSH bucket cap + pair explode + set-op verify), and a 30 MB
        # shuffle coalesced to two 16 MB tasks serializes that compute on
        # 2 of 32 cores. r7 interleaved A/B (fresh sessions, min-of-2 per
        # cell): 10x-sf0.1 data — win_moving_avg 1.56→0.66, stream_session
        # 2.06→1.21, dedup_minhash_lsh 7.5/6.2→4.9/4.3, pipeline 2.0/1.2→
        # 1.3/1.1; sf0.1 — every query ≤ or equal, 5-query sum 2.20→1.87.
        # In local mode (shuffle.partitions == cores) this disables
        # coalescing outright; on a cluster with shuffle.partitions above
        # core count, AQE still coalesces down to the advisory size but
        # never below the cluster's parallelism — the scale-adaptive
        # behavior the optimization guide recommends (§2.2).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "16m"),
        )
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
