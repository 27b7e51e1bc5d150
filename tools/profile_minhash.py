"""Stage-level wall breakdown of the dedup_minhash_lsh headline query.

Reproduces the bench harness conditions (local[32], warm session, noop
sink) and times cumulative plan prefixes so the next optimization aims
at the real cost, not the assumed one. Not part of the bench output —
a diagnosis tool (VERDICT r3 #3)."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from multi_task_offensive_language_detection_spark import checks
from multi_task_offensive_language_detection_spark.operators import dedup
from multi_task_offensive_language_detection_spark.session import build_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    spark = build_session(app_name="minhash-profile", master="local[32]")
    # warm like bench: workers + page cache
    checks.QUERIES["pipeline_documents"](spark, "/root/testdata/sf0.001").write.mode(
        "overwrite"
    ).format("noop").save()
    spark.read.parquet(os.path.join(SF, "documents.parquet")).write.mode(
        "overwrite"
    ).format("noop").save()

    docs = checks._docs_with_mutants(spark, SF)
    t = {}

    for trial in range(2):
        tag = "" if trial == 0 else "_w"  # second pass = fully warm
        t0 = time.monotonic()
        base = dedup._lsh_base(docs, "doc_id", "text", 5, 64)
        t[f"plan_base{tag}"] = time.monotonic() - t0

        t0 = time.monotonic()
        noop(base)
        t[f"signatures{tag}"] = time.monotonic() - t0

        base_p = base.persist()
        t0 = time.monotonic()
        base_p.count()
        t[f"persist{tag}"] = time.monotonic() - t0

        banded = dedup._lsh_banded(base_p, 64, 8)
        t0 = time.monotonic()
        noop(banded)
        t[f"banded{tag}"] = time.monotonic() - t0

        capped = dedup._drop_oversized_buckets(banded, ["band", "bh"], 1000)
        t0 = time.monotonic()
        noop(capped)
        t[f"capped{tag}"] = time.monotonic() - t0

        # legacy two-sided self-join pair-gen (superseded in r4 by the
        # collect_set shape below, kept for comparison)
        l, r = capped.alias("l"), capped.alias("r")
        cand_join = (
            l.join(
                r,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bh") == F.col("r.bh"))
                & (F.col("l.k") < F.col("r.k")),
            )
            .select(F.col("l.k").alias("k1"), F.col("r.k").alias("k2"))
            .distinct()
        )
        t0 = time.monotonic()
        noop(cand_join)
        t[f"cand_join_distinct{tag}"] = time.monotonic() - t0

        # PRODUCTION pair-gen (the committed minhash_lsh_pairs shape):
        # one hash-agg + double explode, no self-join hash build
        grouped = (
            capped.groupBy("band", "bh")
            .agg(F.collect_set("k").alias("ks"))
            .filter(F.size("ks") >= 2)
        )
        cand = (
            grouped.select("ks", F.explode("ks").alias("k1"))
            .select("k1", F.explode("ks").alias("k2"))
            .filter(F.col("k1") < F.col("k2"))
            .select("k1", "k2")
            .distinct()
        )
        t0 = time.monotonic()
        noop(cand)
        t[f"cand_collectset{tag}"] = time.monotonic() - t0

        # legacy Arrow text-verify (re-shingles both texts per pair) —
        # kept as the A/B comparator for the JVM set-op verify below
        txt = base_p.select(F.col("k"), F.col("t"))
        legacy = (
            cand.join(txt.withColumnsRenamed({"k": "k1", "t": "t1"}), "k1")
            .join(txt.withColumnsRenamed({"k": "k2", "t": "t2"}), "k2")
            .select(
                "k1",
                "k2",
                dedup.jaccard_texts_udf(5)(F.col("t1"), F.col("t2")).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= 0.5)
        )
        t0 = time.monotonic()
        noop(legacy)
        t[f"verify_text_udf{tag}"] = time.monotonic() - t0

        # production verify (r6): precomputed sh arrays + JVM set ops
        shs = base_p.select(F.col("k"), F.col("sh"))
        full = (
            cand.join(shs.withColumnsRenamed({"k": "k1", "sh": "sh1"}), "k1")
            .join(shs.withColumnsRenamed({"k": "k2", "sh": "sh2"}), "k2")
            .select(
                "k1",
                "k2",
                dedup.sh_jaccard(F.col("sh1"), F.col("sh2")).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= 0.5)
        )
        t0 = time.monotonic()
        noop(full)
        t[f"verify_full{tag}"] = time.monotonic() - t0

        base_p.unpersist()

        # the real query end-to-end, as the bench times it
        t0 = time.monotonic()
        noop(checks.QUERIES["dedup_minhash_lsh"](spark, SF))
        t[f"end_to_end{tag}"] = time.monotonic() - t0

    for k, v in t.items():
        print(f"{k:24s} {v:7.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
