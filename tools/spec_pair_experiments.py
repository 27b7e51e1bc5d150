"""Spec-pair (local[8] -> local[32]) gap experiments — VERDICT r3 #2.

The r3 finding: Spark's 8->32 efficiency (0.23) sits far below the
zero-Spark kernels control (0.75) on the same cores, so the VM's memory
bus explains the knee but not the whole gap. Candidate residuals, each
isolated here against the SAME warm input:

  shuffle  — salted-stage task count: defaultParallelism*2 gives 64
             tasks = 128 runnable threads (JVM task thread + Python
             worker each) on 32 shared-bus cores
  gc       — untuned ParallelGC spawns ~23 GC threads per 32-core JVM
  knee     — where Spark's own scaling stops: 8/16/24/32-core points

Each config runs `trials` times INTERLEAVED with the 8-core baseline so
a host epoch can't bias one arm. Prints one JSON line; feeds the
BENCH/BASELINE.md breakdown. Run standalone:

    python tools/spec_pair_experiments.py [trials]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_SNIPPET = r"""
import json, sys, time, shutil
sys.path.insert(0, {repo!r})
from multi_task_offensive_language_detection_spark.session import build_session
from multi_task_offensive_language_detection_spark.artifacts_build import build_all
from multi_task_offensive_language_detection_spark.plans.pipeline import (
    run_clips_pipeline, score_transcripts,
)
from pyspark.sql import functions as F
spark = build_session(app_name="spec-exp", master={master!r}, extra_conf={conf!r})
warm = spark.range(20000).select(
    F.lit("the people said they would go to the house").alias("transcript"),
    F.col("id").cast("string").alias("clip_id"))
warm = warm.repartition(64)
score_transcripts(warm, "transcript", build_all()).agg(
    F.sum("ppl"), F.sum(F.length("scores.langid_lang"))).collect()
t0 = time.monotonic()
out = {out!r}
shutil.rmtree(out, ignore_errors=True)
s = run_clips_pipeline(spark, {clips!r}, out + "/filtered", out + "/ledger",
                       num_partitions={nparts!r})
print(json.dumps({{"wall_s": time.monotonic() - t0, "n_in": s["n_in"]}}))
spark.stop()
"""


def run_one(clips: str, cores: int, conf: dict, nparts=None, tag: str = "x") -> float:
    out = os.path.join(REPO, ".bench_data", f"exp_out_{tag}")
    code = _SNIPPET.format(
        repo=REPO,
        master=f"local[{cores}]",
        conf=conf,
        out=out,
        clips=clips,
        nparts=nparts,
    )
    p = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code],
        capture_output=True,
        text=True,
        check=False,
    )
    line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
    try:
        return json.loads(line)["wall_s"]
    except (json.JSONDecodeError, KeyError):
        sys.stderr.write(p.stderr[-1500:])
        raise RuntimeError(f"experiment run {tag} local[{cores}] failed")


GC4 = {"spark.driver.extraJavaOptions": "-XX:ParallelGCThreads=4"}

#: name -> (cores, extra_conf, num_partitions) — num_partitions None
#: keeps the pipeline default (defaultParallelism * 2)
CONFIGS = {
    "c8_base": (8, {}, None),
    "c16_base": (16, {}, None),
    "c24_base": (24, {}, None),
    "c32_base": (32, {}, None),
    "c32_parts32": (32, {}, 32),
    "c32_parts16": (32, {}, 16),
    "c32_gc4": (32, GC4, None),
    "c32_parts32_gc4": (32, GC4, 32),
}


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from bench import ensure_bench_clips

    clips = ensure_bench_clips()
    # warm the page cache once (shared across subprocesses)
    subprocess.run(
        f"cat {clips}/part_id=*/*.parquet > /dev/null", shell=True, check=False
    )
    walls: dict[str, list[float]] = {k: [] for k in CONFIGS}
    for t in range(trials):
        for name, (cores, conf, nparts) in CONFIGS.items():
            walls[name].append(
                round(run_one(clips, cores, conf, nparts, tag=name), 2)
            )
            print(f"trial {t} {name}: {walls[name][-1]}s", file=sys.stderr)

    def med(xs):
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else 0.5 * (s[m - 1] + s[m])

    summary = {k: {"walls": v, "median_s": round(med(v), 2)} for k, v in walls.items()}
    base8 = med(walls["c8_base"])
    for k in CONFIGS:
        cores = CONFIGS[k][0]
        summary[k]["eff_vs_8"] = round(base8 / (cores / 8 * med(walls[k])), 3)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
