"""Benchmark driver (SURVEY.md M8).

Prints ONE JSON line:
  {"metric": ..., "value": <total headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "clips": {rows, local8_rows_per_s, local32_rows_per_s,
             scaling_efficiency}}

and rewrites BENCH/BASELINE.md with the N→4N scaling evidence
(local[8] vs local[32] on the same input — the sandbox proxy for the
north_rule's two-cluster-size criterion; BASELINE.json:14).

Headline queries run at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. The clips scaling runs execute in fresh
subprocesses so each parallelism level gets its own JVM.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
BENCH_CLIP_ROWS = int(os.environ.get("MTOLD_BENCH_CLIP_ROWS", "200000"))
#: the scaling runs use TILE× the base rows so compute dominates fixed
#: overhead (the efficiency criterion is about sustained throughput)
SCALE_TILE = int(os.environ.get("MTOLD_BENCH_SCALE_TILE", "5"))
CLIPS_DIR = os.path.join(REPO, ".bench_data", f"clips_{BENCH_CLIP_ROWS}")

#: headline operators — one per family (scan+filter, join+agg, window,
#: near-dup at scale, ANN, sessionization, and the flagship UDF pipeline)
HEADLINE = [
    "filter_length",
    "join_then_agg",
    "win_moving_avg",
    "agg_rollup",
    "topk_terms",
    "dedup_minhash_lsh",
    "ann_brute_topk",
    "stream_session",
    "pipeline_documents",
]


def ensure_bench_clips() -> str:
    marker = os.path.join(CLIPS_DIR, "_DONE")
    if os.path.exists(marker):
        return os.path.join(CLIPS_DIR, "clips")
    from tests.fixtures.clips_gen import write_clips_parquet

    os.makedirs(CLIPS_DIR, exist_ok=True)
    # bytes-free at bench tier: the scoring hot path never reads audio
    # (column pruning), so generating it would only benchmark the fixture
    import tests.fixtures.clips_gen as cg

    clips, _ = cg.make_clips(n_rows=BENCH_CLIP_ROWS, seed=cg.SEED, with_audio=False)
    import pyarrow as pa
    import pyarrow.parquet as pq

    for part_id, grp in clips.groupby("part_id"):
        d = os.path.join(CLIPS_DIR, "clips", f"part_id={part_id}")
        os.makedirs(d, exist_ok=True)
        base = grp.drop(columns=["part_id"])
        # tile the partition TILE× with distinct clip_ids: same text
        # distribution, TILE× the volume, negligible generation cost
        tiles = []
        for t in range(SCALE_TILE):
            tt = base.copy()
            tt["clip_id"] = tt["clip_id"] + f"_t{t}"
            tiles.append(tt)
        import pandas as pd

        pq.write_table(
            pa.Table.from_pandas(pd.concat(tiles, ignore_index=True), preserve_index=False),
            os.path.join(d, "data.parquet"),
        )
    open(marker, "w").write("ok")
    return os.path.join(CLIPS_DIR, "clips")


_SCALE_SNIPPET = r"""
import json, sys, time, shutil
sys.path.insert(0, {repo!r})
from multi_task_offensive_language_detection_spark.session import build_session
from multi_task_offensive_language_detection_spark.artifacts_build import build_all
from multi_task_offensive_language_detection_spark.plans.pipeline import (
    run_clips_pipeline, score_transcripts,
)
from pyspark.sql import functions as F
spark = build_session(app_name="bench-scale", master={master!r})
# warm-up: spin up every Python worker + load broadcast artifacts once,
# so the timed run measures sustained throughput, not fork/JIT cost
warm = spark.range(20000).select(
    F.lit("the people said they would go to the house").alias("transcript"),
    F.col("id").cast("string").alias("clip_id"))
warm = warm.repartition(64)
score_transcripts(warm, "transcript", build_all()).agg(
    F.sum("ppl"), F.sum(F.length("scores.langid_lang"))).collect()
t0 = time.monotonic()
out = {out!r}
shutil.rmtree(out, ignore_errors=True)
s = run_clips_pipeline(spark, {clips!r}, out + "/filtered", out + "/ledger")
wall = time.monotonic() - t0
print(json.dumps({{"wall_s": wall, "n_in": s["n_in"]}}))
spark.stop()
"""


def run_scaling(clips_path: str) -> dict:
    res = {}
    for cores in (8, 32):
        out = os.path.join(REPO, ".bench_data", f"scale_out_{cores}")
        code = _SCALE_SNIPPET.format(
            repo=REPO, master=f"local[{cores}]", out=out, clips=clips_path
        )
        p = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, check=False
        )
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            sys.stderr.write(p.stderr[-2000:])
            raise RuntimeError(f"scaling run local[{cores}] failed")
        res[cores] = {"wall_s": r["wall_s"], "rows_per_s": r["n_in"] / r["wall_s"]}
    res["efficiency"] = res[8]["wall_s"] / (4.0 * res[32]["wall_s"])
    return res


def write_baseline_md(clips_rows: int, scale: dict, queries: dict, total: float) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    qlines = "\n".join(f"| {k} | {v:.3f} |" for k, v in queries.items())
    md = f"""# BENCH baseline (generated by bench.py)

## Clips pipeline scaling — N vs 4N cores (north_rule criterion)

Same input ({clips_rows:,} clips, seed-42 synthetic, text scoring path),
same job, two parallelism levels (sandbox proxy for N vs 4N executors):

| config | wall (s) | throughput (clips/s) |
| --- | --- | --- |
| local[8]  | {scale[8]['wall_s']:.2f} | {scale[8]['rows_per_s']:.0f} |
| local[32] | {scale[32]['wall_s']:.2f} | {scale[32]['rows_per_s']:.0f} |

**Scaling efficiency (T8 / (4 x T32)) = {scale['efficiency']:.3f}**
(target >= 0.8, BASELINE.json:2)

## Headline queries at {SF_DIR} (local[{CPUS}])

| query | sec |
| --- | --- |
{qlines}
| **total** | **{total:.3f}** |

Reference throughput: none published (the reference is a GPU training
repo, SURVEY.md §6); the binding targets are the scaling efficiency above
and the driver's per-round BENCH_r{{N}}.json trend.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


def main() -> None:
    from multi_task_offensive_language_detection_spark import checks
    from multi_task_offensive_language_detection_spark.artifacts_build import build_all
    from multi_task_offensive_language_detection_spark.session import build_session

    build_all()  # artifacts ready before any timing starts
    clips_path = ensure_bench_clips()

    spark = build_session(app_name="mtold-bench", master=f"local[{CPUS}]")
    qtimes: dict[str, float] = {}
    for name in HEADLINE:
        fn = checks.QUERIES[name]
        t0 = time.monotonic()
        df = fn(spark, SF_DIR)
        # noop sink: forces EVERY column (count() would let Catalyst prune
        # the UDF columns away and time nothing)
        df.write.mode("overwrite").format("noop").save()
        qtimes[name] = round(time.monotonic() - t0, 3)
    spark.stop()

    scale = run_scaling(clips_path)
    total = round(sum(qtimes.values()), 3)
    scale_rows = BENCH_CLIP_ROWS * SCALE_TILE
    write_baseline_md(scale_rows, scale, qtimes, total)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": qtimes,
                "sf": SF_DIR,
                "clips": {
                    "rows": scale_rows,
                    "local8_rows_per_s": round(scale[8]["rows_per_s"], 1),
                    "local32_rows_per_s": round(scale[32]["rows_per_s"], 1),
                    "scaling_efficiency": round(scale["efficiency"], 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
