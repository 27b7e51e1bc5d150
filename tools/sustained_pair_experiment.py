"""Scaling-endgame experiment (VERDICT r4 #4): is the 1→4 structural
pair's shortfall per-JOB fixed overhead that a sustained run amortizes?

The criterion (BASELINE.json:2) is about SUSTAINED throughput between
cluster sizes — the design point is a 10^12-row table, where per-job
fixed costs (driver planning, ledger loop, counters agg, commit) are
zero-measure. At the bench's 2.4M rows (tile 12) a ~2s fixed tail is
~6% of the 4-core wall but only ~2% of the 1-core wall, which depresses
T1/(4·T4) mechanically. This script measures the SAME job, same code,
interleaved, at tile 12 and tile 48 (4× rows): if eff(48) − eff(12) is
materially positive, the pool statistic at tile 12 understates the
sustained criterion and the bench should measure it at the larger tile
(a methodology change to log, not a code change).

Run: python tools/sustained_pair_experiment.py [trials]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TILES = (12, 48)


def ensure_clips(tile: int) -> str:
    env = dict(os.environ, MTOLD_BENCH_SCALE_TILE=str(tile))
    code = (
        "import sys; sys.path.insert(0, %r); import bench; "
        "print(bench.ensure_bench_clips())" % REPO
    )
    p = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True, check=True
    )
    return p.stdout.strip().splitlines()[-1]


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    import bench

    paths = {t: ensure_clips(t) for t in TILES}
    print(json.dumps({"paths": paths}), flush=True)

    # warm the page cache for both inputs once (shared across processes)
    from multi_task_offensive_language_detection_spark.session import build_session

    spark = build_session(app_name="sustained-warm", master="local[32]")
    for p in paths.values():
        spark.read.parquet(p).write.mode("overwrite").format("noop").save()
    spark.stop()

    effs: dict[int, list[float]] = {t: [] for t in TILES}
    for trial in range(trials):
        for t in TILES:
            w1 = bench._one_scale_run(paths[t], 1)["wall_s"]
            w4 = bench._one_scale_run(paths[t], 4)["wall_s"]
            eff = w1 / (4.0 * w4)
            effs[t].append(round(eff, 3))
            print(
                json.dumps(
                    {
                        "trial": trial,
                        "tile": t,
                        "wall_1": round(w1, 2),
                        "wall_4": round(w4, 2),
                        "eff": round(eff, 3),
                    }
                ),
                flush=True,
            )
    print(
        json.dumps(
            {
                "summary": {
                    str(t): {"effs": effs[t], "median": bench._median(effs[t])}
                    for t in TILES
                }
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
