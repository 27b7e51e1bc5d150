"""Compute-bound scaling control (BENCH/BASELINE.md evidence).

Runs the engine's ACTUAL Python scoring kernels (langid + perplexity +
lexicon signals — the same code the pipeline's Arrow stage executes) in
N parallel OS processes pinned to N cores, with zero Spark involvement,
and reports rows/s at each parallelism level. This isolates the platform
term: if the bare kernels stop scaling past ~8 concurrent cores, the
ceiling is the VM's shared memory bus, not the Spark plan.

Usage: python tools/scaling_control.py [cores ...]   (default: 1 2 4 8)
Prints one JSON line: {"points": {n: rows_per_s}, "eff_1_4": ...}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS_PER_PROC = 100_000
BATCH = 10_000


def _worker(args):
    core, n_rows = args
    os.sched_setaffinity(0, {core})
    import pandas as pd

    from multi_task_offensive_language_detection_spark.artifacts_build import build_all
    from multi_task_offensive_language_detection_spark.operators.langid import LangidModel
    from multi_task_offensive_language_detection_spark.operators.perplexity import NgramLM
    from multi_task_offensive_language_detection_spark.operators.scoring import LexiconSignals

    import tests.fixtures.clips_gen as cg

    arts = build_all()
    lid, lm, lex = LangidModel.load(arts["langid"]), NgramLM.load(arts["lm"]), LexiconSignals()
    clips, _ = cg.make_clips(n_rows=BATCH, seed=cg.SEED, with_audio=False)
    texts = pd.Series(clips["transcript"].values).str.lower()

    # warmup
    lid.score_batch(texts)
    t0 = time.perf_counter()
    done = 0
    while done < n_rows:
        lid.score_batch(texts)
        _, _, _, stream = lm.ppl_stats_batch(texts, return_stream=True)
        lex.score_stream(len(texts), *stream)
        done += len(texts)
    return done / (time.perf_counter() - t0)


def measure(n_procs: int) -> float:
    """Best-of-2 (host noise): each trial sums per-proc sustained rates."""
    trials = []
    for _ in range(2):
        with mp.get_context("spawn").Pool(n_procs) as pool:
            rates = pool.map(_worker, [(i, ROWS_PER_PROC) for i in range(n_procs)])
        trials.append(float(sum(rates)))
    return max(trials)


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    points = {n: round(measure(n), 1) for n in levels}
    out = {"points": points, "rows_per_proc": ROWS_PER_PROC}
    for lo, hi in ((1, 4), (2, 8), (8, 32)):
        if lo in points and hi in points:
            out[f"eff_{lo}_{hi}"] = round(points[hi] / (4.0 * points[lo]), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
