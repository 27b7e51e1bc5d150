"""Cross-round headline trend table (VERDICT r4 #7 follow-through).

Reads every driver bench record (`BENCH_r{N}.json`, field `parsed`) plus
the current session's `BENCH/bench_full.json` and prints one row per
headline query per round, with the probe-normalized ratio where a probe
was recorded (r5+). Rounds whose driver record is unparseable are
filled from the committed round notes when known (r4's stdout line
outgrew the driver tail capture — the values below are the ones
committed in that round's BENCH/BASELINE.md / SURVEY §10).

    python tools/bench_trend.py
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: r4's driver record has parsed=null (truncated tail); medians as
#: committed in that session's BENCH/BASELINE.md (git history) / SURVEY §10.
R4_FALLBACK = {
    "filter_length": 0.19,
    "join_then_agg": 0.66,
    "win_moving_avg": 0.52,
    "agg_rollup": 0.20,
    "topk_terms": 0.31,
    "dedup_minhash_lsh": 3.38,
    "ann_brute_topk": 0.77,
    "stream_session": 0.91,
    "pipeline_documents": 3.85,
}


def load_rounds() -> dict[int, dict]:
    rounds: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        n = int(m.group(1))
        with open(path) as f:
            rec = json.load(f)
        parsed = rec.get("parsed")
        if parsed and parsed.get("queries"):
            rounds[n] = parsed
        elif n == 4:
            rounds[n] = {"queries": R4_FALLBACK, "value": sum(R4_FALLBACK.values()), "_fallback": True}
    cur = os.path.join(REPO, "BENCH", "bench_full.json")
    if os.path.exists(cur):
        with open(cur) as f:
            parsed = json.load(f)
        # A stale bench_full.json left over from the run the driver
        # already recorded as the latest BENCH_r{N}.json would print the
        # same run twice (once as rN, once as rN+1) — skip the session
        # record when its totals match the newest driver round.
        latest = rounds.get(max(rounds)) if rounds else None
        is_dup = (
            latest is not None
            and latest.get("value") == parsed.get("value")
            and latest.get("queries") == parsed.get("queries")
        )
        if not is_dup:
            n = (max(rounds) + 1) if rounds else 0
            rounds[n] = {**parsed, "_session": True}
    return rounds


def main() -> None:
    rounds = load_rounds()
    if not rounds:
        print("no bench records found")
        return
    ns = sorted(rounds)
    queries = list(rounds[ns[-1]]["queries"])
    head = "query".ljust(22) + "".join(
        f"r{n}{'*' if rounds[n].get('_fallback') else '+' if rounds[n].get('_session') else ''}".rjust(9)
        for n in ns
    )
    print(head)
    for q in queries:
        row = q.ljust(22)
        for n in ns:
            v = rounds[n]["queries"].get(q)
            row += (f"{v:9.2f}" if v is not None else "        -")
        print(row)
    row = "TOTAL".ljust(22)
    for n in ns:
        row += f"{rounds[n].get('value', 0):9.2f}"
    print(row)
    for n in ns:
        p = rounds[n].get("probe_s")
        if p:
            print(
                f"r{n} probe {p}s -> probe-normalized total "
                f"{rounds[n]['value'] / p:.1f}x probe"
            )
    print("(* = reconstructed from committed round notes; + = this session's local run, not a driver record)")


if __name__ == "__main__":
    main()
