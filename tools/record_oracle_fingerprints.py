"""Maintain the committed oracle-fingerprint store that lets
checks.rotation_order fast-track keys whose oracle SQL changed after
their last driver row (r5 verdict item #2).

For every key with an oracle, if its most recent driver row
(CORRECTNESS_r*.json) is GREEN and newer than the recorded fingerprint,
record the CURRENT oracle SQL's fingerprint at that round — the row
vouches for the SQL that was registered when the gate ran. Red rows
never update the store (redness itself fast-tracks the key, and the
stale fingerprint keeps flagging the oracle until a green row lands).
Keys retired from the registry are dropped.

RUN THIS AT SESSION START, before editing any oracle: an oracle edited
after the record was written hash-mismatches the store and sorts into
the front of the next driver window.

    python tools/record_oracle_fingerprints.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def record() -> dict:
    from multi_task_offensive_language_detection_spark import checks

    last = checks.correctness_history()
    red = checks.correctness_red()
    path = checks._FPRINT_PATH
    try:
        with open(path) as f:
            recorded = json.load(f)
    except (OSError, ValueError):
        recorded = {}

    out = {}
    for key, sql in checks.ORACLES.items():
        prev = recorded.get(key)
        rnd = last.get(key, -1)
        if rnd >= 0 and key not in red and (prev is None or prev.get("round", -1) < rnd):
            out[key] = {"round": rnd, "fp": checks.oracle_fingerprint(sql)}
        elif prev is not None:
            out[key] = prev

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    os.replace(tmp, path)
    return out


if __name__ == "__main__":
    rec = record()
    print(f"recorded {len(rec)} oracle fingerprints")
