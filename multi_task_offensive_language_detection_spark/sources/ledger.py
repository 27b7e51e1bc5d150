"""Per-partition checkpoint ledger (SURVEY.md §4.4; BASELINE.json:6).

One JSON file per committed partition under ``<ledger_dir>/``, written
atomically (tmp + rename) AFTER the partition's output directory has been
renamed into place — so a ledger row is a commit marker: its presence with
a matching input fingerprint means "this partition's output is complete
and current; do not rescore".

The ledger is the source of truth for counters (exactly-once); Spark
accumulators are not used for anything durable (at-least-once under task
retries — SURVEY.md A10).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import asdict, dataclass, field, fields


@dataclass
class LedgerEntry:
    part_id: int
    status: str
    fingerprint: str
    n_in: int = 0
    n_keep: int = 0
    n_langid_reject: int = 0
    n_ppl_drop: int = 0
    n_rule_drop: int = 0
    n_toxicity_drop: int = 0
    n_scrub_edits: int = 0
    #: wall-clock ms of the JOB RUN that committed this partition (all
    #: partitions of one run share it — per-part wall attribution over an
    #: interleaved salted stage would be fiction, so it is not attempted)
    job_wall_ms: int = 0
    attempt: int = 1


#: renamed-field migrations, old name → current name (read-side only: a
#: ledger written by an older engine version must still resume cleanly)
_LEGACY_KEYS = {"wall_ms": "job_wall_ms"}
_ENTRY_FIELDS = {f.name for f in fields(LedgerEntry)}


def _entry_from_dict(d: dict) -> LedgerEntry:
    """Tolerant constructor: maps legacy key names and drops unknown keys,
    so ledgers written before a field rename (or by a newer engine with
    extra counters) still load instead of TypeError-ing resume."""
    remapped = {_LEGACY_KEYS.get(k, k): v for k, v in d.items()}
    return LedgerEntry(**{k: v for k, v in remapped.items() if k in _ENTRY_FIELDS})


class Ledger:
    def __init__(self, ledger_dir: str):
        self.dir = ledger_dir
        os.makedirs(ledger_dir, exist_ok=True)

    def _path(self, part_id: int) -> str:
        return os.path.join(self.dir, f"part-{part_id:06d}.json")

    def read_all(self) -> dict[int, LedgerEntry]:
        out: dict[int, LedgerEntry] = {}
        for name in sorted(os.listdir(self.dir)):
            if not (name.startswith("part-") and name.endswith(".json")):
                continue
            with open(os.path.join(self.dir, name)) as f:
                out_entry = _entry_from_dict(json.load(f))
            out[out_entry.part_id] = out_entry
        return out

    def commit(self, entry: LedgerEntry) -> None:
        """Atomic single-partition commit marker (write-temp-then-rename)."""
        prev = self.read_one(entry.part_id)
        if prev is not None:
            entry.attempt = prev.attempt + 1
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(asdict(entry), f)
        os.replace(tmp, self._path(entry.part_id))

    def read_one(self, part_id: int) -> LedgerEntry | None:
        p = self._path(part_id)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return _entry_from_dict(json.load(f))

    def pending(self, all_parts: list[int], fingerprints: dict[int, str]) -> list[int]:
        """Parts needing (re)processing: missing, failed, or input changed."""
        done = self.read_all()
        out = []
        for p in all_parts:
            e = done.get(p)
            if e is None or e.status != "done" or e.fingerprint != fingerprints[p]:
                out.append(p)
        return out

    def totals(self) -> dict[str, int]:
        """Merged counters across committed partitions (driver report)."""
        keys = (
            "n_in n_keep n_langid_reject n_ppl_drop n_rule_drop "
            "n_toxicity_drop n_scrub_edits"
        ).split()
        tot = dict.fromkeys(keys, 0)
        for e in self.read_all().values():
            if e.status == "done":
                for k in keys:
                    tot[k] += getattr(e, k)
        return tot
