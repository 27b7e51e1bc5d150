"""Production job entry point (SURVEY.md §3.4).

Usage (cluster):
    spark-submit --py-files mtold.zip \
        --files artifacts/langid.npz,artifacts/lm.npz \
        scripts/run_filter_job.py --input <clips_root> --output <out_root> \
        --ledger <ledger_dir>

Usage (local):
    python scripts/run_filter_job.py --input ... --output ... --ledger ... \
        [--master local[8]]

Resumable: rerunning after a kill processes only partitions without a
matching ledger commit marker (SURVEY.md §4.4).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_task_offensive_language_detection_spark.plans.pipeline import run_clips_pipeline
from multi_task_offensive_language_detection_spark.session import build_session


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--ledger", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--artifact-dir", default=None)
    ap.add_argument("--num-partitions", type=int, default=None)
    ap.add_argument(
        "--sink",
        choices=["hive", "snapshots"],
        default="hive",
        help="hive: atomic per-partition directory commits (default); "
        "snapshots: one snapshot-store commit per run (time travel "
        "across runs, journal meta records the processed parts)",
    )
    args = ap.parse_args()

    spark = build_session(app_name="mtold-filter-job", master=args.master)
    try:
        summary = run_clips_pipeline(
            spark,
            in_path=args.input,
            out_path=args.output,
            ledger_dir=args.ledger,
            artifact_dir=args.artifact_dir,
            num_partitions=args.num_partitions,
            sink=args.sink,
        )
        print(json.dumps(summary))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
