#!/usr/bin/env bash
# Cluster submission form (BASELINE.json north_rule: spark-submit
# --py-files with broadcast-loaded artifacts). Locally this degenerates
# to the same job on local[N].
#
# Usage: scripts/submit.sh <input> <output> <ledger> [master]
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${4:-local[${SPARK_GRAFT_CPUS:-32}]}"

# package the engine for executor distribution
rm -f mtold.zip
zip -qr mtold.zip multi_task_offensive_language_detection_spark

# deterministic artifacts (langid + LM tables) — shipped to every executor
python -c "from multi_task_offensive_language_detection_spark.artifacts_build import build_all; print(build_all())"

exec spark-submit \
  --master "$MASTER" \
  --py-files mtold.zip \
  --files "$(ls artifacts/*.npz | paste -sd,)" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.executorEnv.MALLOC_MMAP_THRESHOLD_=1073741824 \
  --conf spark.executorEnv.MALLOC_TRIM_THRESHOLD_=1073741824 \
  scripts/run_filter_job.py --input "$1" --output "$2" --ledger "$3"
