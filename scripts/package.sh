#!/usr/bin/env bash
# Package the engine for spark-submit on a real cluster
# (BASELINE.json: "Jobs run via spark-submit --py-files").
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f pyrate_spark.zip
zip -qr pyrate_spark.zip pyrate_spark -x '*__pycache__*'
echo "built pyrate_spark.zip ($(du -h pyrate_spark.zip | cut -f1))"
cat <<'EOF'
submit example:
  spark-submit \
    --py-files pyrate_spark.zip \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.execution.arrow.pyspark.enabled=true \
    --conf spark.executorEnv.OMP_NUM_THREADS=1 \
    --conf spark.executorEnv.OPENBLAS_NUM_THREADS=1 \
    your_job.py
EOF
