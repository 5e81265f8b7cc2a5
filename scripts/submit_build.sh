#!/usr/bin/env bash
# north_rule packaging: ship the engine via spark-submit --py-files and
# run the batch index build. Verified against a real multi-executor
# master (local-cluster[2,2,2048], two separate executor JVMs) in
# round 2 — see BASELINE.md. On a real cluster swap --master and
# --output for the cluster URL and a shared filesystem path.
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${MASTER:-local-cluster[2,2,2048]}"
OUTPUT="${OUTPUT:-/tmp/submit_ix}"
N_CONV="${N_CONV:-200}"

ZIP=$(mktemp -u /tmp/engine_XXXX.zip)
zip -qr "$ZIP" search_engine_spark

exec /opt/spark/bin/spark-submit \
  --master "$MASTER" \
  --conf "spark.executorEnv.PYTHONPATH=$ZIP" \
  --py-files "$ZIP" \
  jobs/build_index.py --n-synthetic-convs "$N_CONV" --output "$OUTPUT" \
  --bucket-width "${BUCKET_WIDTH:-65536}"
