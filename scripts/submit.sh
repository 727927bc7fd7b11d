#!/usr/bin/env bash
# Package the engine and launch the KG pipeline via spark-submit --py-files.
#
#   scripts/submit.sh [--master local[32]] -- <run_pipeline_cli.py args...>
#
# Example (local sandbox):
#   scripts/submit.sh --master local[8] -- \
#     --from-documents /root/testdata/sf0.01 --work-dir /tmp/kg_run --out /tmp/kg_triples
set -euo pipefail

REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
ZIP="$(mktemp -d)/llmra_spark.zip"

MASTER="local[*]"
if [[ "${1:-}" == "--master" ]]; then
  MASTER="$2"; shift 2
fi
[[ "${1:-}" == "--" ]] && shift

(cd "$REPO_DIR" && zip -qr "$ZIP" llm_review_aggregation_spark __spark_entry__.py -x '*__pycache__*')

exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --py-files "$ZIP" \
  "$REPO_DIR/scripts/run_pipeline_cli.py" "$@"
