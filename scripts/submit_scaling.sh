#!/usr/bin/env bash
# North-rule launch evidence: the SAME index-build job submitted via
# `spark-submit --py-files` (packaged zip, script-mode entrypoint) at two
# parallelism levels — the sandbox stand-in for N and 4N executors.
#
# Usage: scripts/submit_scaling.sh [transcripts_parquet_dir] [lo] [hi]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SUBMIT="$(python -c 'import pyspark,os;print(os.path.join(os.path.dirname(pyspark.__file__),"bin","spark-submit"))')"
INPUT="${1:-/tmp/nss_bench_transcripts_12000}"
LO="${2:-8}"
HI="${3:-32}"
PKG=/tmp/nss_pkg_submit.zip
rm -f "$PKG"
(cd "$REPO" && zip -qr "$PKG" neural_search_spark)
for CPUS in "$LO" "$HI"; do
  OUT="/tmp/nss_submit_idx_$CPUS"
  rm -rf "$OUT"
  START=$SECONDS
  # mirror session.py's launch conf (driver memory / GC must be set
  # BEFORE the JVM starts, so spark-submit flags, not builder confs)
  "$SUBMIT" --master "local[$CPUS]" --py-files "$PKG" \
    --driver-memory "${SPARK_DRIVER_MEM:-24g}" \
    --conf "spark.driver.extraJavaOptions=-XX:+UseParallelGC" \
    --conf "spark.sql.shuffle.partitions=$((CPUS <= 16 ? CPUS : 2 * CPUS))" \
    "$REPO/neural_search_spark/cli.py" --local-cpus "$CPUS" \
    build --input "$INPUT" --output "$OUT" \
    --n-shards 32 --block-size 4096 \
    > "/tmp/nss_submit_$CPUS.log" 2>&1
  echo "local[$CPUS]: $((SECONDS - START)) s wall (build log /tmp/nss_submit_$CPUS.log)"
done
