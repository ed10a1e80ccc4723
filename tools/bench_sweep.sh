#!/bin/bash
# Binding bench protocol (BASELINE.md): N back-to-back FULL-SWEEP graft.Bench
# invocations, each a fresh JVM. Usage: tools/bench_sweep.sh [N] [outfile]
set -u
N="${1:-4}"
OUT="${2:-/tmp/bench_sweeps.jsonl}"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
: > "$OUT"
for i in $(seq 1 "$N"); do
  echo "=== sweep $i/$N $(date +%H:%M:%S) ===" >&2
  SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  java $ADD_OPENS -Xmx28g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench 2>/dev/null | grep '^{' >> "$OUT"
done
echo "done: $OUT" >&2
