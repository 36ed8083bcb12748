#!/bin/bash
# Round-14 bench runner: full registry from a frozen classpath snapshot
# so recompiles during the round cannot perturb the measurement.
# Usage: run_bench_r14.sh <classpath_dir> <outfile.json> [cpus]
set -u
CP="$1"; OUT="$2"; CPUS="${3:-32}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_CPUS="$CPUS" \
SPARK_GRAFT_SKIP_OUTFILE=1 \
java $ADD_OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP:/opt/spark/jars/*" graft.Bench \
  2>/dev/null | grep -v '^\[' | tail -1 > "$OUT"
