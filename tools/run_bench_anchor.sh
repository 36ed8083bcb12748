#!/bin/bash
# Round-13 bench anchor: run the FULL registry from a frozen classpath
# snapshot (anchor_cp_r13, copied from the r12-identical tree before any
# round-13 code change) so recompiles during the round cannot perturb the
# measurement. Usage: run_bench_anchor.sh <outfile.json>
set -u
OUT="$1"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_SKIP_OUTFILE=1 \
java $ADD_OPENS -Xmx8g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "anchor_cp_r13:/opt/spark/jars/*" graft.Bench \
  2>/dev/null | grep -v '^\[' | tail -1 > "$OUT"
