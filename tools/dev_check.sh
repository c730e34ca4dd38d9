#!/bin/bash
# Spot-check named entries vs the DuckDB oracle at a given sf.
# usage: tools/dev_check.sh <sfdir> <name1,name2|all> [outdir]
set -e
SF=${1:-/root/testdata/sf0.01}
NAMES=${2:-all}
OUT=${3:-/tmp/devcheck}
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
cd /root/repo
java $ADD_OPENS -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.RunEntries "$SF" "$OUT" "$NAMES" 2>&1 | grep -E "^\[run\]"
python3 tools/check_oracle.py "$SF" "$OUT"
# README tally drift gate: full runs carry the complete oracle map (the
# current-source entry truth); filtered runs fall back to the latest
# CORRECTNESS_r*.json
if [ "$NAMES" = "all" ]; then
  python3 tools/tally_check.py "$OUT/oracle_sql.json"
else
  python3 tools/tally_check.py
fi
# bench regression gate: latest protocol bench_out.json vs the committed
# baseline (skips itself when either file is absent)
python3 tools/bench_gate.py
