#!/bin/bash
# Differential InfluxQL fuzz vs the DuckDB oracle.
# usage: tools/fuzz_check.sh [sfdir] [ncases] [outdir] [name-substring]
set -e
SF=${1:-/root/testdata/sf0.01}
N=${2:-500}
OUT=${3:-/tmp/fuzz_out}
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
cd /root/repo
java $ADD_OPENS -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.Fuzz "$SF" "$OUT" "$N" ${4:+"$4"} 2>&1 | grep -E "^\[fuzz\]"
# store-mode sweeps get the documented ±1 fixed-point-ulp tolerance on
# the value column (float accumulation order differs over the
# hour-partitioned store; see check_oracle.py)
case "${4:-}" in store*) TOL="--tol1" ;; *) TOL="" ;; esac
python3 tools/check_oracle.py "$SF" "$OUT" $TOL
