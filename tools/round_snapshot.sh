#!/bin/bash
# End-of-round artifact hygiene (round-9 verdict item 4, recurring since
# round 8): the per-round artifacts (BENCH_r*, CORRECTNESS_r*, LEAKCHECK,
# COPYCHECK, bench_out) must land IN the snapshot commit, not sit dirty
# beside it. Run this before handing the tree back to the driver.
set -e
cd "$(dirname "$0")/.."
git add -A -- 'BENCH_r*.json' 'CORRECTNESS_r*.json' LEAKCHECK.json \
  COPYCHECK.json bench_out.json tools/bench_prev.json \
  tools/bench_baseline.json 2>/dev/null || true
if git diff --cached --quiet; then
  echo "[snapshot] no round artifacts to commit"
else
  git commit -m "round artifacts: bench/correctness/leakcheck snapshots"
  echo "[snapshot] committed round artifacts"
fi
