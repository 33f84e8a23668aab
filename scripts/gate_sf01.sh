#!/usr/bin/env bash
# Standing pre-commit gate at sf0.1 (r11 VERDICT task 8): the sf0.1
# full-surface verify caught a real 1-ulp percentile boundary bug that
# every sf0.01 run missed (BASELINE.md "sf0.1 verify gate"), so it runs
# as ONE command each round instead of ad hoc:
#   1. full Verify dump at sf0.1 -> DuckDB oracle compare (check_oracle)
#   2. QueryProbe --guard: per-query 2x timing contract + plan-shape
#      regression audit against plan_shapes.json
# Usage: scripts/gate_sf01.sh [sfDir] [outDir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.1}"
OUT="${2:-/tmp/gate_sf01}"
CPUS="${SPARK_GRAFT_CPUS:-16}"
LOG="${OUT}.log"

echo "== gate: Verify @ $SF (local[$CPUS]) =="
rm -rf "$OUT"
SPARK_GRAFT_CPUS="$CPUS" sbt -batch "runMain graft.Verify $SF $OUT" \
  > "$LOG" 2>&1 || { tail -20 "$LOG"; echo "gate: Verify RED"; exit 1; }
grep -E '\[verify\]' "$LOG" || true
python3 scripts/check_oracle.py "$SF" "$OUT"

echo "== gate: QueryProbe --guard (timing + plan shapes) =="
SPARK_GRAFT_CPUS="$CPUS" sbt -batch \
  "runMain graft.QueryProbe $SF --guard bench_out.json" \
  > "$LOG.guard" 2>&1 || { tail -40 "$LOG.guard"; echo "gate: guard RED"; exit 1; }
grep -E '^\[guard\]|\[probe\]' "$LOG.guard" | tail -20 || true
echo "== gate: green =="
