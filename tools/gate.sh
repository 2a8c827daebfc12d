#!/bin/bash
# tools/gate.sh — the full verification gate in one command:
#   compile → scalatest → Verify dump → DuckDB oracle diff → bench JSON
#   → plan-shape regression check.
# Exit nonzero on ANY failure. Usage: tools/gate.sh [sfDir]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="$(mktemp -d /tmp/graft_gate.XXXXXX)"

echo "== compile + test =="
sbt -batch test

echo "== verify dump ($SF) =="
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" tools/run.sh graft.Verify "$SF" "$OUT/verify"

echo "== oracle diff =="
python3 tools/check.py "$SF" "$OUT/verify" | tail -3
python3 tools/check.py "$SF" "$OUT/verify" | grep -q " 0 failed"

echo "== bench (one JSON line) =="
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.001}" \
  tools/run.sh graft.Bench 2>/dev/null | tail -1

echo "== plan-shape regression =="
tools/run.sh graft.PlanAudit --check 2>/dev/null | tail -1

echo "== streaming plan-shape regression =="
tools/run.sh graft.StreamPlanAudit --check 2>/dev/null | tail -1

echo "GATE GREEN"
