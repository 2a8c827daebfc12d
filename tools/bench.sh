#!/bin/bash
# tools/bench.sh — the idle-bench driver with an AUTOMATED CONTROL DRAW
# (VERDICT r11 ask #4): three rounds running, sub-second midband movers
# needed hand-run worktree experiments to tell host drift from real
# regressions (x52 r9, x71 r10, x85/x20 r11 — commit 90bb263's method).
# This folds that method into the harness: --control builds the
# PREVIOUS round's tree in a detached worktree, benches BOTH trees in
# one session minutes apart on the same host, and emits a `control`
# section + per-query mover verdicts in the merged JSON — every mover
# ships with its same-host control reading.
#
# Usage:
#   tools/bench.sh [sfDir]                      # current tree only
#   tools/bench.sh --control <sha> [sfDir]      # + control tree section
#
# Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_ONLY (narrow
# both trees' runs for targeted mover adjudication).
#
# Output: target/bench_local.json (current full bench doc, plus
# "control" and "movers" sections when --control ran).
set -euo pipefail
cd "$(dirname "$0")/.."

CTL_SHA=""
if [ "${1:-}" = "--control" ]; then
  CTL_SHA="$2"; shift 2
fi
SF="${1:-/root/testdata/sf0.1}"
CPUS="${SPARK_GRAFT_CPUS:-32}"

echo "== bench: current tree ($(git rev-parse --short HEAD)) at $SF =="
sbt -batch compile >/dev/null
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
  tools/run.sh graft.Bench 2>/dev/null | tail -1
cp target/bench.json target/bench_current.json

if [ -z "$CTL_SHA" ]; then
  cp target/bench_current.json target/bench_local.json
  echo "bench_local json written to $(pwd)/target/bench_local.json (no control)"
  exit 0
fi

CTL_DIR="/tmp/graft_bench_ctl_$CTL_SHA"
echo "== bench: control tree $CTL_SHA in worktree $CTL_DIR =="
git worktree remove --force "$CTL_DIR" 2>/dev/null || true
git worktree add --detach "$CTL_DIR" "$CTL_SHA" >/dev/null
(cd "$CTL_DIR" && sbt -batch compile >/dev/null 2>&1)
(cd "$CTL_DIR" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
  tools/run.sh graft.Bench 2>/dev/null | tail -1)
cp "$CTL_DIR/target/bench.json" target/bench_control.json
git worktree remove --force "$CTL_DIR"

echo "== merge: control section + mover verdicts =="
CTL_SHA="$CTL_SHA" python3 - <<'EOF'
import json, os
cur = json.load(open("target/bench_current.json"))
ctl = json.load(open("target/bench_control.json"))
# compare on per-query MINs: the plan's cost, not the contention draw.
# Explicit or-chains, not dict.get(k, d): get() evaluates its default
# EAGERLY, so a bench.json with only one of the two keys raised KeyError
# after both expensive runs completed (ADVICE r12).
cmin = cur.get("queries_min") or cur.get("queries") or {}
kmin = ctl.get("queries_min") or ctl.get("queries") or {}
movers = []
for name, v in sorted(cmin.items()):
    w = kmin.get(name)
    if w is None or w <= 0:
        continue
    ratio = v / w
    if ratio > 1.3 or ratio < 0.77:
        movers.append({"query": name, "current_min": round(v, 3),
                       "control_min": round(w, 3), "ratio": round(ratio, 2),
                       "verdict": "regression" if ratio > 1.3 else "improvement"})
cur["control"] = {"sha": os.environ["CTL_SHA"],
                  "total": ctl.get("value"),
                  "queries": ctl.get("queries") or {},
                  "queries_min": kmin,
                  "contended": ctl.get("contended", [])}
cur["movers"] = movers
cur["control_note"] = ("both trees benched in ONE session minutes apart on the same "
                       "host (the 90bb263 method, automated); a mover whose control "
                       "reading moved identically is host drift, one that holds at "
                       "control speed is a code change")
json.dump(cur, open("target/bench_local.json", "w"))
# the COMMITTED control summary graft.Bench merges into the submitted
# artifact (VERDICT r12 ask #6): flat shape, regex-parsed there.
# sentinel_floor (r13 ask #2): the control draw's idle floor — the
# submitted run gates ITSELF on the ratio of its floor to this one, so
# a uniformly loaded window can no longer read as clean.
json.dump({"sha": os.environ["CTL_SHA"], "sf": cur.get("sf", ""),
           "total": ctl.get("value") or 0.0,
           "sentinel_floor": ctl.get("sentinel_floor_sec") or 0.0,
           "queries_min": kmin},
          open("BENCH_CONTROL.json", "w"))
n_reg = sum(1 for m in movers if m["verdict"] == "regression")
print(f"movers vs control {os.environ['CTL_SHA']}: {len(movers)} "
      f"({n_reg} slower, {len(movers)-n_reg} faster); details in target/bench_local.json")
EOF
echo "bench_local json written to $(pwd)/target/bench_local.json"
echo "committed-control summary written to $(pwd)/BENCH_CONTROL.json (commit it: graft.Bench merges it into BENCH_r{N})"
