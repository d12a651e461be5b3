#!/bin/bash
# One-session step-level A/B of every pending routing arm (same-session
# baseline per CLAUDE.md discipline). Run on the real chip, ONE at a time.
set -u
cd "$(dirname "$0")/.."
run() {
  echo "=== $1 ==="
  shift
  local log
  log=$(mktemp)
  env "$@" FULL_ONLY=1 timeout 900 python scripts/perf_round3_map.py \
    > "$log" 2>&1
  local rc=$?
  grep -v WARNING "$log" | tail -3
  if [ $rc -ne 0 ]; then
    echo "!!! arm FAILED (rc=$rc) — chip may be wedged; pausing 150s"
    tail -15 "$log"
    sleep 150
  fi
}
# Every arm pins RAYGUN_SHELL_MEGA explicitly so arms stay
# self-describing and comparable even if the code default changes.
run "baseline (committed routes)" RAYGUN_SHELL_MEGA=
run "rbchain (chain-resident resblock backward)" RAYGUN_RBCHAIN=1 RAYGUN_SHELL_MEGA=
run "shell-mega d1" RAYGUN_SHELL_MEGA=d1
run "shell-mega d2" RAYGUN_SHELL_MEGA=d2
run "shell-mega u1" RAYGUN_SHELL_MEGA=u1
run "baseline re-measure (drift check)" RAYGUN_SHELL_MEGA=
