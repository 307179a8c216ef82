#!/bin/bash
# DedupSpec flake capture harness (round-17 WATCH, round-18 evidence):
# N standalone DedupSpec runs + M full suites, all with -oF full stack
# traces, logs tee'd under /tmp/flake_hunt/. If the flake ever
# reappears, the failing run's full log survives.
set -e
cd "$(dirname "$0")/.."
N="${N:-20}"; M="${M:-3}"
eval "$(bash tools/live_pg.sh | grep '^export')"
mkdir -p /tmp/flake_hunt
for n in $(seq 1 "$N"); do
  echo "=== DedupSpec run $n/$N $(date +%T) ==="
  sbt -batch "testOnly graft.DedupSpec -- -oF" \
    > /tmp/flake_hunt/dedup_$n.log 2>&1 || echo "RUN $n FAILED — log kept"
  grep -E "Tests: " /tmp/flake_hunt/dedup_$n.log | tail -1
done
for n in $(seq 1 "$M"); do
  echo "=== full suite run $n/$M $(date +%T) ==="
  sbt -batch "testOnly * -- -oF" \
    > /tmp/flake_hunt/suite_$n.log 2>&1 || echo "SUITE $n FAILED — log kept"
  grep -E "Passed: Total" /tmp/flake_hunt/suite_$n.log | tail -1
done
