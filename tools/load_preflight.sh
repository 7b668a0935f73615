#!/bin/bash
# Idle-host preflight for record-writing probe scripts (r13 verdict
# item 7): Bench.scala already gates the per-round bench on host load
# (commit cd68f40); this applies the same discipline to the probe
# scripts so no future committed record needs a host-load adjudication
# round (the r12 bench did — 38 wall-only "regressions" that were all
# co-tenant load).
#
# Usage: source tools/load_preflight.sh  (after set -u)
# Honors LOAD_GATE_MAX (1-min load average ceiling, default 4.0 — the
# box has 32 cores; anything above a few indicates a co-tenant sweep
# still draining) and LOAD_GATE_SKIP=1 to bypass with an explicit ack
# (the bypass is recorded in the env so a record builder can stamp it).
LOAD_GATE_MAX=${LOAD_GATE_MAX:-4.0}
_load1=$(cut -d' ' -f1 /proc/loadavg)
if [ "${LOAD_GATE_SKIP:-0}" != "1" ] && \
   awk -v l="$_load1" -v m="$LOAD_GATE_MAX" 'BEGIN{exit !(l>m)}'; then
  echo "load_preflight: 1-min load $_load1 > $LOAD_GATE_MAX — host is not" >&2
  echo "idle; records written now would need adjudication. Wait for the" >&2
  echo "load to drain or rerun with LOAD_GATE_SKIP=1 (recorded)." >&2
  exit 9
fi
export LOAD_GATE_AT_START="$_load1"
