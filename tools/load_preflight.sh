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
# steal preflight (r14): hypervisor steal is INVISIBLE to load average
# yet inflates guest task-CPU accounting 1.6-2.7x during co-tenant
# bursts (the r13 "shared-JVM cpu inflation" — adjudicated this round).
# Sample 3s; refuse above ~2% of a 32-core host's capacity.
_s0=$(awk '/^cpu /{print $9}' /proc/stat); sleep 3
_s1=$(awk '/^cpu /{print $9}' /proc/stat)
_steal=$((_s1 - _s0))
if [ "${LOAD_GATE_SKIP:-0}" != "1" ] && [ "$_steal" -gt "${STEAL_GATE_MAX:-192}" ]; then
  echo "load_preflight: steal $_steal jiffies/3s — a co-tenant is" >&2
  echo "stealing cycles; cpu_s measured now would be inflated. Wait or" >&2
  echo "rerun with LOAD_GATE_SKIP=1 (recorded)." >&2
  exit 9
fi
export LOAD_GATE_AT_START="$_load1" STEAL_GATE_AT_START="$_steal"
