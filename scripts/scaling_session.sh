#!/usr/bin/env bash
# Probe-gated 8<->32 scaling session (BENCH.md protocol, round-5 ask:
# each session carries its own contention measurement).
#
# Loops: run scripts/contention_probe.py; when the register-kernel
# 8->32 efficiency clears GATE_REG_EFF and steal time is under
# GATE_STEAL percent, run the rep-2048 ScalingBench bracketed by a
# pre- and post-probe, appending all three JSON lines to GATE_OUT.
# Exits after a session measures scaling_efficiency >= 0.8, or after
# GATE_MAX_SESSIONS qualifying windows have been spent.
#
# Not part of the shipped library (host-side measurement harness).
set -u
cd "$(dirname "$0")/.."

THRESH=${GATE_REG_EFF:-0.85}
STEAL_MAX=${GATE_STEAL:-1.0}
OUT=${GATE_OUT:-scaling_sessions_r5.jsonl}
MAX_SESSIONS=${GATE_MAX_SESSIONS:-3}
SLEEP=${GATE_SLEEP:-240}
sessions=0

field() { python3 -c 'import json,sys; print(json.load(sys.stdin)[sys.argv[1]])' "$1"; }

while [ "$sessions" -lt "$MAX_SESSIONS" ]; do
  probe=$(python3 scripts/contention_probe.py)
  eff=$(echo "$probe" | field reg_eff_8_32)
  steal=$(echo "$probe" | field steal_pct_during_reg32)
  echo "$(date -Is) probe reg_eff=$eff steal=$steal" >&2
  ok=$(python3 -c "print(1 if $eff >= $THRESH and $steal <= $STEAL_MAX else 0)")
  if [ "$ok" = "1" ]; then
    sessions=$((sessions + 1))
    echo "{\"event\":\"pre_probe\",\"session\":$sessions,\"probe\":$probe}" >> "$OUT"
    line=$(SPARK_GRAFT_SCALE_REPLICATION=${GATE_REP:-2048} \
      SPARK_GRAFT_SCALE_ROUNDS=${GATE_ROUNDS:-2} \
      SPARK_GRAFT_SCALE_LO=${GATE_LO:-8} SPARK_GRAFT_SCALE_HI=${GATE_HI:-32} \
      sbt -batch "runMain graft.ScalingBench" 2>/dev/null \
      | grep -o '{"metric":"scaling".*}')
    echo "$line" >> "$OUT"
    post=$(python3 scripts/contention_probe.py)
    echo "{\"event\":\"post_probe\",\"session\":$sessions,\"probe\":$post}" >> "$OUT"
    seff=$(echo "$line" | field scaling_efficiency 2>/dev/null || echo 0)
    echo "$(date -Is) session $sessions scaling_efficiency=$seff" >&2
    met=$(python3 -c "print(1 if $seff >= 0.8 else 0)")
    [ "$met" = "1" ] && { echo "$(date -Is) target met, exiting" >&2; exit 0; }
  fi
  sleep "$SLEEP"
done
echo "$(date -Is) session budget exhausted without >=0.8" >&2
exit 1
