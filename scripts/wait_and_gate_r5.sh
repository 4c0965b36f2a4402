#!/bin/bash
# Round-5 post-round chain: wait for the running timed round (pid in
# /tmp/round_r05.pid) to finish, then run the w8a8 mixed-readout scoring
# gate (VERDICT r4 #6) while the chip is free.  Survives builder-session
# restarts — progress is keyed off POINT lines, reruns skip done work.
set -u
cd "$(dirname "$0")/.."

PIDFILE=/tmp/round_r05.pid
if [ -f "$PIDFILE" ]; then
  PID=$(cat "$PIDFILE")
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
  done
fi
echo "$(date -u +%FT%TZ) round process gone — starting gate campaign"
bash scripts/run_round_r5.sh gate
echo "$(date -u +%FT%TZ) gate campaign rc=$?"
