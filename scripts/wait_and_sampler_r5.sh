#!/bin/bash
# Chain the round-5 sampler campaign after the scoring-gate campaign
# currently holding the chip (pid in /tmp/gate_campaign.pid, else the
# first 'run_round_r5.sh gate' process found at start).  Same pattern as
# wait_and_gate_r5.sh: survives builder-session restarts, POINT lines
# make reruns skip finished work.
set -u
cd "$(dirname "$0")/.."

PIDFILE=/tmp/gate_campaign.pid
PID=""
[ -f "$PIDFILE" ] && PID=$(cat "$PIDFILE")
if [ -n "$PID" ]; then
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
  done
fi
echo "$(date -u +%FT%TZ) gate campaign gone — starting sampler campaign"
bash scripts/measure_sampler_r5.sh outputs-timed/sampler_r5.log
echo "$(date -u +%FT%TZ) sampler campaign rc=$?"
