#!/bin/bash
# Poll the axon tunnel; when it answers, run the round-3 measurement
# campaign (scripts/measure_shared_prefix.sh).  Designed to run in the
# background for hours: probes every 10 min with a hard timeout, logs
# every attempt, and runs the campaign at most once.
set -u
cd "$(dirname "$0")/.."
WLOG="${1:-outputs-timed/wait_and_measure.log}"
mkdir -p "$(dirname "$WLOG")"

probe() {
  timeout 180 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((128, 128), jnp.bfloat16)
assert float(jax.jit(lambda a: a @ a)(x).sum()) > 0
EOF
}

echo "$(date -u +%FT%TZ) watcher started" >> "$WLOG"
while true; do
  if probe; then
    echo "$(date -u +%FT%TZ) tunnel UP — starting campaign" >> "$WLOG"
    bash scripts/measure_shared_prefix.sh outputs-timed/shared_prefix_sweep.log \
      >> "$WLOG" 2>&1
    rc=$?  # capture BEFORE the $(date) substitution resets $?
    echo "$(date -u +%FT%TZ) campaign finished (rc=$rc)" >> "$WLOG"
    exit 0
  fi
  echo "$(date -u +%FT%TZ) tunnel still down" >> "$WLOG"
  sleep 600
done
