#!/bin/bash
# Poll the axon tunnel; when a jitted compile answers, run the round-3
# redo campaign (scripts/measure_scoring_redo.sh).  Same shape as
# wait_and_measure.sh but with a longer probe timeout: on 2026-08-19 the
# tunnel was ALIVE but degraded (warm exec 69 s, cold jit compile
# >280 s), so a short probe misreads "slow" as "down".
set -u
cd "$(dirname "$0")/.."
WLOG="${1:-outputs-timed/wait_and_redo.log}"
mkdir -p "$(dirname "$WLOG")"

probe() {
  timeout 700 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((128, 128), jnp.bfloat16)
assert float(jax.jit(lambda a: a @ a)(x).sum()) > 0
EOF
}

echo "$(date -u +%FT%TZ) watcher started" >> "$WLOG"
while true; do
  if probe; then
    echo "$(date -u +%FT%TZ) tunnel UP — starting redo campaign" >> "$WLOG"
    bash scripts/measure_scoring_redo.sh outputs-timed/scoring_redo.log \
      >> "$WLOG" 2>&1
    rc=$?
    echo "$(date -u +%FT%TZ) campaign finished (rc=$rc)" >> "$WLOG"
    exit 0
  fi
  echo "$(date -u +%FT%TZ) tunnel still slow/down" >> "$WLOG"
  sleep 300
done
