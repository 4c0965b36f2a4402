#!/bin/bash
# Recovery watcher for the round-4 timed round: on 2026-08-19 ~17:15 UTC
# the tunnel entered a shrunken-capacity state mid-round (B=32 text
# programs stopped COMPILING — helper exit 1 — and the B=24 image decode
# could no longer allocate; a leaked-HBM signature, not an outage: small
# programs kept running and step 4a finished on auto-split halves).
# Probe for FULL capacity (a 13.5 GB device allocation — the int8 7B
# serving footprint class), then rerun the failed stages and merge.
set -u
cd "$(dirname "$0")/.."
WLOG="${1:-outputs-timed/wait_and_finish_round.log}"
mkdir -p "$(dirname "$WLOG")"

probe_capacity() {
  timeout 700 python - <<'PY' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((128, 128), jnp.bfloat16)
assert float(jax.jit(lambda a: a @ a)(x).sum()) > 0      # alive
big = jax.jit(lambda: jnp.zeros((13_500_000_000,), jnp.int8))()
assert int(big[:8].sum()) == 0                            # full capacity
PY
}

echo "$(date -u +%FT%TZ) capacity watcher started" >> "$WLOG"
while true; do
  if probe_capacity; then
    echo "$(date -u +%FT%TZ) full capacity — rerunning stages 2,3,4,5" >> "$WLOG"
    timeout 6600 python scripts/run_timed_round.py --items 200 \
      --stages 2,3,4,5 --report ROUND_r04_rest.json \
      >> outputs-timed/round_r04_rest.console 2>&1
    rc=$?
    echo "$(date -u +%FT%TZ) rerun finished (rc=$rc)" >> "$WLOG"
    python scripts/merge_round_report.py ROUND_r04.json \
      ROUND_r04_rest.json ROUND_r04.json >> "$WLOG" 2>&1
    echo "$(date -u +%FT%TZ) merged -> ROUND_r04.json" >> "$WLOG"
    exit $rc
  fi
  echo "$(date -u +%FT%TZ) capacity still degraded" >> "$WLOG"
  sleep 300
done
