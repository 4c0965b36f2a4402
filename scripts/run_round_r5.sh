#!/bin/bash
# Round-5 chip campaign driver (VERDICT r4 #1/#5/#6/#7):
#   1. full-capacity probe (13.5 GB class — the int8 7B footprint);
#   2. the 200-item end-to-end timed round -> ROUND_r05.json (every stage
#      ok, pairs in EVERY category, step 5 runs to completion);
#   3. the w8a8 mixed-readout scoring gate (measure_scoring_r5.sh);
#   4. (chip time permitting — run separately) the 562-item 1/8-quota
#      round -> ROUND_r05_562.json validating the <1 h claim.
#
# Usage: bash scripts/run_round_r5.sh [stage]   # stage: round|gate|562
set -u
cd "$(dirname "$0")/.."
mkdir -p outputs-timed

probe_capacity() {
  timeout 700 python - <<'PY' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((128, 128), jnp.bfloat16)
assert float(jax.jit(lambda a: a @ a)(x).sum()) > 0      # alive
big = jax.jit(lambda: jnp.zeros((13_500_000_000,), jnp.int8))()
assert int(big[:8].sum()) == 0                            # full capacity
PY
}

wait_capacity() {
  while ! probe_capacity; do
    echo "$(date -u +%FT%TZ) capacity degraded — waiting 300s"
    sleep 300
  done
  echo "$(date -u +%FT%TZ) full capacity"
}

STAGE="${1:-round}"
case "$STAGE" in
  round)
    wait_capacity
    timeout 14000 python scripts/run_timed_round.py --items 200 \
      --report ROUND_r05.json \
      > outputs-timed/round_r05.console 2>&1
    rc=$?
    echo "$(date -u +%FT%TZ) timed round rc=$rc"
    exit $rc
    ;;
  gate)
    wait_capacity
    bash scripts/measure_scoring_r5.sh outputs-timed/scoring_r5.log
    ;;
  562)
    wait_capacity
    # reuse the trained BPE (deterministic corpus — retraining wastes
    # ~20 min of the hour this run is trying to validate)
    if [ -f outputs-timed/local_bpe/tokenizer.json ]; then
      mkdir -p outputs-timed-562/local_bpe
      cp -n outputs-timed/local_bpe/tokenizer.json \
        outputs-timed-562/local_bpe/ 2>/dev/null || true
    fi
    timeout 21000 python scripts/run_timed_round.py --items 562 \
      --out outputs-timed-562 --report ROUND_r05_562.json \
      > outputs-timed/round_r05_562.console 2>&1
    rc=$?
    echo "$(date -u +%FT%TZ) 562-item round rc=$rc"
    exit $rc
    ;;
  *)
    echo "unknown stage: $STAGE"; exit 2
    ;;
esac
