#!/bin/bash
# Round-4 stage-shape campaign (VERDICT r3 item 3): measure the
# shared-prefix text engine at each pipeline stage's REAL sequence
# shape so configs/step{1,2,4}.yaml batch sizes map to dated POINTs.
#
#   step 1: one ~600-token few-shot prompt repeated (identical rows),
#           ~120 new tokens (element lists)
#   step 2: ~1200-token few-shot template + ~48-token distinct tails,
#           512 new tokens (negative/dense rewrites)
#   step 4a: ~800-token template + distinct tails, 256 new tokens
#
# bench text mode falls back 64 -> 48 -> 32 -> 16 on OOM by itself, so
# each POINT records the largest green batch at that shape.
#
# Usage: bash scripts/measure_stage_shapes.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-outputs-timed/stage_shapes.log}"
mkdir -p "$(dirname "$LOG")"

run_point() {
  local tag="$1"; shift
  if grep -q "^POINT $tag " "$LOG" 2>/dev/null; then
    echo "# skip (done): $tag"; return 0
  fi
  echo "# running: $tag ($*)"
  local out
  out=$(timeout 2400 env "$@" python bench.py 2>>"$LOG.err")
  local rc=$?
  echo "POINT $tag rc=$rc $out" >> "$LOG"
  echo "POINT $tag rc=$rc $out"
}

timeout 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
print('health ok', float(jax.jit(lambda a: a@a)(x).sum()))" || {
  echo "tunnel down — aborting"; exit 2; }

run_point text_step1_p600 OSPO_BENCH_MODE=text OSPO_BENCH_PROMPT_LEN=600 \
    OSPO_BENCH_TAIL_LEN=0 OSPO_BENCH_TOKENS=128
run_point text_step2_p1200 OSPO_BENCH_MODE=text OSPO_BENCH_PROMPT_LEN=1200 \
    OSPO_BENCH_TAIL_LEN=48 OSPO_BENCH_TOKENS=512
run_point text_step4a_p800 OSPO_BENCH_MODE=text OSPO_BENCH_PROMPT_LEN=800 \
    OSPO_BENCH_TAIL_LEN=48 OSPO_BENCH_TOKENS=256

echo "stage-shape campaign complete — results in $LOG"
