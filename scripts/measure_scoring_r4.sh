#!/bin/bash
# Round-4 scoring campaign: (a) the scoring-WORKLOAD quality gate at 7B
# (yes/no readout divergence + pair-selection agreement vs a bf16
# reference — the generation gate measures a different regime), for the
# int8 qualified default AND the w8a8 fast mode whose 4234 pairs/h is
# quality-blocked; (b) production-shaped (Q-uniform: step 4 Q-sorts its
# chunks) serving points and the freed-HBM rows sweep upward.
#
# Usage: bash scripts/measure_scoring_r4.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-outputs-timed/scoring_r4.log}"
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

gate() {
  local tag="$1" quant="$2"; shift 2
  if grep -q "^POINT $tag " "$LOG" 2>/dev/null; then
    echo "# skip (done): $tag"; return 0
  fi
  if timeout 3600 python scripts/validate_weights.py \
      --model_preset 7b --quantize "$quant" --phases scoring "$@" \
      >> "$LOG.gate" 2>&1; then
    echo "POINT $tag rc=0 $(grep "# scoring_" "$LOG.gate" | tail -1)" >> "$LOG"
  else
    echo "POINT $tag rc=$? see $LOG.gate" >> "$LOG"
  fi
}

timeout 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
print('health ok', float(jax.jit(lambda a: a@a)(x).sum()))" || {
  echo "tunnel down — aborting"; exit 2; }

# 1. scoring-workload gate (two-process; bf16 reference exported once)
SREF=outputs-timed/sgate_ref
if [ ! -f "$SREF/scoring_ref.npz" ]; then
  if timeout 3600 python scripts/validate_weights.py \
      --model_preset 7b --quantize none --phases scoring \
      --export-reference "$SREF" --out outputs-timed/sgate_export \
      >> "$LOG.gate" 2>&1; then
    echo "POINT sgate_export rc=0 exported -> $SREF" >> "$LOG"
  else
    echo "POINT sgate_export rc=$? see $LOG.gate" >> "$LOG"
  fi
fi
gate sgate_int8 int8 --compare-reference "$SREF" --out outputs-timed/sgate_int8
gate sgate_w8a8 w8a8 --compare-reference "$SREF" --out outputs-timed/sgate_w8a8

# 2. production-shaped (Q-uniform) serving points
run_point score_rows16_uniform OSPO_BENCH_MODE=score \
    OSPO_BENCH_SCORE_ROWS=16 OSPO_BENCH_SCORE_UNIFORM=1
run_point score_w8a8_rows14_uniform OSPO_BENCH_MODE=score \
    OSPO_BENCH_QUANT=w8a8 OSPO_BENCH_SCORE_ROWS=14 OSPO_BENCH_SCORE_UNIFORM=1

# 3. freed-HBM rows sweep upward (ascending risk — OOMs last)
run_point score_rows18 OSPO_BENCH_MODE=score OSPO_BENCH_SCORE_ROWS=18
run_point score_rows20 OSPO_BENCH_MODE=score OSPO_BENCH_SCORE_ROWS=20

# 4. complete the Q-uniform (production-shape) quantize × rows grid; the
#    first w8a8 rows14 uniform point (3553.5) contradicts the mixed-Q
#    ordering (uniform does strictly less suffix work) — re-measure it
run_point score_rows14_uniform OSPO_BENCH_MODE=score \
    OSPO_BENCH_SCORE_ROWS=14 OSPO_BENCH_SCORE_UNIFORM=1
run_point score_w8a8_rows16_uniform OSPO_BENCH_MODE=score \
    OSPO_BENCH_QUANT=w8a8 OSPO_BENCH_SCORE_ROWS=16 OSPO_BENCH_SCORE_UNIFORM=1
run_point score_w8a8_rows14_uniform_v2 OSPO_BENCH_MODE=score \
    OSPO_BENCH_QUANT=w8a8 OSPO_BENCH_SCORE_ROWS=14 OSPO_BENCH_SCORE_UNIFORM=1

echo "scoring r4 campaign complete — results in $LOG"
