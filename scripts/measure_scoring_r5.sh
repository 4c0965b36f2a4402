#!/bin/bash
# Round-5 scoring campaign (VERDICT r4 #6): the w8a8 fast mode failed the
# r4 pair-agreement gate (3/4 pairs, 86.1% answers vs int8's 4/4, 97.2%)
# — measurably noisier on near-tie yes/no readouts.  Hypothesis: the
# noise enters through the dynamic activation quantization of the SUFFIX
# passes (whose final position IS the readout), not the prefill-side
# cache.  Test: the precision-mixed readout (OSPO_SCORE_READOUT=w8a16 —
# suffix passes run weight-only on the same int8 payload, prefill keeps
# the 2x int8 MXU rate), re-gated against the same r4 bf16 reference
# export, plus its throughput at the w8a8 optimum (rows=14 uniform,
# 4657.1 pairs/h in r4) to price the mixed mode.
#
# Usage: bash scripts/measure_scoring_r5.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-outputs-timed/scoring_r5.log}"
mkdir -p "$(dirname "$LOG")"

run_point() {
  local tag="$1"; shift
  if grep -q "^POINT $tag " "$LOG" 2>/dev/null; then
    echo "# skip (done): $tag"; return 0
  fi
  echo "# running: $tag ($*)"
  local out
  out=$(timeout 3000 env "$@" python bench.py 2>>"$LOG.err")
  local rc=$?
  echo "POINT $tag rc=$rc $out" >> "$LOG"
  echo "POINT $tag rc=$rc $out"
}

gate() {
  local tag="$1" quant="$2"; shift 2
  if grep -q "^POINT $tag " "$LOG" 2>/dev/null; then
    echo "# skip (done): $tag"; return 0
  fi
  echo "# running gate: $tag"
  if timeout 3600 env OSPO_SCORE_READOUT=w8a16 \
      python scripts/validate_weights.py \
      --model_preset 7b --quantize "$quant" --phases scoring "$@" \
      >> "$LOG.gate" 2>&1; then
    echo "POINT $tag rc=0 $(grep "# scoring_" "$LOG.gate" | tail -1)" >> "$LOG"
  else
    echo "POINT $tag rc=$? see $LOG.gate" >> "$LOG"
  fi
  tail -1 "$LOG"
}

timeout 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
print('health ok', float(jax.jit(lambda a: a@a)(x).sum()))" || {
  echo "tunnel down — aborting"; exit 2; }

# 1. the mixed-readout gate against the SAME r4 bf16 reference export
#    (same fixture items + seeds -> directly comparable to sgate_w8a8's
#    3/4 / 86.1% and sgate_int8's 4/4 / 97.2%)
SREF=outputs-timed/sgate_ref
if [ ! -f "$SREF/scoring_ref.npz" ]; then
  echo "missing $SREF/scoring_ref.npz (r4 export) — aborting"; exit 3
fi
gate sgate_w8a8_mixed w8a8 --compare-reference "$SREF" \
    --out outputs-timed/sgate_w8a8_mixed

# 2. throughput cost of the mixed readout at the w8a8 optimum shape
run_point score_w8a8_rows14_uniform_mixed OSPO_BENCH_MODE=score \
    OSPO_BENCH_QUANT=w8a8 OSPO_BENCH_SCORE_ROWS=14 \
    OSPO_BENCH_SCORE_UNIFORM=1 OSPO_SCORE_READOUT=w8a16

echo "campaign complete — results in $LOG"
