#!/bin/bash
# Round-3 chip measurement campaign (run when the axon tunnel recovers).
#
# One subprocess per point — the tunneled chip ignores buffer donation, so
# a fresh process per measurement is the only reliable HBM reset (see
# BENCH_NOTES "Measurement pitfalls").  Appends one line per point to
# $LOG; safe to re-run (skips points already in the log).  Risky
# (possibly-OOM) large-batch points run LAST so a worker crash can't
# poison the cheap points.
#
# Usage: bash scripts/measure_shared_prefix.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-outputs-timed/shared_prefix_sweep.log}"
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

# 0. health check (fail the whole campaign fast if the tunnel is down)
timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
print('health ok', float(jax.jit(lambda a: a@a)(x).sum()))" || {
  echo "tunnel down — aborting"; exit 2; }

# 1. headline re-verification (post-SJD-fix image decode, serving default)
run_point image_default OSPO_BENCH_MODE=image

# 2. text A/B at the current serving batch (64): step-1 shape (identical
#    prompts) and step-2 shape (long template + distinct 48-token tails)
for SHARED in 1 0; do
  run_point "text_p120_t0_s${SHARED}"  OSPO_BENCH_MODE=text OSPO_BENCH_BATCH=64 \
      OSPO_BENCH_PROMPT_LEN=120 OSPO_BENCH_TAIL_LEN=0  OSPO_SHARED_PREFIX=$SHARED
  run_point "text_p768_t48_s${SHARED}" OSPO_BENCH_MODE=text OSPO_BENCH_BATCH=64 \
      OSPO_BENCH_PROMPT_LEN=768 OSPO_BENCH_TAIL_LEN=48 OSPO_SHARED_PREFIX=$SHARED
done

# 3. scoring: bf16-weight prefill + int8 prefix KV (HBM-borderline —
#    descending rows, stop at the first fit), vs the int8-trunk default
run_point score_int8_rows14 OSPO_BENCH_MODE=score
for ROWS in 10 8 6; do
  run_point "score_bf16_rows${ROWS}" OSPO_BENCH_MODE=score OSPO_BENCH_QUANT= \
      OSPO_BENCH_SCORE_KV=int8 OSPO_BENCH_SCORE_ROWS=$ROWS
  grep -q "^POINT score_bf16_rows${ROWS} rc=0 .*pairs" "$LOG" && break
done

# 3b. scoring pre-image prefix_kv A/B (default = preimg on), and the
#     freed-HBM rows=16 retry that OOMed on the single-segment program
run_point score_rows14_preimg0 OSPO_BENCH_MODE=score OSPO_SCORE_PREIMG=0
run_point score_rows16_preimg1 OSPO_BENCH_MODE=score OSPO_BENCH_SCORE_ROWS=16

# 3c. int4g (group-wise int4 weights — per-row int4's quality fix):
#     decode-shape matmul cost, then the two-process 7B weight gate,
#     then the capacity serving point (int4's measured peak was B=32)
if ! grep -q "^POINT int4g_matmul " "$LOG" 2>/dev/null; then
  timeout 1800 python scripts/int4_matmul_bench.py 40 >> "$LOG.int4g" 2>&1 \
    && echo "POINT int4g_matmul rc=0 see $LOG.int4g" >> "$LOG" \
    || echo "POINT int4g_matmul rc=$? see $LOG.int4g" >> "$LOG"
fi
# run_gate <mode>: two-process 7B weight gate for one quantize mode —
# exports the shared bf16 reference once, compares, logs the kl/top-1
# pulled from the (indented) JSON report by key, not by fragile grep
run_gate() {
  local mode="$1"
  grep -q "^POINT ${mode}_gate " "$LOG" 2>/dev/null && {
    echo "# skip (done): ${mode}_gate"; return 0; }
  local REF=outputs-timed/wgate_ref GLOG="$LOG.$mode"
  [ -f "$REF/meta.json" ] || timeout 3600 python scripts/validate_weights.py \
      --model_preset 7b --quantize none --phases divergence \
      --export-reference "$REF" --out outputs-timed/wgate_export >> "$GLOG" 2>&1
  if timeout 3600 python scripts/validate_weights.py \
      --model_preset 7b --quantize "$mode" --phases divergence \
      --compare-reference "$REF" --out "outputs-timed/wgate_$mode" \
      >> "$GLOG" 2>&1; then
    local metric
    metric=$(python - "$mode" <<'PY'
import json, sys
d = json.load(open(f"outputs-timed/wgate_{sys.argv[1]}/validation_report.json"))
k = next(k for k in d if k.startswith("w_"))
print(f"{k} kl={d[k]['kl_mean']:.4f} top1={d[k]['top1_agree']:.3f}")
PY
)
    echo "POINT ${mode}_gate rc=0 $metric" >> "$LOG"
  else
    echo "POINT ${mode}_gate rc=$? see $GLOG" >> "$LOG"
  fi
}

run_gate int4g
run_point image_int4g_b32 OSPO_BENCH_MODE=image OSPO_BENCH_QUANT=int4g \
    OSPO_BENCH_BATCH=32

# 3d. W8A8 (dynamic int8 activations — the MXU's 2× int8 rate for
#     compute-bound prefills): prefill-shape microbench (does the int8
#     dot actually run ~2×?), the 7B quality gate vs the bf16 reference,
#     then the scoring serving point (prefill-MXU-bound stage)
if ! grep -q "^POINT w8a8_prefill " "$LOG" 2>/dev/null; then
  timeout 1800 python scripts/w8a8_prefill_bench.py 14 704 >> "$LOG.w8a8" 2>&1 \
    && echo "POINT w8a8_prefill rc=0 see $LOG.w8a8" >> "$LOG" \
    || echo "POINT w8a8_prefill rc=$? see $LOG.w8a8" >> "$LOG"
fi
run_gate w8a8
run_point score_w8a8_rows14 OSPO_BENCH_MODE=score OSPO_BENCH_QUANT=w8a8
# train-step A/B (same session, interleaved-once: the 2B concatenated
# forward is the compute-bound large-M regime w8a8 targets)
run_point train_int8_b4 OSPO_BENCH_MODE=train OSPO_BENCH_QUANT=int8 \
    OSPO_BENCH_BATCH=4
run_point train_w8a8_b4 OSPO_BENCH_MODE=train OSPO_BENCH_QUANT=w8a8 \
    OSPO_BENCH_BATCH=4
# (SJD sharpen probe deliberately NOT queued: the CPU 1b experiment
# showed sharpening random-weight logits DECREASES acceptance — see
# BENCH_NOTES "SJD acceptance on random weights" — so a chip sweep would
# answer an already-answered question.)

# 4. shared-path batch sweep upward (the old B=80 OOM wall was prefix KV;
#    riskiest points last, ascending so the first OOM stops the sweep)
for B in 96 128 192 256; do
  run_point "text_p768_t48_s1_b${B}" OSPO_BENCH_MODE=text OSPO_BENCH_BATCH=$B \
      OSPO_BENCH_PROMPT_LEN=768 OSPO_BENCH_TAIL_LEN=48 OSPO_SHARED_PREFIX=1 \
      || break
  grep -q "^POINT text_p768_t48_s1_b${B} rc=0 .*\"value\": 0.0" "$LOG" && break
done

echo "campaign complete — results in $LOG"
