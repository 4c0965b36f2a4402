#!/bin/bash
# Round-3 redo campaign: the first shared-prefix sweep ran every scoring
# point with a BF16 trunk + bf16 prefix cache (bench_score never applied
# the configs/step4.yaml int8 serving defaults — all 6 points OOMed by
# 1-10 GB), the int4g gate OOMed in the post-build incremental quantize
# (fixed: fused init-time quantization for random-init runs), and the
# w8a8/int4 microbenches reported fantasy timings (identical-execution
# memoization + missing scalar-fetch sync).  This re-runs those points
# with the fixes; one subprocess per point (HBM reset), skip-if-done.
#
# Usage: bash scripts/measure_scoring_redo.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-outputs-timed/scoring_redo.log}"
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

# 0. health check (900 s: a degraded tunnel can take minutes to answer a
# cold jitted compile — observed 2026-08-19 — and the campaign's own
# per-point timeouts already bound a truly dead tunnel)
timeout 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
print('health ok', float(jax.jit(lambda a: a@a)(x).sum()))" || {
  echo "tunnel down — aborting"; exit 2; }

# 1. scoring serving points, production defaults (int8 W + int8 prefix KV
#    now applied by bench_score itself): default rows=14 with the
#    pre-image shared segment, its A/B control, and the w8a8 variant
run_point score_int8_rows14   OSPO_BENCH_MODE=score
run_point score_rows14_preimg0 OSPO_BENCH_MODE=score OSPO_SCORE_PREIMG=0
run_point score_w8a8_rows14   OSPO_BENCH_MODE=score OSPO_BENCH_QUANT=w8a8

# 2. microbench redo (fixed harness: varied inputs + scalar-fetch sync)
if ! grep -q "^POINT w8a8_prefill_v2 " "$LOG" 2>/dev/null; then
  timeout 1800 python scripts/w8a8_prefill_bench.py 14 704 >> "$LOG.w8a8" 2>&1 \
    && echo "POINT w8a8_prefill_v2 rc=0 see $LOG.w8a8" >> "$LOG" \
    || echo "POINT w8a8_prefill_v2 rc=$? see $LOG.w8a8" >> "$LOG"
fi
if ! grep -q "^POINT int4g_matmul_v2 " "$LOG" 2>/dev/null; then
  timeout 1800 python scripts/int4_matmul_bench.py 40 >> "$LOG.int4g" 2>&1 \
    && echo "POINT int4g_matmul_v2 rc=0 see $LOG.int4g" >> "$LOG" \
    || echo "POINT int4g_matmul_v2 rc=$? see $LOG.int4g" >> "$LOG"
fi

# 3. int4g weight gate (reuses the bf16 reference exported by the first
#    campaign; the compare process now quantizes inside the init program)
if ! grep -q "^POINT int4g_gate_v2 " "$LOG" 2>/dev/null; then
  GLOG="$LOG.int4g" REF=outputs-timed/wgate_ref
  # guard on ref_logits.npy, not meta.json: the first campaign's export
  # died between the two saves, leaving a meta.json that skipped the
  # re-export and a compare that crashed on the missing logits (round-4
  # int4g_gate_v2 rc=1)
  if [ ! -f "$REF/ref_logits.npy" ]; then
    timeout 3600 python scripts/validate_weights.py \
      --model_preset 7b --quantize none --phases divergence \
      --export-reference "$REF" --out outputs-timed/wgate_export >> "$GLOG" 2>&1
  fi
  if timeout 3600 python scripts/validate_weights.py \
      --model_preset 7b --quantize int4g --phases divergence \
      --compare-reference "$REF" --out outputs-timed/wgate_int4g \
      >> "$GLOG" 2>&1; then
    metric=$(python - <<'PY'
import json
d = json.load(open("outputs-timed/wgate_int4g/validation_report.json"))
dv = d["divergence"]
k = next(k for k in dv if k.startswith("w_"))
print(f"{k} kl={dv[k]['kl_mean']:.4f} top1={dv[k]['top1_agree']:.3f}")
PY
)
    echo "POINT int4g_gate_v2 rc=0 $metric" >> "$LOG"
  else
    echo "POINT int4g_gate_v2 rc=$? see $GLOG" >> "$LOG"
  fi
fi

# 4. capacity points, ascending risk (OOMs last so a worker crash can't
#    poison the cheap points): int4 B=32 control (re-confirm the
#    pre-outage 1062.4 still fits after the prefix_kv plumbing), then
#    int4g B=32, then the freed-HBM rows=16 scoring retry
run_point image_int4_b32_ctrl OSPO_BENCH_MODE=image OSPO_BENCH_QUANT=int4 \
    OSPO_BENCH_BATCH=32
run_point image_int4g_b32_v2  OSPO_BENCH_MODE=image OSPO_BENCH_QUANT=int4g \
    OSPO_BENCH_BATCH=32
run_point score_rows16_preimg1 OSPO_BENCH_MODE=score OSPO_BENCH_SCORE_ROWS=16

echo "campaign complete — results in $LOG"

# 5. round-4 follow-ups: rows=16 won over rows=14 on freed HBM — measure
#    the w8a8 variant at the new row count too
run_point score_w8a8_rows16 OSPO_BENCH_MODE=score OSPO_BENCH_QUANT=w8a8 \
    OSPO_BENCH_SCORE_ROWS=16
