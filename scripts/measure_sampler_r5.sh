#!/bin/bash
# Round-5 sampler campaign: the integrated round (ROUND_r05.json) showed
# step-2 decode running ~4x below its r4 POINT — the POINT was measured
# with top_p=None while production samples at top_p=0.5, and the exact
# nucleus filter pays two full-vocab (102400) argsorts per decode step.
# ops/sampling.top_p_sample_topk removes them (lax.top_k, K=64, exact
# whenever the nucleus fits).  This campaign
#   1. re-measures the step-2 stage POINT at the PRODUCTION sampler with
#      the old exact filter (confirms the mechanism),
#   2. measures the corrected POINT with the top-k sampler (the number
#      configs/step2.yaml should cite),
#   3. same for step-4a's top_p=0.9 shape,
#   4. re-runs INTEGRATED step 2 (200 items, BPE lengths) with the fix —
#      VERDICT r4 #4's done-criterion is integrated steady-state within
#      ~25% of the quoted POINT.
# Reference workload: ospo/step2.py:15-82 (HF generate top_p sampling at
# ospo/wrapper/text_generation.py:63-81).
#
# Usage: bash scripts/measure_sampler_r5.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-outputs-timed/sampler_r5.log}"
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

# 1. production sampler, OLD exact filter — the regime the integrated
#    round actually ran (expect ~4x below the 1378 top_p=None point)
run_point text_step2_p1200_topp05_exact OSPO_BENCH_MODE=text \
    OSPO_BENCH_PROMPT_LEN=1200 OSPO_BENCH_TAIL_LEN=48 \
    OSPO_BENCH_TOKENS=512 OSPO_BENCH_BATCH=32 \
    OSPO_BENCH_TOP_P=0.5 OSPO_TOPP_EXACT=1

# 2. production sampler, top-k nucleus (the new default)
run_point text_step2_p1200_topp05_topk OSPO_BENCH_MODE=text \
    OSPO_BENCH_PROMPT_LEN=1200 OSPO_BENCH_TAIL_LEN=48 \
    OSPO_BENCH_TOKENS=512 OSPO_BENCH_BATCH=32 \
    OSPO_BENCH_TOP_P=0.5

# 3. step-4a shape at its production top_p=0.9
run_point text_step4a_p800_topp09_topk OSPO_BENCH_MODE=text \
    OSPO_BENCH_PROMPT_LEN=800 OSPO_BENCH_TAIL_LEN=48 \
    OSPO_BENCH_TOKENS=256 OSPO_BENCH_TOP_P=0.9

# 4. integrated step-2 rerun with the fixed sampler (same 200 items,
#    same BPE, fresh out dir so the committed round artifacts stay put)
if [ ! -f outputs-timed/ROUND_r05_step2topk.json ] && \
   ! grep -q '^STEP2TOPK rc=0' "$LOG" 2>/dev/null; then
  mkdir -p outputs-timed-s2topk/local_bpe
  cp -n outputs-timed/local_bpe/tokenizer.json \
    outputs-timed-s2topk/local_bpe/ 2>/dev/null || true
  timeout 7000 python scripts/run_timed_round.py --items 200 --stages 2 \
    --out outputs-timed-s2topk --report ROUND_r05_step2topk.json \
    > outputs-timed/round_r05_step2topk.console 2>&1
  rc=$?
  echo "STEP2TOPK rc=$rc $(date -u +%FT%TZ)" >> "$LOG"
  # keep the evidence with the rest of the round-5 logs
  cp -f ROUND_r05_step2topk.json outputs-timed/ 2>/dev/null || true
fi

echo "sampler campaign complete — results in $LOG"
