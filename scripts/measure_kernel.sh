#!/bin/bash
# Round-4 kernel campaign: measure the Pallas single-stream W4A16(-g)
# decode matmul (ops/int4_matmul.py) on the real chip.
#
# 1. microbench: pallas vs the XLA formulations at decode shapes
# 2. AOT memory diff: does int4g B=32 now fit? (the XLA [B,T,F,G] temp
#    pushed it to 18.59 GB; the kernel keeps scales in VMEM)
# 3. serving points: int4 / int4g B=32 with the kernel, then the int8
#    B=24 qualified-default re-verify for BENCH_r04
#
# Usage: bash scripts/measure_kernel.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-outputs-timed/kernel_campaign.log}"
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

if ! grep -q "^POINT int4_matmul_pallas " "$LOG" 2>/dev/null; then
  timeout 1800 python scripts/int4_matmul_bench.py 40 >> "$LOG.ubench" 2>&1 \
    && echo "POINT int4_matmul_pallas rc=0 see $LOG.ubench" >> "$LOG" \
    || echo "POINT int4_matmul_pallas rc=$? see $LOG.ubench" >> "$LOG"
fi

if ! grep -q "^POINT memdiff_b32 " "$LOG" 2>/dev/null; then
  timeout 1800 python scripts/int4g_memdiff.py 32 int4,int4g \
    >> "$LOG.memdiff" 2>&1 \
    && echo "POINT memdiff_b32 rc=0 see $LOG.memdiff" >> "$LOG" \
    || echo "POINT memdiff_b32 rc=$? see $LOG.memdiff" >> "$LOG"
fi

run_point image_int4_b32_kernel  OSPO_BENCH_MODE=image OSPO_BENCH_QUANT=int4 \
    OSPO_BENCH_BATCH=32
run_point image_int4g_b32_kernel OSPO_BENCH_MODE=image OSPO_BENCH_QUANT=int4g \
    OSPO_BENCH_BATCH=32
# qualified-default re-verify at the round-4 tree (BENCH_r04 headline)
run_point image_int8_b24_r4      OSPO_BENCH_MODE=image OSPO_BENCH_BATCH=24

echo "kernel campaign complete — results in $LOG"
