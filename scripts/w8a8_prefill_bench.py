"""Does int8×int8 reach the MXU's 2× rate at PREFILL shapes?

The decode-shape finding (scripts/int8_attention_bench.py, BENCH_NOTES)
was that XLA never routes M=1 int8 dots to the MXU — int8 arithmetic
LOST there.  Scoring prefill is the opposite regime: M = rows × tokens
≈ 10k, compute-bound at ~45% of bf16 MXU peak, and v5e's int8 MXU rate
is 2× bf16 (394 INT8 TOPS vs 197 bf16 TFLOPS).  This times the full 7B
MLP stack (30 × [11008, 4096]) at the scoring-prefill shape under:

- bf16              : the arithmetic ceiling reference
- int8 W (W8A16)    : the shipped scoring default — convert fused into
                      the dot read; arithmetic still bf16
- W8A8 dynamic      : per-token int8 activations quantized in-program +
                      int8×int8 dot with int32 accumulation
                      (ops/quant.quantized_matmul_w8a8)
- W8A8 dot-only     : activations quantized once for the whole stack
                      (outside the per-layer work) — the gap to "W8A8
                      dynamic" is the activation-quantization overhead

Run on the real chip:  python scripts/w8a8_prefill_bench.py [rows] [tokens]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

# self-contained path setup: add the repo root WITHOUT touching
# PYTHONPATH (replacing PYTHONPATH drops the environment's plugin site
# and the TPU backend with it)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ospo_tpu.ops import quant  # noqa: E402
from ospo_tpu.platform import apply_platform_env  # noqa: E402

# honor OSPO_PLATFORM=cpu (smoke runs while the tunnel is down) — the
# env var alone is not enough because a sitecustomize pre-imports jax
apply_platform_env()

# full 7B MLP stack; OSPO_W8A8_SHAPE="L,F,D" overrides (CPU smoke tests)
L, F, D = (int(v) for v in
           os.environ.get("OSPO_W8A8_SHAPE", "30,11008,4096").split(","))
ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 14
TOKS = int(sys.argv[2]) if len(sys.argv) > 2 else 704
REPS = int(os.environ.get("OSPO_W8A8_REPS", "4"))
TFLOP = 2 * ROWS * TOKS * F * D * L * REPS / 1e12


def timeit(name, fn, xs, *args):
    """Time ``fn(x, *args)`` once per DISTINCT x in ``xs`` (identical
    executions are memoized by the tunneled executor) and sync each
    iteration by fetching a scalar (block_until_ready alone returns
    without a round trip on this backend) — BENCH_NOTES "Measurement
    pitfalls"."""
    try:
        fn_j = jax.jit(lambda x_, *a: fn(x_, *a).astype(jnp.float32).sum())
        float(fn_j(xs[0], *args))  # compile + warm
        times = []
        for x_ in xs[1:]:
            t0 = time.time()
            float(fn_j(x_, *args))
            times.append(time.time() - t0)
        dt = min(times)
        print(f"{name:16s} {dt*1e3:8.2f} ms  "
              f"{TFLOP/dt:7.1f} TFLOP/s-equiv  (rows={ROWS} toks={TOKS})")
        return dt
    except Exception as e:
        print(f"{name:16s} FAILED: {type(e).__name__}: {e}")
        return None


def main():
    key = jax.random.PRNGKey(0)
    print(f"# init weights... ({TFLOP:.1f} TFLOP per chain)", flush=True)

    @jax.jit
    def build(key):
        w = jax.random.normal(key, (L, F, D), jnp.bfloat16) * 0.02
        xs = [jax.random.normal(jax.random.fold_in(key, i),
                                (ROWS, TOKS, D), jnp.bfloat16)
              for i in range(1, 5)]
        return w, xs, quant.quantize_matrix(w), quant.quantize_matrix_w8a8(w)

    w, xs, q8, qa = jax.block_until_ready(build(key))
    print("# inputs ready", flush=True)

    # x rides as a jit ARGUMENT everywhere (an ~80MB closure constant
    # risks the tunnel's HTTP-413 compile-payload rejection).  REPS
    # chains make compute ≫ the ~30 ms tunnel RTT per synced call.
    def scan_over(f, x_, weights):
        # chain activations through every layer so no two matmuls share an
        # input (CSE-proof); each step reads one [F, D] slice exactly once.
        # y is consumed by a FULL-F reduce — a narrow y[..., :D] slice
        # would let XLA shrink the dot itself (slice-through-dot).
        def body(acc, wl):
            y = f(acc, wl)                       # [ROWS, TOKS, F]
            bump = y.astype(jnp.float32).sum(-1, keepdims=True) * 1e-6
            return (acc + bump.astype(acc.dtype)), None
        for _ in range(REPS):
            x_, _ = jax.lax.scan(body, x_, weights)
        return x_

    timeit("bf16", lambda x_, w_: scan_over(
        lambda h, wl: jnp.einsum("btd,fd->btf", h, wl), x_, w_), xs, w)
    timeit("int8 W (W8A16)", lambda x_, q_: scan_over(
        quant.quantized_matmul, x_, q_), xs, q8)
    timeit("w8a8 dynamic", lambda x_, q_: scan_over(
        quant.quantized_matmul_w8a8, x_, q_), xs, qa)

    # dot-only variant: activations quantized ONCE, outside the timed
    # scan — every layer reuses the same xq against its OWN weights
    # (distinct dots, so nothing CSEs away; the f32 carry sum prevents
    # DCE).  The gap between this and "w8a8 dynamic" above IS the
    # per-layer activation-quantization overhead.
    def dots_only(x_, q_):
        def body(carry, wl_s):
            acc, xq, sx = carry
            y = jnp.einsum("btd,fd->btf", xq, wl_s["q"],
                           preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * sx * wl_s["sa"]
            # full-tensor reduce: a narrow slice here would let XLA shrink
            # the dot itself (slice-through-dot narrowing) and fake the time
            return (acc + y.sum(), xq, sx), None

        acc = jnp.float32(0.0)
        for r in range(REPS):
            # re-quantize a perturbed x per rep so reps can't CSE; the
            # inner scan still reuses ONE quantized activation per rep
            xq, sx = quant.quantize_activations_int8(x_ + jnp.bfloat16(r))
            (acc, _, _), _ = jax.lax.scan(body, (acc, xq, sx), q_)
        return acc

    timeit("w8a8 dot-only", dots_only, xs, qa)


if __name__ == "__main__":
    main()
