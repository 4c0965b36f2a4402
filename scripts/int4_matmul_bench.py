"""Why is W4A16 not faster than W8A16 at the serving point?

Times the decode-shape projection matmul (rows = 2*batch CFG rows,
stacked over layers like the real scan) under four weight
representations:

- bf16            : 2 bytes/weight streamed
- int8 {q,s}      : 1 byte/weight, convert fused into the dot read
- int4 two-plane  : 0.5 byte/weight stored, but TWO einsums each read
                    the packed array -> effectively 1 byte/weight of
                    HBM traffic (the shipped quantized_matmul_int4)
- int4 native s4  : 0.5 byte/weight, ONE dot over jnp.int4 storage --
                    viable only if XLA lowers the s4 convert+dot without
                    materialising (and without the historical
                    RecursionError on this backend)

Run on the real chip:  python scripts/int4_matmul_bench.py [rows]
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

L, F, D = 30, 11008, 4096   # full 7B MLP stack
REPS = 4                    # chained repeats: 120 × 90 MB weight reads
                            # (10.8 GB bf16) so the stream dominates the
                            # ~25 ms tunnel round-trip floor
ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 40


def timeit(name, fn, xs, *args):
    """Time ``fn(x, *args)`` once per DISTINCT x (identical executions
    are memoized by the tunneled executor), syncing each iteration with
    a scalar fetch (block_until_ready alone can return without a round
    trip) — BENCH_NOTES "Measurement pitfalls"."""
    try:
        fn_j = jax.jit(lambda x_, *a: fn(x_, *a).astype(jnp.float32).sum())
        float(fn_j(xs[0], *args))  # compile + warm
        times = []
        for x_ in xs[1:]:
            t0 = time.time()
            float(fn_j(x_, *args))
            times.append(time.time() - t0)
        dt = min(times)
        print(f"{name:14s} {dt*1e3:8.2f} ms  ({L} layers, rows={ROWS})")
        return dt
    except Exception as e:
        print(f"{name:14s} FAILED: {type(e).__name__}: {e}")
        return None


def main():
    key = jax.random.PRNGKey(0)
    print("# init weights...", flush=True)
    # one fused program for all inputs (eager op-by-op init is
    # pathological through the tunnel)
    @jax.jit
    def build(key):
        w = (jax.random.normal(key, (L, F, D), jnp.bfloat16) * 0.02)
        xs = [jax.random.normal(jax.random.fold_in(key, i), (ROWS, 1, D),
                                jnp.bfloat16) for i in range(1, 5)]
        return (w, xs, quant.quantize_matrix(w), quant.quantize_matrix_int4(w),
                quant.quantize_matrix_int4_group(w))

    w, xs, q8, q4, q4g = jax.block_until_ready(build(key))
    print("# inputs ready", flush=True)

    def scan_over(f, x0, weights):
        # chain the activations through every layer and repeat so no two
        # matmuls share an input (CSE-proof); each step reads one [F, D]
        # weight slice exactly once.  y is consumed by a FULL-F reduce —
        # a narrow y[..., :D] slice would let XLA shrink the dot itself
        # (slice-through-dot narrowing).
        def body(acc, wl):
            y = f(acc, wl)                       # [ROWS, 1, F]
            bump = y.astype(jnp.float32).sum(-1, keepdims=True) * 1e-6
            return (acc + bump.astype(acc.dtype)), None
        acc = x0
        for _ in range(REPS):
            acc, _ = jax.lax.scan(body, acc, weights)
        return acc

    timeit("bf16", lambda x_, w_: scan_over(
        lambda h, wl: jnp.einsum("btd,fd->btf", h, wl), x_, w_), xs, w)
    timeit("int8", lambda x_, q_: scan_over(
        quant.quantized_matmul, x_, q_), xs, q8)
    timeit("int4 2-plane", lambda x_, q_: scan_over(
        quant.quantized_matmul_int4, x_, q_), xs, q4)
    # group-wise (g=128) int4: same packed bytes, scales ride INSIDE the
    # contraction — measures what the quality fix costs at decode shapes
    timeit("int4g g=128", lambda x_, q_: scan_over(
        quant.quantized_matmul_int4_group, x_, q_), xs, q4g)

    # Pallas single-stream kernel (ops/int4_matmul.py): packed bytes
    # DMA'd once per step, planes unpacked (+ group-scaled) in VMEM —
    # the true 0.5 byte/weight stream both XLA formulations miss
    from ospo_tpu.ops import int4_matmul as i4k

    timeit("int4 pallas", lambda x_, q_: scan_over(
        i4k.int4_matmul_decode, x_, q_), xs, q4)
    timeit("int4g pallas", lambda x_, q_: scan_over(
        i4k.int4_matmul_decode, x_, q_), xs, q4g)

    # int4 carried across the jit boundary as PACKED int8 bytes, bitcast
    # to s4 inside the program (sidesteps the int4-jit-argument
    # RecursionError while keeping the 0.5 byte/weight stream)
    try:
        @jax.jit
        def build_packed(w):
            qn = quant.quantize_matrix_int4_native(w)
            q = qn["q"]  # s4 [L, F, D]
            pk = jax.lax.bitcast_convert_type(
                q.reshape(*q.shape[:-1], q.shape[-1] // 2, 2), jnp.int8)
            return pk, qn["s"]

        pk, s_pk = jax.block_until_ready(build_packed(w))
        print(f"# packed bytes dtype={pk.dtype} shape={pk.shape}",
              flush=True)

        def bitcast_matmul(x_, wl_and_s):
            wl, sl = wl_and_s  # int8 [F, D/2], f32 [F]
            w4 = jax.lax.bitcast_convert_type(wl, jnp.int4)
            w4 = w4.reshape(*w4.shape[:-2], w4.shape[-2] * 2)
            y = jnp.einsum("btd,fd->btf", x_, w4.astype(x_.dtype))
            return y * sl.astype(x_.dtype)

        timeit("int4 bitcast", lambda x_, q_, s_: scan_over(
            bitcast_matmul, x_, (q_, s_)), xs, pk, s_pk)
    except Exception as e:
        print(f"int4 bitcast FAILED outside jit: {type(e).__name__}: {e}")

    # native s4 storage, one dot
    try:
        qn = jax.block_until_ready(
            jax.jit(quant.quantize_matrix_int4_native)(w))
        qs4, s = qn["q"], qn["s"]

        def s4_matmul(x_, wl_and_s):
            wl, sl = wl_and_s
            y = jnp.einsum("btd,fd->btf", x_, wl.astype(x_.dtype))
            return y * sl.astype(x_.dtype)

        timeit("int4 native s4", lambda x_, q_, s_: scan_over(
            s4_matmul, x_, (q_, s_)), xs, qs4, s)
    except Exception as e:
        print(f"int4 native s4 FAILED outside jit: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
