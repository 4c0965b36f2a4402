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

L, F, D = 8, 11008, 4096  # 8 stacked big-MLP layers is enough signal
ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 40


def timeit(name, fn, *args):
    try:
        fn_j = jax.jit(fn)
        out = jax.block_until_ready(fn_j(*args))
        times = []
        for _ in range(5):
            t0 = time.time()
            out = jax.block_until_ready(fn_j(*args))
            times.append(time.time() - t0)
        dt = min(times)
        gb = None
        print(f"{name:14s} {dt*1e3:8.2f} ms  ({L} layers, rows={ROWS})")
        return dt
    except Exception as e:
        print(f"{name:14s} FAILED: {type(e).__name__}: {e}")
        return None


def main():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (L, F, D), jnp.float32).astype(jnp.bfloat16) * 0.02
    x = jax.random.normal(jax.random.fold_in(key, 1), (ROWS, 1, D),
                          jnp.bfloat16)
    q8 = jax.jit(quant.quantize_matrix)(w)
    q4 = jax.jit(quant.quantize_matrix_int4)(w)

    def scan_over(f, weights):
        def body(acc, wl):
            return acc + f(x, wl), None
        init = jnp.zeros((ROWS, 1, F), jnp.bfloat16)
        return jax.lax.scan(body, init, weights)[0]

    timeit("bf16", lambda w_: scan_over(
        lambda x_, wl: jnp.einsum("btd,fd->btf", x_, wl), w_), w)
    timeit("int8", lambda q_: scan_over(quant.quantized_matmul, q_), q8)
    timeit("int4 2-plane", lambda q_: scan_over(
        quant.quantized_matmul_int4, q_), q4)

    # native s4 storage, one dot
    try:
        s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-1) / 7.0
        qs4 = jnp.clip(jnp.round(w / s[..., None].astype(w.dtype)), -7, 7
                       ).astype(jnp.int4)
        qs4 = jax.block_until_ready(qs4)

        def s4_matmul(x_, wl_and_s):
            wl, sl = wl_and_s
            y = jnp.einsum("btd,fd->btf", x_, wl.astype(x_.dtype))
            return y * sl.astype(x_.dtype)

        timeit("int4 native s4", lambda q_, s_: scan_over(
            lambda x_, ws: s4_matmul(x_, ws), (q_, s_)), qs4, s)
    except Exception as e:
        print(f"int4 native s4 FAILED outside jit: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
