"""Can the decode-attention dots skip the int8->f32 VPU convert?

The round-2 trace pinned decode cost on the two attention einsums over
the int8 cache (QK^T 330 us + P.V 265 us per layer at S=704) — both
lowered by XLA as VPU convert+multiply+reduce fusions, not MXU dots.
This times the full 30-layer decode-attention chain at the 7B serving
shape under four arithmetic strategies:

- f32      : the shipped path (convert cache to f32 inside the einsum)
- bf16     : convert to bf16 instead (half the VPU convert/multiply width)
- int8qk   : quantize q per (b,h) row to int8 and do QK^T as an
             int8 x int8 einsum with int32 accumulation (MXU-eligible);
             P.V stays f32
- int8both : int8 QK^T AND int8 P.V (v-scale folded into the probs
             before quantizing them)

Also reports the max |out - out_f32| so quantization noise is visible
next to the timing.

Run on the real chip:  python scripts/int8_attention_bench.py [S] [B]
(S = cache window rows, default 704 = the last segmented window at the
serving point; B = CFG rows, default 40 = 20 pairs.)
"""

import sys
import time

import jax
import jax.numpy as jnp

L, H, DH = 30, 32, 128
S = int(sys.argv[1]) if len(sys.argv) > 1 else 704
B = int(sys.argv[2]) if len(sys.argv) > 2 else 40
SCALE = DH ** -0.5


def _gen_cache(key):
    # per-layer generation inside a scan: randint makes 4-byte random
    # bits for the whole requested shape, so a one-shot [L,S,H,B,dh]
    # int8 array would transiently cost 4x its size (OOM at 7 GB of
    # cache on a 16 GB chip)
    def body(k, _):
        k, sub = jax.random.split(k)
        return k, jax.random.randint(sub, (S, H, B, DH), -127, 128,
                                     jnp.int8)

    _, arr = jax.lax.scan(body, key, None, length=L)
    return arr


def make_inputs(key):
    ks = jax.random.split(key, 6)
    # shbd cache layout per layer, stacked [L, S, H, B, dh] int8
    k8 = jax.jit(_gen_cache)(ks[0])
    v8 = jax.jit(_gen_cache)(ks[1])
    k_scale = jax.random.uniform(ks[2], (L, B, H, S), jnp.float32, 0.01, 0.02)
    v_scale = jax.random.uniform(ks[3], (L, B, H, S), jnp.float32, 0.01, 0.02)
    q = jax.random.normal(ks[4], (L, B, 1, H, DH), jnp.bfloat16)
    return k8, v8, k_scale, v_scale, q


def layer_f32(q, k8, v8, k_scale, v_scale, dot_dtype=jnp.float32):
    qf = q.astype(dot_dtype)
    scores = jnp.einsum("bthd,shbd->bhts", qf, k8.astype(dot_dtype),
                        preferred_element_type=jnp.float32)
    scores = scores.astype(jnp.float32) * SCALE * k_scale[:, :, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    p = (probs * v_scale[:, :, None, :]).astype(dot_dtype)
    out = jnp.einsum("bhts,shbd->bthd", p, v8.astype(dot_dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(jnp.float32)


def _quant_rows(x):
    """per-(b, h) symmetric int8 over the trailing axes of [B,*,H,D]."""
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-20)
    return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8), s


def layer_int8(q, k8, v8, k_scale, v_scale, pv_int8):
    q8, qs = _quant_rows(q.astype(jnp.float32))        # [B,1,H,DH]
    scores = jnp.einsum("bthd,shbd->bhts", q8, k8,
                        preferred_element_type=jnp.int32)
    scores = (scores.astype(jnp.float32)
              * (qs.transpose(0, 2, 1, 3) * SCALE)     # [B,H,1,1]
              * k_scale[:, :, None, :])
    probs = jax.nn.softmax(scores, axis=-1)
    p = probs * v_scale[:, :, None, :]                 # [B,H,1,S]
    if pv_int8:
        p8, ps = _quant_rows(p)
        out = jnp.einsum("bhts,shbd->bthd", p8, v8,
                         preferred_element_type=jnp.int32)
        out = out.astype(jnp.float32) * ps.transpose(0, 3, 1, 2)
    else:
        out = jnp.einsum("bhts,shbd->bthd", p.astype(jnp.float32),
                         v8.astype(jnp.float32))
    return out.astype(jnp.float32)


def chain(layer_fn):
    def run(k8, v8, k_scale, v_scale, q, jitter):
        def body(carry, xs):
            k8l, v8l, ksl, vsl, ql = xs
            out = layer_fn(ql + jitter, k8l, v8l, ksl, vsl)
            return carry + out.sum(), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0),
                                (k8, v8, k_scale, v_scale, q))
        return total

    return run


def timeit(name, fn, args, reps=5):
    try:
        fn_j = jax.jit(fn)
        jax.block_until_ready(fn_j(*args, jnp.bfloat16(0)))
        times = []
        for i in range(reps):
            # vary an input per rep: the remote executor memoizes
            # byte-identical executions (BENCH_NOTES measurement pitfalls)
            jit_in = jnp.bfloat16(1e-8 * (i + 1))
            t0 = time.time()
            jax.block_until_ready(fn_j(*args, jit_in))
            times.append(time.time() - t0)
        dt = min(times)
        print(f"{name:10s} {dt * 1e3:8.2f} ms   ({L} layers, S={S}, B={B})")
        return dt
    except Exception as e:
        print(f"{name:10s} FAILED: {type(e).__name__}: {e}")
        return None


def main():
    print(f"# decode-attention arithmetic bench: S={S} B={B} H={H} dh={DH} "
          f"L={L}  platform={jax.default_backend()}")
    args = make_inputs(jax.random.PRNGKey(0))

    # numeric deltas on a sliced single layer (tiny: the timing arrays
    # already fill most of a 16 GB chip at the serving shape)
    k8, v8, k_scale, v_scale, q = args
    sS, sB = min(S, 64), min(B, 4)
    one = [q[0][:sB], k8[0][:sS, :, :sB], v8[0][:sS, :, :sB],
           k_scale[0][:sB, :, :sS], v_scale[0][:sB, :, :sS]]
    ref = layer_f32(*one)
    for name, fn in [
        ("bf16", lambda *a: layer_f32(*a, dot_dtype=jnp.bfloat16)),
        ("int8qk", lambda *a: layer_int8(*a, pv_int8=False)),
        ("int8both", lambda *a: layer_int8(*a, pv_int8=True)),
    ]:
        d = jnp.max(jnp.abs(jax.jit(fn)(*one) - ref))
        print(f"# max|out-{name}| vs f32: {float(d):.3e} "
              f"(out scale ~{float(jnp.max(jnp.abs(ref))):.3e})")

    timeit("f32", chain(lambda q, k, v, ks, vs:
                        layer_f32(q, k, v, ks, vs)), args)
    timeit("bf16", chain(lambda q, k, v, ks, vs:
                         layer_f32(q, k, v, ks, vs,
                                   dot_dtype=jnp.bfloat16)), args)
    timeit("int8qk", chain(lambda q, k, v, ks, vs:
                           layer_int8(q, k, v, ks, vs, False)), args)
    timeit("int8both", chain(lambda q, k, v, ks, vs:
                             layer_int8(q, k, v, ks, vs, True)), args)


if __name__ == "__main__":
    main()
