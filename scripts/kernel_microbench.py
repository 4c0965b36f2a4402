"""Microbenchmark the Pallas decode-attention kernel at serving shapes.

Isolates the per-call fixed overhead (observed ~1.8 ms/layer in-engine)
from the per-block marginal cost by sweeping cur_len, and ablates the
mask / scales / output-transpose costs.

Usage: python scripts/kernel_microbench.py [--blk 64] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ospo_tpu.ops.decode_attention import decode_attention


def timeit(fn, iters):
    fn()  # compile
    jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blk", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--layers", type=int, default=4)
    args = ap.parse_args()

    # 7B serving point: B=48 CFG rows, H=32, dh=128, S=704
    L, S, H, B, dh = args.layers, 704, 32, 48, 128
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    q = jax.random.normal(ks[0], (B, 1, H, dh), jnp.bfloat16)
    kc = jax.random.randint(ks[1], (L, S, H, B, dh), -127, 127, jnp.int8)
    vc = jax.random.randint(ks[2], (L, S, H, B, dh), -127, 127, jnp.int8)
    ksc = jax.random.uniform(ks[3], (L, S, H, B), jnp.float32)
    vsc = jax.random.uniform(ks[4], (L, S, H, B), jnp.float32)
    mask = jnp.ones((B, S), jnp.int32)

    # buffers must be ARGUMENTS: a closure bakes the 500MB cache into the
    # program as constants and the tunneled compile request rejects it
    one = jax.jit(lambda q, kc, vc, ksc, vsc, li, cur: decode_attention(
        q, kc, vc, li, cur, mask, k_scale=ksc, v_scale=vsc,
        blk=args.blk))

    print(f"shapes: S={S} H={H} B={B} dh={dh} blk={args.blk}  "
          f"(one block = {2*args.blk*H*B*dh/1e6:.1f} MB K+V int8)")
    per_block = None
    prev = None
    for cur in (64, 128, 256, 384, 512, 640, 704):
        dt = timeit(lambda c=cur: one(q, kc, vc, ksc, vsc, 0, c), args.iters)
        nb = -(-cur // args.blk)
        marg = ""
        if prev is not None:
            dblocks = nb - prev[0]
            if dblocks:
                marg = f"  (+{(dt - prev[1]) / dblocks * 1e6:.0f} us/block)"
        prev = (nb, dt)
        print(f"cur_len={cur:4d} nb={nb:3d}: {dt*1e3:7.3f} ms{marg}")

    # layer sweep: does per-call overhead scale with calls?
    many = jax.jit(lambda q, kc, vc, ksc, vsc: sum(
        decode_attention(q, kc, vc, li, 704, mask, k_scale=ksc,
                         v_scale=vsc, blk=args.blk).astype(jnp.float32)
        for li in range(L)))
    dt = timeit(lambda: many(q, kc, vc, ksc, vsc), max(2, args.iters // 4))
    print(f"{L} back-to-back calls (cur=704): {dt*1e3:.3f} ms "
          f"({dt/L*1e3:.3f} ms/call)")

    # ideal DMA time for the populated prefix at 819 GB/s
    bytes_pp = 2 * 704 * H * B * dh + 2 * 4 * 704 * H * B
    print(f"prefix bytes/layer at cur=704: {bytes_pp/1e6:.0f} MB -> "
          f"{bytes_pp/819e9*1e3:.3f} ms at 819 GB/s")


if __name__ == "__main__":
    main()
