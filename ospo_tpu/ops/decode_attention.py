"""Pallas decode-attention kernel: single-token queries over the KV cache,
streaming ONLY the populated prefix from HBM.

The XLA decode path reads the whole padded cache window every step (the
unwritten tail included) — at large batch the cache stream exceeds the
weight stream. This kernel keeps the cache in HBM (`pl.ANY`), double-
buffers `blk`-row × all-head chunks into VMEM with async DMA, and stops at
the current length (scalar-prefetched), cutting cache traffic by the
unpopulated fraction (~45% averaged over a 576-token decode with a
64-token prompt).

Kernel geometry: grid is (batch,); each program handles every head of one
row — the DMA slices ``cache[li, b, s0:s0+blk, :, :]`` keep the trailing
(H, dh) dims whole, which is what Mosaic's tiled-HBM slicing requires
(slicing a single head out of the trailing tile pair is illegal). All math
is head-vectorised VPU work on ``[blk, H]`` / ``[blk, H, dh]`` tiles:
scores by broadcast-multiply + minor-dim reduce, online softmax by
sublane reductions — no MXU, no transposes (the op is bandwidth-bound).

Supports bf16 caches and the int8-quantized representation (payload +
per-(row, head) scales; int8 is what crosses HBM).  Takes the full stacked
cache ``[L, B, S, H, Dh]`` plus the layer index, so the scan-carried buffer
is passed pointer-wise (slicing it first would materialise a copy and
defeat the purpose).

Verified against ``xla_attention`` in ``tests/test_decode_attention.py``
(interpret mode on CPU; compiled on TPU by the bench path).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(scalars_ref,              # [2] int32: (layer_idx, cur_len)
            q_ref,                    # VMEM [1, 1, H, dh]
            k_hbm, v_hbm,             # ANY [L, B, S, H, dh]
            ks_hbm, vs_hbm,           # ANY [L, B, H, S] f32 (or dummy)
            mask_ref,                 # VMEM [1, S, 1] int32
            o_ref,                    # VMEM [1, 1, H, dh]
            kbuf, vbuf,               # VMEM scratch (2, blk, H, dh)
            ksbuf, vsbuf,             # VMEM scratch (2, H, blk)
            ksem, vsem, kssem, vssem,  # DMA semaphores (2,)
            *, blk: int, scale: float, quantized: bool):
    b = pl.program_id(0)
    li = scalars_ref[0]
    cur_len = scalars_ref[1]
    nb = pl.cdiv(cur_len, blk)
    H, dh = q_ref.shape[-2], q_ref.shape[-1]

    def row0(i):
        # alignment hint: slice starts must be provably blk-aligned
        return pl.multiple_of(i * blk, blk)

    def k_dma(slot, i):
        return pltpu.make_async_copy(
            k_hbm.at[li, b, pl.ds(row0(i), blk), :, :], kbuf.at[slot],
            ksem.at[slot])

    def v_dma(slot, i):
        return pltpu.make_async_copy(
            v_hbm.at[li, b, pl.ds(row0(i), blk), :, :], vbuf.at[slot],
            vsem.at[slot])

    def ks_dma(slot, i):
        return pltpu.make_async_copy(
            ks_hbm.at[li, b, :, pl.ds(row0(i), blk)], ksbuf.at[slot],
            kssem.at[slot])

    def vs_dma(slot, i):
        return pltpu.make_async_copy(
            vs_hbm.at[li, b, :, pl.ds(row0(i), blk)], vsbuf.at[slot],
            vssem.at[slot])

    def start(slot, i):
        k_dma(slot, i).start()
        v_dma(slot, i).start()
        if quantized:
            ks_dma(slot, i).start()
            vs_dma(slot, i).start()

    def wait(slot, i):
        k_dma(slot, i).wait()
        v_dma(slot, i).wait()
        if quantized:
            ks_dma(slot, i).wait()
            vs_dma(slot, i).wait()

    start(0, 0)

    q = q_ref[0, 0].astype(jnp.float32) * scale             # [H, dh]

    def body(i, carry):
        m_prev, l_prev, acc_prev = carry                     # [1,H],[1,H],[H,dh]
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nb)
        def _():
            start(jax.lax.rem(i + 1, 2), i + 1)

        wait(slot, i)
        k = kbuf[slot].astype(jnp.float32)                   # [blk, H, dh]
        # scores: broadcast-mul + minor-dim reduce (VPU; bandwidth-bound op)
        s = jnp.sum(k * q[None, :, :], axis=-1)              # [blk, H]
        if quantized:
            # scale buffer is [H, blk] (DMA-aligned layout) → f32 transpose
            s = s * jnp.transpose(ksbuf[slot], (1, 0))

        rows = i * blk + jax.lax.broadcasted_iota(jnp.int32, (blk, H), 0)
        valid = (rows < cur_len) & (
            mask_ref[0, pl.ds(row0(i), blk), :] > 0      # [blk, 1] → bcast
        )
        s = jnp.where(valid, s, _NEG_INF)

        m_blk = jnp.max(s, axis=0, keepdims=True)            # [1, H]
        m_new = jnp.maximum(m_prev, m_blk)
        p = jnp.exp(s - m_new)                               # [blk, H]
        alpha = jnp.exp(m_prev - m_new)                      # [1, H]
        l_new = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True)
        if quantized:
            p = p * jnp.transpose(vsbuf[slot], (1, 0))
        v = vbuf[slot].astype(jnp.float32)                   # [blk, H, dh]
        pv = jnp.sum(p[:, :, None] * v, axis=0)              # [H, dh]
        alpha_col = jnp.transpose(alpha, (1, 0))             # [H, 1] (f32)
        acc_new = acc_prev * alpha_col + pv
        return m_new, l_new, acc_new

    init = (jnp.full((1, H), _NEG_INF, jnp.float32),
            jnp.zeros((1, H), jnp.float32),
            jnp.zeros((H, dh), jnp.float32))
    m, l, acc = jax.lax.fori_loop(0, nb, body, init)
    l_col = jnp.transpose(l, (1, 0))                         # [H, 1]
    out = jnp.where(l_col > 0, acc / jnp.maximum(l_col, 1e-30), 0.0)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def decode_attention(
    q: jax.Array,                      # [B, 1, H, dh] — single new token
    k_cache: jax.Array,                # [L, B, S, H, dh] (bf16 or int8)
    v_cache: jax.Array,
    layer_idx,                         # int32 scalar
    cur_len,                           # int32 scalar — populated rows
    mask: jax.Array,                   # [B, S] key validity
    k_scale: Optional[jax.Array] = None,  # [L, B, H, S] f32 (int8 cache)
    v_scale: Optional[jax.Array] = None,
    blk: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """→ [B, 1, H, dh] attention output for the newest token."""
    B, _, H, dh = q.shape
    L, _, S, _, _ = k_cache.shape
    if S % blk != 0:
        if interpret:  # tiny test shapes: largest divisor ≤ blk
            blk = next(d for d in range(min(blk, S), 0, -1) if S % d == 0)
        else:
            raise ValueError(
                f"decode_attention: cache window S={S} must be a multiple of "
                f"blk={blk} on TPU (pad the cache; engines align to 128)")
    quantized = k_scale is not None

    q4 = q.reshape(B, 1, H, dh)
    mask3 = mask.astype(jnp.int32)[:, :, None]               # [B, S, 1]
    scalars = jnp.stack([jnp.asarray(layer_idx, jnp.int32),
                         jnp.asarray(cur_len, jnp.int32)])
    if not quantized:  # dummy 1-element scale operands (never DMA'd)
        k_scale = jnp.zeros((1, 1, 1, 1), jnp.float32)
        v_scale = jnp.zeros((1, 1, 1, 1), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, H, dh), lambda b, *_: (b, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, S, 1), lambda b, *_: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, H, dh), lambda b, *_: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, blk, H, dh), k_cache.dtype),
            pltpu.VMEM((2, blk, H, dh), v_cache.dtype),
            pltpu.VMEM((2, H, blk), jnp.float32),
            pltpu.VMEM((2, H, blk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out4 = pl.pallas_call(
        functools.partial(_kernel, blk=blk, scale=dh ** -0.5,
                          quantized=quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, H, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(scalars, q4, k_cache, v_cache, k_scale, v_scale, mask3)
    return out4                                              # [B, 1, H, dh]
