"""Pallas decode-attention kernel: single-token queries over the KV cache,
streaming ONLY the populated prefix from HBM.

The XLA decode path reads the whole padded cache window every step (the
unwritten tail included) — at large batch the cache stream exceeds the
weight stream. This kernel keeps the head-major cache (``[L, B, H, S, Dh]``,
see ``llama.init_kv_cache``) in HBM (`pl.ANY`), double-buffers
(head-block × position-block) chunks into VMEM with async DMA, and stops
at the current length (scalar-prefetched), cutting cache traffic by the
unpopulated fraction (~45% averaged over a 576-token decode with a
64-token prompt).

Kernel geometry: grid (batch, H/HB); each program owns HB=8 heads of one
row.  DMA slices ``cache[li, b, h0:h0+HB, s0:s0+blk, :]`` are tile-legal
(position × head-dim trailing pair stays whole/128-aligned; the head axis
is sliced at 8-aligned offsets outside the tile pair).  Scores and the
P·V accumulation run per-head on the MXU ([1,dh]×[dh,blk] / [1,blk]×
[blk,dh]) over a static 8-head unroll; online-softmax statistics are fp32.

Supports bf16 caches and the int8-quantized representation (payload +
per-(head, position) scales; int8 is what crosses HBM).  Takes the full
stacked cache plus the layer index, so the scan-carried buffer is passed
pointer-wise (slicing it first would materialise a copy and defeat the
purpose).

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
            q_ref,                    # VMEM [1, 1, HB, dh]
            k_hbm, v_hbm,             # ANY [L, B, H, S, dh]
            ks_hbm, vs_hbm,           # ANY [L, B, H, S] f32 (or dummy)
            mask_ref,                 # VMEM [1, S, 1] int32
            o_ref,                    # VMEM [1, 1, HB, dh]
            kbuf, vbuf,               # VMEM scratch (2, HB, blk, dh)
            ksbuf, vsbuf,             # VMEM scratch (2, HB, blk)
            ksem, vsem, kssem, vssem,  # DMA semaphores (2,)
            *, blk: int, hb: int, scale: float, quantized: bool):
    b = pl.program_id(0)
    hblk = pl.program_id(1)
    li = scalars_ref[0]
    cur_len = scalars_ref[1]
    nb = pl.cdiv(cur_len, blk)
    dh = q_ref.shape[-1]
    h0 = pl.multiple_of(hblk * hb, hb)

    def row0(i):
        return pl.multiple_of(i * blk, blk)

    def k_dma(slot, i):
        return pltpu.make_async_copy(
            k_hbm.at[li, b, pl.ds(h0, hb), pl.ds(row0(i), blk), :],
            kbuf.at[slot], ksem.at[slot])

    def v_dma(slot, i):
        return pltpu.make_async_copy(
            v_hbm.at[li, b, pl.ds(h0, hb), pl.ds(row0(i), blk), :],
            vbuf.at[slot], vsem.at[slot])

    def ks_dma(slot, i):
        return pltpu.make_async_copy(
            ks_hbm.at[li, b, pl.ds(h0, hb), pl.ds(row0(i), blk)],
            ksbuf.at[slot], kssem.at[slot])

    def vs_dma(slot, i):
        return pltpu.make_async_copy(
            vs_hbm.at[li, b, pl.ds(h0, hb), pl.ds(row0(i), blk)],
            vsbuf.at[slot], vssem.at[slot])

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

    q = q_ref[0, 0].astype(jnp.float32) * scale              # [HB, dh]

    def body(i, carry):
        m_prev, l_prev, acc_prev = carry                     # [HB,1],[HB,1],[HB,dh]
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nb)
        def _():
            start(jax.lax.rem(i + 1, 2), i + 1)

        wait(slot, i)
        rows = i * blk + jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
        key_valid = (rows < cur_len) & (
            mask_ref[0, pl.ds(row0(i), blk), 0][None, :] > 0
        )                                                     # [1, blk]

        m_list, l_list, acc_list = [], [], []
        for hh in range(hb):                                  # static unroll
            k_h = kbuf[slot, hh].astype(jnp.float32)          # [blk, dh]
            s = jax.lax.dot_general(
                q[hh:hh + 1], k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)           # [1, blk]
            if quantized:
                s = s * ksbuf[slot, hh][None, :]
            s = jnp.where(key_valid, s, _NEG_INF)

            m_new = jnp.maximum(m_prev[hh:hh + 1],
                                jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)                            # [1, blk]
            alpha = jnp.exp(m_prev[hh:hh + 1] - m_new)
            l_new = l_prev[hh:hh + 1] * alpha + jnp.sum(
                p, axis=-1, keepdims=True)
            if quantized:
                p = p * vsbuf[slot, hh][None, :]
            v_h = vbuf[slot, hh].astype(jnp.float32)          # [blk, dh]
            pv = jax.lax.dot_general(
                p, v_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [1, dh]
            acc_new = acc_prev[hh:hh + 1] * alpha + pv
            m_list.append(m_new)
            l_list.append(l_new)
            acc_list.append(acc_new)
        return (jnp.concatenate(m_list, 0), jnp.concatenate(l_list, 0),
                jnp.concatenate(acc_list, 0))

    init = (jnp.full((hb, 1), _NEG_INF, jnp.float32),
            jnp.zeros((hb, 1), jnp.float32),
            jnp.zeros((hb, dh), jnp.float32))
    m, l, acc = jax.lax.fori_loop(0, nb, body, init)
    out = jnp.where(l > 0, acc / jnp.maximum(l, 1e-30), 0.0)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def decode_attention(
    q: jax.Array,                      # [B, 1, H, dh] — single new token
    k_cache: jax.Array,                # [L, B, H, S, dh] (bf16 or int8)
    v_cache: jax.Array,
    layer_idx,                         # int32 scalar
    cur_len,                           # int32 scalar — populated rows
    mask: jax.Array,                   # [B, S] key validity
    k_scale: Optional[jax.Array] = None,  # [L, B, H, S] f32 (int8 cache)
    v_scale: Optional[jax.Array] = None,
    blk: int = 128,
    head_block: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """→ [B, 1, H, dh] attention output for the newest token."""
    B, _, H, dh = q.shape
    L, _, _, S, _ = k_cache.shape
    if S % blk != 0:
        if interpret:  # tiny test shapes: largest divisor ≤ blk
            blk = next(d for d in range(min(blk, S), 0, -1) if S % d == 0)
        else:
            raise ValueError(
                f"decode_attention: cache window S={S} must be a multiple of "
                f"blk={blk} on TPU (pad the cache; engines align to 128)")
    hb = head_block
    while H % hb != 0:
        hb //= 2
    quantized = k_scale is not None

    # [B, H/hb, hb, dh] so each grid cell reads a contiguous head block
    q4 = q.reshape(B, H // hb, hb, dh)
    mask3 = mask.astype(jnp.int32)[:, :, None]               # [B, S, 1]
    scalars = jnp.stack([jnp.asarray(layer_idx, jnp.int32),
                         jnp.asarray(cur_len, jnp.int32)])
    if not quantized:  # dummy 1-element scale operands (never DMA'd)
        k_scale = jnp.zeros((1, 1, 1, 1), jnp.float32)
        v_scale = jnp.zeros((1, 1, 1, 1), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H // hb),
        in_specs=[
            pl.BlockSpec((1, 1, hb, dh), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, S, 1), lambda b, h, *_: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, hb, dh), lambda b, h, *_: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, hb, blk, dh), k_cache.dtype),
            pltpu.VMEM((2, hb, blk, dh), v_cache.dtype),
            pltpu.VMEM((2, hb, blk), jnp.float32),
            pltpu.VMEM((2, hb, blk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out4 = pl.pallas_call(
        functools.partial(_kernel, blk=blk, hb=hb, scale=dh ** -0.5,
                          quantized=quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H // hb, hb, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(scalars, q4, k_cache, v_cache, k_scale, v_scale, mask3)
    return out4.reshape(B, 1, H, dh)