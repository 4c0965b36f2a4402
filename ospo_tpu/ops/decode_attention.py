"""Pallas decode-attention kernel: single-token queries over the KV cache,
streaming ONLY the populated prefix from HBM in layout-contiguous blocks.

Why this exists (measured on a v5e, 7B CFG decode, B=24 CFG pairs, int8 KV):

- XLA's fused decode attention reads the WHOLE padded cache window every
  step — the unwritten tail included (~45% of the window averaged over a
  576-token decode with a 64-token prompt).
- The attention einsums lower to VPU loop fusions whose output layout puts
  the 2B=48 batch rows in the 128-wide lane dimension (37% lane
  utilisation).
- The per-layer ``dynamic_index_in_dim`` of the scan-carried cache cannot
  alias the in-loop ``dynamic_update_slice`` writes, so XLA materialises a
  sliced copy of K and V every layer (~4.8 ms/step of pure copies).

This kernel fixes all three at once.  It consumes the batch-minor
``shbd`` cache (``[L, S, H, B, Dh]`` — ``llama.init_kv_cache``) directly
from HBM (`pl.ANY`): the whole stacked cache is passed pointer-wise, so
there is no per-layer slice copy.  Because S is the MAJOR axis, a
position-block ``cache[li, s0:s0+blk]`` is one fully contiguous
``blk·H·B·Dh`` byte range — a single perfectly-coalesced DMA.  The kernel
double-buffers those blocks into VMEM and stops at the populated length
(scalar-prefetched ``cur_len``).

Inside the kernel the (head, row) axes are flattened to one HB axis (a
free reshape of the contiguous cache view): per-position scores live in
``[blk, HB]`` with HB = H·B on the 128-wide lane axis (H·B = 1536 at the
7B serving point — full lane utilisation, vs 48/128 lanes when XLA puts
the batch on the lanes), and the per-(position, head, row) int8 scales
stay 128-aligned for DMA.

Supports bf16 caches and the int8-quantized representation (payload +
per-(position, head) fp32 scales, stored ``[L, S, H, B]`` — the same
S-major layout, so scale blocks are contiguous DMAs too).

Semantics match ``ops.attention.xla_attention`` for T=1 decode (fp32
online softmax, key-validity mask, rows ``>= cur_len`` excluded); verified
against it in ``tests/test_decode_attention.py`` (interpret mode on CPU;
compiled + benchmarked on real TPU by the bench path).

Replaces the reference's per-token eager attention
(ospo/wrapper/image_generation.py:149-171) rather than translating it.
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
            q_ref,                    # VMEM [HB, dh] bf16/f32
            k_hbm, v_hbm,             # ANY [L, S, HB, dh]
            ks_hbm, vs_hbm,           # ANY [L, S, HB] f32 (or dummy)
            mask_ref,                 # VMEM [S, HB] int8 key validity
            o_ref,                    # VMEM [HB, dh]
            kbuf, vbuf,               # VMEM scratch (2, blk, HB, dh)
            ksbuf, vsbuf,             # VMEM scratch (2, blk, HB)
            ksem, vsem, kssem, vssem,  # DMA semaphores (2,)
            *, blk: int, hb_chunk: int, scale: float, quantized: bool):
    li = scalars_ref[0]
    cur_len = scalars_ref[1]
    nb = pl.cdiv(cur_len, blk)
    HB, dh = q_ref.shape

    def row0(i):
        return pl.multiple_of(i * blk, blk)

    def k_dma(slot, i):
        return pltpu.make_async_copy(
            k_hbm.at[li, pl.ds(row0(i), blk)], kbuf.at[slot], ksem.at[slot])

    def v_dma(slot, i):
        return pltpu.make_async_copy(
            v_hbm.at[li, pl.ds(row0(i), blk)], vbuf.at[slot], vsem.at[slot])

    def ks_dma(slot, i):
        return pltpu.make_async_copy(
            ks_hbm.at[li, pl.ds(row0(i), blk)], ksbuf.at[slot],
            kssem.at[slot])

    def vs_dma(slot, i):
        return pltpu.make_async_copy(
            vs_hbm.at[li, pl.ds(row0(i), blk)], vsbuf.at[slot],
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

    # cur_len == 0 → nb == 0: the fori_loop never runs, so an
    # unconditional start here would leave in-flight DMAs whose
    # semaphores are never waited (undefined at kernel exit)
    @pl.when(nb > 0)
    def _():
        start(0, 0)

    q = q_ref[...].astype(jnp.float32) * scale                 # [HB, dh]

    def body(i, carry):
        m_prev, l_prev, acc_prev = carry     # [1,HB], [1,HB], [HB,dh] f32
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nb)
        def _():
            start(jax.lax.rem(i + 1, 2), i + 1)

        wait(slot, i)
        rows = i * blk + jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
        mask_blk = mask_ref[pl.ds(row0(i), blk)]               # [blk, HB]
        valid = (rows < cur_len) & (mask_blk > 0)

        k_all = kbuf[pl.ds(slot, 1)][0]                        # [blk,HB,dh]
        v_all = vbuf[pl.ds(slot, 1)][0]

        # scores, chunked over HB to bound the VMEM footprint of the
        # [blk, hbc, dh] fp32 intermediates
        s_parts = []
        for c0 in range(0, HB, hb_chunk):
            k_c = k_all[:, c0:c0 + hb_chunk].astype(jnp.float32)
            q_c = jnp.expand_dims(q[c0:c0 + hb_chunk], 0)
            s_parts.append(jnp.sum(k_c * q_c, axis=-1))
        s = jnp.concatenate(s_parts, axis=1)                   # [blk, HB]
        if quantized:
            s = s * ksbuf[pl.ds(slot, 1)][0]
        s = jnp.where(valid, s, _NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
        p = jnp.exp(s - m_new)                                 # [blk, HB]
        alpha = jnp.exp(m_prev - m_new)                        # [1, HB]
        l_new = l_prev * alpha + jnp.sum(p, axis=0, keepdims=True)
        if quantized:
            p = p * vsbuf[pl.ds(slot, 1)][0]
        pv_parts = []
        for c0 in range(0, HB, hb_chunk):
            v_c = v_all[:, c0:c0 + hb_chunk].astype(jnp.float32)
            p_c = jnp.expand_dims(p[:, c0:c0 + hb_chunk], -1)
            pv_parts.append(jnp.sum(v_c * p_c, axis=0))
        pv = jnp.concatenate(pv_parts, axis=0)                 # [HB, dh]
        acc_new = acc_prev * jnp.transpose(alpha) + pv
        return (m_new, l_new, acc_new)

    init = (jnp.full((1, HB), _NEG_INF, jnp.float32),
            jnp.zeros((1, HB), jnp.float32),
            jnp.zeros((HB, dh), jnp.float32))
    m, l, acc = jax.lax.fori_loop(0, nb, body, init)
    l_col = jnp.transpose(l)                                   # [HB, 1]
    out = jnp.where(l_col > 0, acc / jnp.maximum(l_col, 1e-30), 0.0)
    o_ref[...] = out.astype(o_ref.dtype)


def decode_attention(
    q: jax.Array,                      # [B, 1, H, dh] — single new token
    k_cache: jax.Array,                # [L, S, H, B, dh] (bf16 or int8)
    v_cache: jax.Array,
    layer_idx,                         # int32 scalar
    cur_len,                           # int32 scalar — populated rows
    mask: jax.Array,                   # [B, S] key validity
    k_scale: Optional[jax.Array] = None,  # [L, S, H, B] f32 (int8 cache)
    v_scale: Optional[jax.Array] = None,
    blk: int = 64,
    hb_chunk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """→ [B, 1, H, dh] attention output for the newest token."""
    B, T, H, dh = q.shape
    assert T == 1, "decode_attention handles single-token queries"
    L, S = k_cache.shape[0], k_cache.shape[1]
    assert k_cache.shape == (L, S, H, B, dh), (
        f"decode_attention wants an shbd cache [L,S,H,B,dh], got "
        f"{k_cache.shape} vs q {q.shape}")
    if S % blk != 0:
        if interpret:  # tiny test shapes: largest divisor ≤ blk
            blk = next(d for d in range(min(blk, S), 0, -1) if S % d == 0)
        else:
            raise ValueError(
                f"decode_attention: cache window S={S} must be a multiple "
                f"of blk={blk} on TPU (engines align s_max to 128)")
    if H * B % 128 != 0 and not interpret:
        raise ValueError(
            f"decode_attention: H*B={H * B} must be a multiple of 128 on "
            f"TPU (the flattened head-row axis rides the 128-wide lanes)")
    HB = H * B
    hbc = min(hb_chunk, HB)
    while HB % hbc != 0:
        hbc //= 2
    quantized = k_scale is not None

    # double-buffered K/V scratch must fit the scoped-VMEM budget: with a
    # bf16 cache at the 7B serving point (HB=1536, blk=64) it is ~101 MB,
    # so halve blk until the scratch (plus fp32 scale buffers) fits, and
    # derive vmem_limit_bytes from the actual footprint instead of a fixed
    # constant (ADVICE r2: fixed 100 MB failed to compile bf16 caches)
    def _scratch_bytes(b):
        kv = 2 * 2 * b * HB * dh * k_cache.dtype.itemsize      # K+V, 2 slots
        scales = (2 * 2 * b * HB * 4) if quantized else 0
        return kv + scales

    while blk > 8 and _scratch_bytes(blk) > 96 * 1024 * 1024:
        blk //= 2
    if S % blk != 0 and not interpret:
        raise ValueError(
            f"decode_attention: cache window S={S} not a multiple of the "
            f"dtype-scaled block {blk}")
    vmem_limit = _scratch_bytes(blk) + 32 * 1024 * 1024

    # contiguous views: flatten (H, B) → HB (free reshapes — no copies),
    # queries to cache row order, mask tiled across heads (loop-invariant
    # in the decode scan, so XLA hoists it out of the token loop); int8
    # keeps the per-call VMEM copy at S·HB bytes instead of 4× that
    k3 = k_cache.reshape(L, S, HB, dh)
    v3 = v_cache.reshape(L, S, HB, dh)
    q_hb = jnp.transpose(q[:, 0], (1, 0, 2)).reshape(HB, dh)
    mask_hb = jnp.broadcast_to(
        jnp.transpose(mask.astype(jnp.int8))[:, None, :], (S, H, B)
    ).reshape(S, HB)
    scalars = jnp.stack([jnp.asarray(layer_idx, jnp.int32),
                         jnp.asarray(cur_len, jnp.int32)])
    if quantized:
        k_scale = k_scale.reshape(L, S, HB)
        v_scale = v_scale.reshape(L, S, HB)
    else:  # dummy 1-element scale operands (never DMA'd)
        k_scale = jnp.zeros((1, 1, 1), jnp.float32)
        v_scale = jnp.zeros((1, 1, 1), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((HB, dh), lambda *_: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((S, HB), lambda *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((HB, dh), lambda *_: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, blk, HB, dh), k_cache.dtype),
            pltpu.VMEM((2, blk, HB, dh), v_cache.dtype),
            pltpu.VMEM((2, blk, HB), jnp.float32),
            pltpu.VMEM((2, blk, HB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_hb = pl.pallas_call(
        functools.partial(_kernel, blk=blk, hb_chunk=hbc, scale=dh ** -0.5,
                          quantized=quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((HB, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # double-buffered K/V blocks are tens of MB of scratch at the
            # 7B serving point — far past the 16MB default scoped-vmem
            # limit; sized from the actual scratch footprint above
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(scalars, q_hb, k3, v3, k_scale, v_scale, mask_hb)
    return jnp.transpose(
        out_hb.reshape(H, B, dh), (1, 0, 2))[:, None]          # [B, 1, H, dh]
