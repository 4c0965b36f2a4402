"""Pallas TPU flash attention (causal, key-padding aware).

Online-softmax tiled attention for prefill/training sequences — the O(T·S)
score matrix never leaves VMEM.  Replaces the reference's
``F.scaled_dot_product_attention`` / HF eager attention on the TPU compute
path.

Layout: the wrapper folds (batch, head) into the first two grid axes and
tiles the query axis; each program streams key/value blocks for one query
block with a fori_loop, accumulating in fp32.

Interface matches :func:`ospo_tpu.ops.attention.xla_attention` for the
self-attention case (q_offset = 0, T == S) and is verified against it in
``tests/test_attention.py`` (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref,
    *, scale: float, blk_q: int, blk_k: int, causal: bool, s_padded: int,
):
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32) * scale            # [blk_q, D]
    d = q.shape[-1]

    q_rows = qi * blk_q + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)

    if causal:
        # only key blocks that intersect the causal triangle
        num_kb = jnp.minimum(
            pl.cdiv((qi + 1) * blk_q, blk_k), pl.cdiv(s_padded, blk_k)
        )
    else:
        num_kb = pl.cdiv(s_padded, blk_k)

    def body(kb, carry):
        m_prev, l_prev, acc_prev = carry
        k = k_ref[0, 0, pl.ds(kb * blk_k, blk_k), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(kb * blk_k, blk_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                                   # [blk_q, blk_k]

        k_rows = kb * blk_k + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, blk_k), 1
        )
        valid = mask_ref[0, 0, pl.ds(kb * blk_k, blk_k)][None, :] > 0
        if causal:
            valid = valid & (k_rows <= q_rows)
        s = jnp.where(valid, s, _NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc_prev * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    init = (
        jnp.full((blk_q, 1), _NEG_INF, jnp.float32),
        jnp.zeros((blk_q, 1), jnp.float32),
        jnp.zeros((blk_q, d), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(0, num_kb, body, init)

    # fully-masked query rows (left padding) would divide by zero
    out = jnp.where(l > 0, acc / jnp.maximum(l, 1e-30), 0.0)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("causal", "blk_q", "blk_k", "interpret")
)
def flash_attention(
    q: jax.Array,                     # [B, T, H, D]
    k: jax.Array,                     # [B, S, KVH, D]
    v: jax.Array,
    mask: Optional[jax.Array] = None,  # [B, S] key validity
    causal: bool = True,
    blk_q: int = 256,
    blk_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    B, T, H, D = q.shape
    S = k.shape[1]
    kvh = k.shape[2]
    if kvh != H:
        k = jnp.repeat(k, H // kvh, axis=2)
        v = jnp.repeat(v, H // kvh, axis=2)

    blk_q = min(blk_q, _round_up(T, 128))
    blk_k = min(blk_k, _round_up(S, 128))
    t_pad = _round_up(T, blk_q)
    s_pad = _round_up(S, blk_k)

    # [B, H, T, D] layout for row-major streaming
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    qt = jnp.pad(qt, ((0, 0), (0, 0), (0, t_pad - T), (0, 0)))
    kt = jnp.pad(kt, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
    vt = jnp.pad(vt, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))

    if mask is None:
        mask = jnp.ones((B, S), jnp.int32)
    # [B, 1, S_pad]: TPU block shapes must tile the last two dims exactly
    mask = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, s_pad - S)))[:, None, :]

    grid = (B, H, t_pad // blk_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel,
            scale=D ** -0.5,
            blk_q=blk_q,
            blk_k=blk_k,
            causal=causal,
            s_padded=s_pad,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, blk_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, s_pad, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, s_pad), lambda b, h, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, blk_q, D), lambda b, h, i: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, t_pad, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * S * D,
            bytes_accessed=(qt.size + kt.size + vt.size) * qt.dtype.itemsize,
            transcendentals=B * H * T * S,
        ),
        interpret=interpret,
    )(qt, kt, vt, mask)

    return jnp.transpose(out[:, :, :T, :], (0, 2, 1, 3))
