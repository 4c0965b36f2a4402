"""Pallas TPU flash attention — forward + custom-VJP backward.

Online-softmax tiled attention for prefill/training sequences: the O(T·S)
score matrix never leaves VMEM, in either direction.  Replaces the
reference's ``F.scaled_dot_product_attention`` / HF eager attention on the
TPU compute path.

- Forward: one kernel per (batch, head, q-block), streaming key/value
  blocks with a fori_loop and fp32 accumulators; causal blocks above the
  diagonal are skipped at the loop bound.  Residuals (row max ``m`` and
  normaliser ``l``) are emitted for the backward pass.
- Backward: two kernels (dQ over q-blocks; dK/dV over k-blocks) that
  recompute the probabilities from the residuals — standard
  flash-attention-2 structure, fp32 throughout.

Interface matches :func:`ospo_tpu.ops.attention.xla_attention` for the
self-attention case (q_offset = 0) and is verified — values *and
gradients* — in ``tests/test_attention.py``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_DEFAULT_BLK = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, l_ref, m_ref,
                *, scale, blk_q, blk_k, causal, s_padded):
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32) * scale            # [blk_q, D]
    d = q.shape[-1]
    q_rows = qi * blk_q + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)

    if causal:
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
        )
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

    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0, 0] = (acc / l_safe).astype(o_ref.dtype)
    l_ref[0, 0] = l
    m_ref[0, 0] = m


def _fwd_call(q4, k4, v4, mask3, *, causal, blk_q, blk_k, interpret,
              t_pad, s_pad):
    """q4/k4/v4: [B, H, T|S, D] padded; mask3: [B, 1, S_pad] int32."""
    B, H, _, D = q4.shape
    grid = (B, H, t_pad // blk_q)
    kern = functools.partial(
        _fwd_kernel, scale=D ** -0.5, blk_q=blk_q, blk_k=blk_k,
        causal=causal, s_padded=s_pad,
    )
    out, l, m = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, blk_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, s_pad, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, s_pad), lambda b, h, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, blk_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, blk_q, 1), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, blk_q, 1), lambda b, h, i: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, t_pad, D), q4.dtype),
            jax.ShapeDtypeStruct((B, H, t_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, H, t_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q4, k4, v4, mask3)
    return out, l, m


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _dq_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, m_ref, l_ref, di_ref,
               dq_ref, *, scale, blk_q, blk_k, causal, s_padded):
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    m = m_ref[0, 0]                                        # [blk_q, 1]
    l = jnp.maximum(l_ref[0, 0], 1e-30)
    di = di_ref[0, 0]                                      # [blk_q, 1]
    d = q.shape[-1]
    q_rows = qi * blk_q + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)

    if causal:
        num_kb = jnp.minimum(
            pl.cdiv((qi + 1) * blk_q, blk_k), pl.cdiv(s_padded, blk_k)
        )
    else:
        num_kb = pl.cdiv(s_padded, blk_k)

    def body(kb, dq_acc):
        k = k_ref[0, 0, pl.ds(kb * blk_k, blk_k), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(kb * blk_k, blk_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        k_rows = kb * blk_k + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, blk_k), 1
        )
        valid = mask_ref[0, 0, pl.ds(kb * blk_k, blk_k)][None, :] > 0
        if causal:
            valid = valid & (k_rows <= q_rows)
        s = jnp.where(valid, s, _NEG_INF)
        p = jnp.exp(s - m) / l                              # normalised probs
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - di) * scale
        return dq_acc + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((blk_q, d), jnp.float32))
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, m_ref, l_ref, di_ref,
                dk_ref, dv_ref, *, scale, blk_q, blk_k, causal, t_padded):
    ki = pl.program_id(2)
    k = k_ref[0, 0].astype(jnp.float32)                    # [blk_k, D]
    v = v_ref[0, 0].astype(jnp.float32)
    kmask_row = mask_ref[0, 0][None, :] > 0                 # [1, blk_k]
    d = k.shape[-1]
    k_rows = ki * blk_k + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1)

    num_qb = pl.cdiv(t_padded, blk_q)
    if causal:
        # first q block intersecting the diagonal
        qb_start = (ki * blk_k) // blk_q
    else:
        qb_start = 0

    def body(qb, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, 0, pl.ds(qb * blk_q, blk_q), :].astype(jnp.float32)
        do = do_ref[0, 0, pl.ds(qb * blk_q, blk_q), :].astype(jnp.float32)
        m = m_ref[0, 0, pl.ds(qb * blk_q, blk_q), :]
        l = jnp.maximum(l_ref[0, 0, pl.ds(qb * blk_q, blk_q), :], 1e-30)
        di = di_ref[0, 0, pl.ds(qb * blk_q, blk_q), :]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        q_rows = qb * blk_q + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, blk_k), 0
        )
        valid = kmask_row
        if causal:
            valid = valid & (k_rows <= q_rows)
        s = jnp.where(valid, s, _NEG_INF)
        p = jnp.exp(s - m) / l                              # [blk_q, blk_k]

        dv_acc = dv_acc + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - di) * scale
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk_acc, dv_acc

    init = (jnp.zeros((blk_k, d), jnp.float32), jnp.zeros((blk_k, d), jnp.float32))
    dk, dv = jax.lax.fori_loop(qb_start, num_qb, body, init)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------


def _prepare(q, k, v, mask, blk_q, blk_k):
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
    qt = jnp.pad(jnp.transpose(q, (0, 2, 1, 3)),
                 ((0, 0), (0, 0), (0, t_pad - T), (0, 0)))
    kt = jnp.pad(jnp.transpose(k, (0, 2, 1, 3)),
                 ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
    vt = jnp.pad(jnp.transpose(v, (0, 2, 1, 3)),
                 ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
    if mask is None:
        mask = jnp.ones((B, S), jnp.int32)
    mask3 = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, s_pad - S)))[:, None, :]
    return qt, kt, vt, mask3, blk_q, blk_k, t_pad, s_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash(q, k, v, mask, causal, blk_q, blk_k, interpret):
    out, _, _ = _flash_fwd_impl(q, k, v, mask, causal, blk_q, blk_k, interpret)
    return out


def _flash_fwd_impl(q, k, v, mask, causal, blk_q, blk_k, interpret):
    B, T, H, D = q.shape
    qt, kt, vt, mask3, bq, bk, t_pad, s_pad = _prepare(q, k, v, mask, blk_q, blk_k)
    out4, l4, m4 = _fwd_call(qt, kt, vt, mask3, causal=causal, blk_q=bq,
                             blk_k=bk, interpret=interpret,
                             t_pad=t_pad, s_pad=s_pad)
    out = jnp.transpose(out4[:, :, :T, :], (0, 2, 1, 3))
    return out, l4, m4


def _flash_fwd(q, k, v, mask, causal, blk_q, blk_k, interpret):
    out, l4, m4 = _flash_fwd_impl(q, k, v, mask, causal, blk_q, blk_k, interpret)
    return out, (q, k, v, mask, out, l4, m4)


def _flash_bwd(causal, blk_q, blk_k, interpret, residuals, g):
    q, k, v, mask, out, l4, m4 = residuals
    B, T, H, D = q.shape
    S = k.shape[1]
    kvh = k.shape[2]
    qt, kt, vt, mask3, bq, bk, t_pad, s_pad = _prepare(q, k, v, mask, blk_q, blk_k)
    do4 = jnp.pad(jnp.transpose(g, (0, 2, 1, 3)),
                  ((0, 0), (0, 0), (0, t_pad - T), (0, 0)))
    o4 = jnp.pad(jnp.transpose(out, (0, 2, 1, 3)),
                 ((0, 0), (0, 0), (0, t_pad - T), (0, 0)))
    di4 = jnp.sum(o4.astype(jnp.float32) * do4.astype(jnp.float32),
                  axis=-1, keepdims=True)                   # [B, H, t_pad, 1]

    grid_q = (B, H, t_pad // bq)
    dq4 = pl.pallas_call(
        functools.partial(_dq_kernel, scale=D ** -0.5, blk_q=bq, blk_k=bk,
                          causal=causal, s_padded=s_pad),
        grid=grid_q,
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, s_pad, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, s_pad), lambda b, h, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, i: (b, h, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, h, i: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, t_pad, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qt, kt, vt, mask3, do4, m4, l4, di4)

    grid_k = (B, H, s_pad // bk)
    dk4, dv4 = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=D ** -0.5, blk_q=bq, blk_k=bk,
                          causal=causal, t_padded=t_pad),
        grid=grid_k,
        in_specs=[
            pl.BlockSpec((1, 1, t_pad, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bk), lambda b, h, i: (b, 0, i)),
            pl.BlockSpec((1, 1, t_pad, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, t_pad, 1), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, t_pad, 1), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, t_pad, 1), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bk, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, i: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, s_pad, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, s_pad, D), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qt, kt, vt, mask3, do4, m4, l4, di4)

    dq = jnp.transpose(dq4[:, :, :T, :], (0, 2, 1, 3))
    dk = jnp.transpose(dk4[:, :, :S, :], (0, 2, 1, 3))
    dv = jnp.transpose(dv4[:, :, :S, :], (0, 2, 1, 3))
    if kvh != q.shape[2]:  # GQA: sum gradients over the repeated head groups
        reps = q.shape[2] // kvh
        dk = dk.reshape(B, S, kvh, reps, D).sum(axis=3)
        dv = dv.reshape(B, S, kvh, reps, D).sum(axis=3)
    dmask = (None if mask is None
             else np.zeros(mask.shape, dtype=jax.dtypes.float0))
    return dq, dk, dv, dmask


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,                      # [B, T, H, D]
    k: jax.Array,                      # [B, S, KVH, D]
    v: jax.Array,
    mask: Optional[jax.Array] = None,  # [B, S] key validity
    causal: bool = True,
    blk_q: int = _DEFAULT_BLK,
    blk_k: int = _DEFAULT_BLK,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable flash attention (see module docstring)."""
    return _flash(q, k, v, mask, causal, blk_q, blk_k, interpret)
