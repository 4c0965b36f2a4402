"""Attention ops: padded-causal attention over a (possibly cached) KV window.

Two implementations behind one dispatcher:

- :func:`xla_attention` — fused-by-XLA einsum attention, fp32 softmax.
  Used for decode steps (T=1, bandwidth-bound — XLA already emits an
  efficient fused kernel) and on CPU (tests).
- :func:`ospo_tpu.ops.flash_attention.flash_attention` — a Pallas TPU
  flash-attention kernel for prefill/training (T large), tiled for the MXU
  with an online-softmax accumulator.

Semantics (shared):
  q: [B, T, H, Dh] — new queries, absolute cache rows [q_offset, q_offset+T)
  k, v: [B, S, KVH, Dh] — full key/value window (cache or self)
  mask: [B, S] validity of each key row (left-padding / unwritten rows = 0)
  causal: row-causality — query row i may attend key row j iff
          j <= q_offset + i.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def unpack_int4(p: jax.Array):
    """head-pair-packed int8 → (low, high) int8 nibble halves — inverse of
    ``llama._quantize_rows_int4`` (byte at head-slot j holds head j in the
    low nibble and head j + H/2 in the high, two's complement; arithmetic
    shifts sign-extend).  Concatenating the halves along the head axis
    restores head order."""
    low = jnp.right_shift(jnp.left_shift(p, 4), 4)
    high = jnp.right_shift(p, 4)
    return low, high


def _repeat_kv(k: jax.Array, num_heads: int) -> jax.Array:
    """Broadcast KV heads to query heads for GQA ([B,S,KVH,D] → [B,S,H,D])."""
    kvh = k.shape[2]
    if kvh == num_heads:
        return k
    reps = num_heads // kvh
    return jnp.repeat(k, reps, axis=2)


def xla_attention(
    q: jax.Array,
    k,
    v,
    mask: Optional[jax.Array],
    q_offset,
    causal: bool = True,
    kv_layout: str = "bshd",
    prefix_k: Optional[jax.Array] = None,
    prefix_v: Optional[jax.Array] = None,
    prefix_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """k / v may be plain arrays, int8-quantized dicts
    ``{"q": int8, "s": f32 [B,KVH,S]}`` or int4 head-pair-packed dicts
    ``{"q4": int8 with head axis H/2, "s": f32 full-H scales}``
    (quantized KV cache,
    ``llama._quantize_rows`` / ``_quantize_rows_int4``) — the scales fold
    into the score/probability matrices and the nibble unpack folds into
    the einsum reads, so the quantized payload is converted in-read with
    no dequantised copy.  ``kv_layout`` selects the axis order of k & v:
    ``bshd`` (fresh self-attention chunks / the position-major cache),
    ``bhsd`` (head-major cache) or ``shbd`` (batch-minor cache) — einsum
    consumes any of them without a transposed copy.

    ``prefix_k`` / ``prefix_v`` ([C, KVH, Dh], bf16) add a BATCH-SHARED
    key/value segment stored once instead of per-row — the mechanism
    behind the text engine's shared-prefix decode (every batch row of a
    few-shot prompt shares the template prefix, so its KV is kept at 1/B
    the HBM and streamed once per step instead of B times).  Contract:
    every prefix position precedes every query (no causal check inside
    the segment); ``prefix_mask`` ([C] or [1, C] or [B, C]) marks valid
    (non-pad) prefix rows.  The joint softmax runs over
    ``[prefix ++ own]`` scores, so results are exact (same math as
    materialising the prefix per row, up to reduction order)."""
    B, T, H, Dh = q.shape
    int4 = isinstance(k, dict) and "q4" in k
    if isinstance(k, dict):
        k_vals, k_scale = k["q4"] if int4 else k["q"], k["s"]
        v_vals, v_scale = v["q4"] if int4 else v["q"], v["s"]
    else:
        k_vals, k_scale = k, None
        v_vals, v_scale = v, None
    head_axis = {"bshd": 2, "bhsd": 1, "shbd": 1}[kv_layout]
    S = k_vals.shape[{"bshd": 1, "bhsd": 2, "shbd": 0}[kv_layout]]
    if int4:
        assert k_vals.shape[head_axis] == H // 2, (
            "int4 KV is MHA-only (head-pair packed: cache head axis H/2)")
    elif k_vals.shape[head_axis] != H:  # GQA head groups
        reps = H // k_vals.shape[head_axis]
        k_vals = jnp.repeat(k_vals, reps, axis=head_axis)
        v_vals = jnp.repeat(v_vals, reps, axis=head_axis)
    if k_scale is not None and k_scale.shape[1] != H:
        k_scale = jnp.repeat(k_scale, H // k_scale.shape[1], axis=1)
    if v_scale is not None and v_scale.shape[1] != H:
        v_scale = jnp.repeat(v_scale, H // v_scale.shape[1], axis=1)
    scale = Dh ** -0.5

    kv_sub = kv_layout
    if int4:
        # head-pair packed: low nibbles are heads [0, H/2), high nibbles
        # heads [H/2, H) — score each half against the matching
        # (contiguous) query half and rejoin along the head axis; the
        # unpack shifts fuse into the score fusion's cache read
        k_low, k_high = unpack_int4(k_vals)
        qf = q.astype(jnp.float32)
        scores = jnp.concatenate([
            jnp.einsum(f"bthd,{kv_sub}->bhts", qf[:, :, : H // 2],
                       k_low.astype(jnp.float32)),
            jnp.einsum(f"bthd,{kv_sub}->bhts", qf[:, :, H // 2:],
                       k_high.astype(jnp.float32)),
        ], axis=1) * scale
    else:
        scores = jnp.einsum(
            f"bthd,{kv_sub}->bhts", q.astype(jnp.float32),
            k_vals.astype(jnp.float32)
        ) * scale
    if k_scale is not None:
        scores = scores * k_scale[:, :, None, :]              # [B,H,1,S]

    allowed = jnp.ones((B, 1, T, S), dtype=bool)
    if mask is not None:
        allowed = allowed & mask[:, None, None, :].astype(bool)
    if causal:
        off = jnp.asarray(q_offset)
        if off.ndim == 0:                                # shared offset
            q_rows = off + jnp.arange(T)[None, :, None]  # [1, T, 1]
        else:                                            # per-row offsets [B]
            q_rows = off[:, None, None] + jnp.arange(T)[None, :, None]
        k_rows = jnp.arange(S)[None, None, :]            # [1, 1, S]
        allowed = allowed & (k_rows <= q_rows)[:, None, :, :]

    scores = jnp.where(allowed, scores, _NEG_INF)

    C = 0
    if prefix_k is not None:
        # batch-shared segment [C, KVH, Dh]: the einsum broadcasts it
        # across the batch — no [B, C] materialisation, and the HBM read
        # of the segment happens once per step, not once per row
        C = prefix_k.shape[0]
        pk, pv = prefix_k, prefix_v
        if pk.shape[1] != H:  # GQA head groups
            reps = H // pk.shape[1]
            pk = jnp.repeat(pk, reps, axis=1)
            pv = jnp.repeat(pv, reps, axis=1)
        scores_p = jnp.einsum(
            "bthd,chd->bhtc", q.astype(jnp.float32),
            pk.astype(jnp.float32)) * scale
        if prefix_mask is not None:
            pm = prefix_mask.astype(bool)
            if pm.ndim == 1:
                pm = pm[None]
            scores_p = jnp.where(pm[:, None, None, :], scores_p, _NEG_INF)
        # joint softmax over [prefix ++ own] — exact, not an approximation
        scores = jnp.concatenate([scores_p, scores], axis=-1)

    probs = jax.nn.softmax(scores, axis=-1)
    out_p = None
    if prefix_k is not None:
        p_pre, probs = probs[..., :C], probs[..., C:]
        out_p = jnp.einsum("bhtc,chd->bthd", p_pre, pv.astype(jnp.float32))
    if v_scale is not None:
        probs = probs * v_scale[:, :, None, :]
    if int4:
        v_low, v_high = unpack_int4(v_vals)
        out = jnp.concatenate([
            jnp.einsum(f"bhts,{kv_sub}->bthd", probs[:, : H // 2],
                       v_low.astype(jnp.float32)),
            jnp.einsum(f"bhts,{kv_sub}->bthd", probs[:, H // 2:],
                       v_high.astype(jnp.float32)),
        ], axis=2)  # heads [0,H/2) ++ [H/2,H) — original order
    else:
        out = jnp.einsum(f"bhts,{kv_sub}->bthd", probs,
                         v_vals.astype(jnp.float32))
    if out_p is not None:
        out = out + out_p
    return out.astype(q.dtype)


def decode_step_attention(
    q: jax.Array,                      # [B, 1, H, Dh]
    k,                                 # cache window (array or int8 dict)
    v,
    k_self: jax.Array,                 # [B, 1, KVH, Dh] fp32 — current token
    v_self: jax.Array,
    mask: Optional[jax.Array],         # [B, S] prefix-row validity
    q_offset,                          # scalar: populated prefix length
    kv_layout: str = "bshd",
) -> jax.Array:
    """Single-token decode attention where the current token's K/V are NOT
    yet written to the cache: prefix scores over the (read-only) cache
    window plus the token's self-score, merged at the score level.

    The cache window is consumed in place — its slice fuses into the score
    / output einsum reads, so the layer loop never materialises a sliced
    K/V copy (the reason this exists: XLA cannot alias a scan-carried
    cache that is updated in-loop with the attention reads, costing ~4.8
    ms/step of pure copies at the 7B B=24 serving point; see
    ``llama.forward``'s fast decode path, which passes the cache as scan
    xs and defers the write).

    ``k_self`` / ``v_self`` must hold the values a reader of the cache
    would see (i.e. dequantised int8 for a quantised cache) so results
    match the write-then-read path bit-for-bit up to reduction order.
    Prefix rows ``j`` are allowed iff ``mask[b, j]`` and ``j < q_offset``
    (strict: row ``q_offset`` is unwritten); the self term is always
    allowed."""
    B, T, H, Dh = q.shape
    assert T == 1, "decode_step_attention handles single-token queries"
    k_vals, k_scale = (k["q"], k["s"]) if isinstance(k, dict) else (k, None)
    v_vals, v_scale = (v["q"], v["s"]) if isinstance(v, dict) else (v, None)
    head_axis = {"bshd": 2, "bhsd": 1, "shbd": 1}[kv_layout]
    S = k_vals.shape[{"bshd": 1, "bhsd": 2, "shbd": 0}[kv_layout]]
    if k_vals.shape[head_axis] != H:  # GQA head groups
        reps = H // k_vals.shape[head_axis]
        k_vals = jnp.repeat(k_vals, reps, axis=head_axis)
        v_vals = jnp.repeat(v_vals, reps, axis=head_axis)
    if k_scale is not None and k_scale.shape[1] != H:
        k_scale = jnp.repeat(k_scale, H // k_scale.shape[1], axis=1)
    if v_scale is not None and v_scale.shape[1] != H:
        v_scale = jnp.repeat(v_scale, H // v_scale.shape[1], axis=1)
    if k_self.shape[2] != H:
        reps = H // k_self.shape[2]
        k_self = jnp.repeat(k_self, reps, axis=2)
        v_self = jnp.repeat(v_self, reps, axis=2)
    scale = Dh ** -0.5

    qf = q.astype(jnp.float32)
    scores = jnp.einsum(
        f"bthd,{kv_layout}->bhts", qf, k_vals.astype(jnp.float32)
    ) * scale                                              # [B, H, 1, S]
    if k_scale is not None:
        scores = scores * k_scale[:, :, None, :]
    k_rows = jnp.arange(S)[None, None, None, :]
    allowed = k_rows < jnp.asarray(q_offset)
    if mask is not None:
        allowed = allowed & mask[:, None, None, :].astype(bool)
    scores = jnp.where(allowed, scores, _NEG_INF)

    s_self = (jnp.einsum("bthd,bthd->bht", qf,
                         k_self.astype(jnp.float32)) * scale)[..., None]
    # einsum output order is [B, H, T]; with T == 1 this is [B, H, 1, 1]
    probs = jax.nn.softmax(
        jnp.concatenate([scores, s_self], axis=-1), axis=-1)
    p_pre, p_self = probs[..., :S], probs[..., S:]
    if v_scale is not None:
        p_pre = p_pre * v_scale[:, :, None, :]
    out = jnp.einsum(f"bhts,{kv_layout}->bthd", p_pre,
                     v_vals.astype(jnp.float32))
    out = out + jnp.transpose(p_self, (0, 2, 1, 3)) * v_self.astype(
        jnp.float32)                                       # [B,1,H,1]*[B,1,H,Dh]
    return out.astype(q.dtype)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    q_offset=0,
    causal: bool = True,
    impl: str = "auto",
    kv_layout: str = "bshd",
    prefix_k: Optional[jax.Array] = None,
    prefix_v: Optional[jax.Array] = None,
    prefix_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Dispatch to the Pallas flash kernel when profitable, else XLA.

    Flash is used for TPU self-attention prefill (T == S, static offset 0):
    that is where the O(T²) score matrix would otherwise round-trip HBM.
    Decode steps (T == 1), cache-layout reads, and batch-shared prefix
    segments (``prefix_k``/``prefix_v`` — the flash kernel has no notion
    of an extra KV segment) stay on the XLA path.
    """
    if (impl == "xla" or isinstance(k, dict) or kv_layout != "bshd"
            or prefix_k is not None):
        return xla_attention(q, k, v, mask, q_offset, causal, kv_layout,
                             prefix_k=prefix_k, prefix_v=prefix_v,
                             prefix_mask=prefix_mask)

    # flash masks keys at j <= i (row-local causality) — it has no notion
    # of a query offset, so any nonzero/traced q_offset MUST stay on the
    # XLA path or every query silently loses its view of the prefix
    offset_zero = isinstance(q_offset, int) and q_offset == 0
    if impl == "flash" and not offset_zero:
        raise ValueError(
            "impl='flash' supports only a static q_offset of 0 (prefill); "
            "cached/offset reads take the XLA path")
    use_flash = (
        impl == "flash"
        or (
            impl == "auto"
            and offset_zero
            and jax.default_backend() == "tpu"
            and q.shape[1] > 1
            and q.shape[1] == k.shape[1]
            and q.shape[-1] % 128 == 0
        )
    )
    if use_flash:
        from ospo_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, mask=mask, causal=causal)
    return xla_attention(q, k, v, mask, q_offset, causal)
