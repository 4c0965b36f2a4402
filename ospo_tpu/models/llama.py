"""Llama-architecture decoder in pure-functional JAX.

The Janus-Pro language model is a DeepSeek-LLM (Llama-arch) decoder — the
reference instantiates it as ``LlamaForCausalLM(language_config)``
(``janus/models/modeling_vlm.py:218-219``) and never modifies the
architecture.  This is a from-scratch TPU-first implementation:

- all per-layer weights are **stacked** along a leading layer axis and the
  forward pass is a single ``jax.lax.scan`` over layers → one compiled layer
  body instead of 30 unrolled ones;
- a preallocated fixed-shape KV cache (``[n_layers, B, S_max, H, Dh]``)
  updated with ``lax.dynamic_update_slice`` supports left-padded prefill and
  single-token decode without retracing;
- attention dispatches to a Pallas flash kernel on TPU prefill and a fused
  XLA path elsewhere (see :mod:`ospo_tpu.ops.attention`);
- weights live in bf16; RMSNorm/softmax/rotary run in fp32.

Numerics are verified against ``transformers.LlamaForCausalLM`` in
``tests/test_llama_parity.py``.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ospo_tpu.ops.attention import attention, unpack_int4

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 102400
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 30
    num_heads: int = 32
    num_kv_heads: Optional[int] = None  # None → MHA
    head_dim: Optional[int] = None
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6
    max_seq_len: int = 4096
    dtype: Any = jnp.bfloat16

    @property
    def kv_heads(self) -> int:
        return self.num_kv_heads or self.num_heads

    @property
    def dim_head(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads


# DeepSeek-LLM-7B-base — the Janus-Pro-7B language config
# (hidden 4096 cited at ospo/wrapper/train.py:231; 30 layers / 32 heads /
# intermediate 11008 / vocab 102400 from the HF checkpoint config).
LLAMA_7B = LlamaConfig()

# DeepSeek-LLM-1.3B — the Janus-Pro-1B language config.
LLAMA_1B = LlamaConfig(
    hidden_size=2048, intermediate_size=5632, num_layers=24, num_heads=16
)


def tiny_config(
    vocab_size: int = 512,
    hidden_size: int = 64,
    intermediate_size: int = 128,
    num_layers: int = 2,
    num_heads: int = 4,
    max_seq_len: int = 512,
    dtype: Any = jnp.float32,
) -> LlamaConfig:
    return LlamaConfig(
        vocab_size=vocab_size,
        hidden_size=hidden_size,
        intermediate_size=intermediate_size,
        num_layers=num_layers,
        num_heads=num_heads,
        max_seq_len=max_seq_len,
        dtype=dtype,
    )


# ---------------------------------------------------------------------------
# parameter initialisation
# ---------------------------------------------------------------------------


def init_params(cfg: LlamaConfig, key: jax.Array) -> Params:
    """Random-init a stacked-layer parameter tree."""
    d, i, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    h, kvh, dh, n = cfg.num_heads, cfg.kv_heads, cfg.dim_head, cfg.num_layers
    keys = jax.random.split(key, 10)
    std = 0.02

    def norm(k, *shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(cfg.dtype)

    # all projection weights torch-layout [out_features, in_features]
    return {
        "embed": norm(keys[0], v, d),
        "layers": {
            "attn_norm": jnp.ones((n, d), cfg.dtype),
            "wq": norm(keys[1], n, h * dh, d),
            "wk": norm(keys[2], n, kvh * dh, d),
            "wv": norm(keys[3], n, kvh * dh, d),
            "wo": norm(keys[4], n, d, h * dh),
            "mlp_norm": jnp.ones((n, d), cfg.dtype),
            "w_gate": norm(keys[5], n, i, d),
            "w_up": norm(keys[6], n, i, d),
            "w_down": norm(keys[7], n, d, i),
        },
        "final_norm": jnp.ones((d,), cfg.dtype),
        "lm_head": norm(keys[8], v, d),
    }


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    rms = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return ((xf * rms).astype(x.dtype) * weight).astype(x.dtype)


def rope_frequencies(cfg: LlamaConfig, positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for the given positions ([B, T] → [B, T, Dh/2])."""
    dh = cfg.dim_head
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, dh, 2, dtype=jnp.float32) / dh)
    )
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [B, T, Dh/2]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """HF-Llama rotate-half convention. x: [B, T, H, Dh]."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    cos = cos[:, :, None, :]  # [B, T, 1, Dh/2]
    sin = sin[:, :, None, :]
    xf1 = x1.astype(jnp.float32)
    xf2 = x2.astype(jnp.float32)
    out = jnp.concatenate([xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1)
    return out.astype(x.dtype)


_PROJ_INDEX = {
    "q_proj": 0, "k_proj": 1, "v_proj": 2, "o_proj": 3,
    "gate_proj": 4, "up_proj": 5, "down_proj": 6,
}


def _maybe_lora(x: jax.Array, w: jax.Array, lora: Optional[Dict[str, jax.Array]],
                name: str, scaling: float,
                dropout_rate: float = 0.0,
                dropout_key: Optional[jax.Array] = None) -> jax.Array:
    """y = x @ wᵀ (+ scaling * (x @ A) @ B when a LoRA adapter exists).

    Weights are stored torch-layout ``[out_features, in_features]`` — the
    contraction on the trailing dim lets XLA slice the stacked [L, F, D]
    tensors in both prefill and decode loops without materialising
    transposed copies (≈2 GB of HLO temps at 7B otherwise), and makes HF
    checkpoint porting transpose-free.  ``lora`` holds per-projection
    stacked A [d_in, r] / B [r, d_out] for the current layer.
    """
    if isinstance(w, dict) and "q4" in w:
        # weight-only int4: {"q4", "s"} is per-output-row scaled,
        # {"q4", "gs"} group-wise (g=128 along the input dim — the
        # quality fix).  OSPO_INT4_KERNEL=1 opts decode shapes (T == 1)
        # on TPU into the Pallas single-stream kernel
        # (ops/int4_matmul.py).  NOT the default: the chip measured it
        # at parity on the stacked-matmul microbench (34.6 vs 34.7 ms —
        # the decode matmul is VPU-unpack-bound, not HBM-bound, at
        # serving M, so halving the byte stream buys nothing) and 6%
        # slower on the B=32 serving point (1008.5 vs 1069.6 tok/s;
        # BENCH_NOTES round-4 "int4 single-stream kernel").
        from ospo_tpu.ops import int4_matmul as _i4k
        from ospo_tpu.ops import quant as _quant

        if (_i4k.supported(x, w) and jax.default_backend() == "tpu"
                and os.environ.get("OSPO_INT4_KERNEL", "0") == "1"):
            y = _i4k.int4_matmul_decode(x, w)
        else:
            y = (_quant.quantized_matmul_int4_group(x, w) if "gs" in w
                 else _quant.quantized_matmul_int4(x, w))
    elif isinstance(w, dict) and "sa" in w:
        # W8A8 ({"q", "sa"}): dynamic per-token int8 activations, int8×int8
        # dot with int32 accumulation — the MXU's 2× int8 rate for
        # compute-bound large-M prefills (ops/quant.quantized_matmul_w8a8).
        # Under quant.w8a16_override() (trace-time flag) the SAME payload
        # runs weight-only — used by the scoring engine's precision-mixed
        # readout (suffix passes in W8A16, prefill in w8a8).
        from ospo_tpu.ops import quant as _quant

        y = (_quant.quantized_matmul_w8a16(x, w) if _quant.w8a16_active()
             else _quant.quantized_matmul_w8a8(x, w))
    elif isinstance(w, dict):  # weight-only int8 ({"q", "s"}, ops/quant.py)
        y = jnp.einsum("btd,fd->btf", x, w["q"].astype(x.dtype))
        y = y * w["s"].astype(x.dtype)
    else:
        y = jnp.einsum("btd,fd->btf", x, w)
    if lora is not None and name in lora:
        a, b = lora[name]["a"], lora[name]["b"]
        x_l = x
        if dropout_rate and dropout_key is not None:
            # peft semantics: dropout on the adapter branch input only
            k = jax.random.fold_in(dropout_key, _PROJ_INDEX[name])
            keep = jax.random.bernoulli(k, 1.0 - dropout_rate, x.shape)
            x_l = jnp.where(keep, x / (1.0 - dropout_rate), 0.0).astype(x.dtype)
        y = y + scaling * jnp.einsum(
            "btr,rf->btf", jnp.einsum("btd,dr->btr", x_l, a.astype(x.dtype)),
            b.astype(x.dtype),
        )
    return y


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int,
                  quantized: bool = False,
                  head_major: bool = False,
                  layout: Optional[str] = None) -> Dict[str, jax.Array]:
    """Preallocated cache.  ``layout`` (or the legacy ``head_major`` flag):

    - ``"bshd"`` (default) — position-major ``[L, B, S, H, Dh]``: fastest
      XLA decode path at moderate batch (fresh [B, T, H, Dh] rows DUS in
      transpose-free; 543.9 vs 530.4 tok/s head-major at 7B B=12 int8).
    - ``"bhsd"`` — head-major ``[L, B, H, S, Dh]``, required by the Pallas
      decode kernel (``ops/decode_attention.py``): contiguous per-head
      position streams make head-block × position-block HBM DMA slices
      tile-legal.
    - ``"shbd"`` — batch-minor ``[L, S, H, B, Dh]``: the in-loop layout XLA
      itself switches to at large batch (decode attention vectorises over
      batch in the lanes); allocating it up front avoids XLA keeping two
      layout copies of the cache (observed OOM at B=22 CFG pairs, 7B int8).

    Scales are ``[L, B, H, S]`` for ``bshd``/``bhsd`` (``xla_attention``
    consumes [B, H, S]) and layout-matched ``[L, S, H, B]`` for ``shbd``
    (so the Pallas decode kernel's position-block scale DMAs are contiguous,
    like the payload's).  ``quantized=True`` / ``"int8"`` stores K/V as
    int8 with per-(position, head) fp32 scales — halves the decode loop's
    dominant HBM stream at large batch.  ``quantized="int4"`` packs two
    4-bit values per byte along the HEAD axis (head ``j`` + head
    ``j + H/2`` per byte, ``_quantize_rows_int4`` — trailing Dh stays 128
    so the TPU tiling is unchanged) — quarter the bf16 stream, raising
    the OOM-bound serving batch; the dequantised read fuses into the
    attention einsums (``ops.attention.xla_attention``)."""
    layout = layout or ("bhsd" if head_major else "bshd")
    L, H, D = cfg.num_layers, cfg.kv_heads, cfg.dim_head
    int4 = quantized == "int4"
    Hp = H // 2 if int4 else H
    if int4:
        assert H % 2 == 0, "int4 KV packs head pairs (even head count)"
    shape = {
        "bshd": (L, batch, max_len, Hp, D),
        "bhsd": (L, batch, Hp, max_len, D),
        "shbd": (L, max_len, Hp, batch, D),
    }[layout]
    if quantized:
        sshape = (L, max_len, H, batch) if layout == "shbd" \
            else (L, batch, H, max_len)
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "k_s": jnp.zeros(sshape, jnp.float32),
            "v": jnp.zeros(shape, jnp.int8),
            "v_s": jnp.zeros(sshape, jnp.float32),
            "length": jnp.zeros((), jnp.int32),
        }
    return {
        "k": jnp.zeros(shape, cfg.dtype),
        "v": jnp.zeros(shape, cfg.dtype),
        "length": jnp.zeros((), jnp.int32),
    }


def _quantize_rows(x: jax.Array):
    """[B, T, H, Dh] → (int8 values, fp32 scales [B, T, H])."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def _quantize_rows_int4(x: jax.Array):
    """[..., H, Dh] → (packed int8 [..., H/2, Dh], fp32 scales [..., H]).

    Symmetric 15-level per-(row, head) quantisation, two HEADS per byte:
    byte at head-slot ``j`` holds head ``j`` in the low nibble and head
    ``j + H/2`` in the high nibble (two's complement).  Packing along the
    head axis (not Dh) keeps the trailing dimension at Dh=128, so the TPU
    (sublane, 128-lane) tiling of the cache is unchanged and the byte
    halving is real — packing along Dh left a 64-wide minor dim that XLA
    padded straight back to 128 (measured: zero savings + OOM at B=32).
    Unpack with arithmetic shifts (``ops.attention.unpack_int4``), which
    fuse into the attention reads; scales stay per-head (unpacked)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-12) / 7.0
    q = jnp.clip(jnp.round(xf / s[..., None]), -7, 7).astype(jnp.int8)
    H = q.shape[-2]
    assert H % 2 == 0, "int4 KV packs head pairs — needs an even head count"
    lo = q[..., : H // 2, :] & jnp.int8(0x0F)
    hi = q[..., H // 2:, :] << jnp.int8(4)
    return (lo | hi).astype(jnp.int8), s



# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def forward(
    params: Params,
    cfg: LlamaConfig,
    inputs_embeds: jax.Array,          # [B, T, D]
    attention_mask: jax.Array,         # [B, S] validity over *all* positions so far
    positions: jax.Array,              # [B, T] rotary positions of the new tokens
    kv_cache: Optional[Dict[str, jax.Array]] = None,
    lora: Optional[Params] = None,
    lora_scaling: float = 1.0,
    lora_dropout: float = 0.0,
    lora_dropout_rng: Optional[jax.Array] = None,
    remat: bool = False,
    self_attn: bool = False,
    attn_impl: str = "auto",
    attn_window: Optional[int] = None,
    decode_kernel: bool = False,
    cache_head_major: bool = False,
    cache_layout: Optional[str] = None,
    cache_positions: Optional[jax.Array] = None,
    prefix_kv: Optional[Dict[str, jax.Array]] = None,
) -> Tuple[jax.Array, Optional[Dict[str, jax.Array]]]:
    """Run the decoder trunk; returns final-norm hidden states.

    Without a cache: ``attention_mask`` is ``[B, T]`` over the inputs and a
    causal mask is applied.  With a cache: the new ``T`` tokens are written
    at offset ``kv_cache['length']`` and queries attend to every valid cached
    position ≤ their own absolute index; ``attention_mask`` must cover the
    full cache window ``[B, S_max]``.

    ``self_attn=True`` is a static prefill fast-path: the cache is still
    written, but attention runs over the fresh ``[B, T]`` chunk only (valid
    when the cache was empty).  This keeps prefill on the Pallas flash
    kernel (T == S) instead of attending over the whole padded cache window;
    ``attention_mask`` must then be ``[B, T]``.

    ``cache_positions`` ([B] int32) switches the cached path to *per-row*
    write offsets (scatter instead of a shared dynamic-update-slice) with
    per-row causal offsets — the mechanism behind speculative Jacobi
    decoding, where batch rows advance unevenly.  XLA keeps the scatter
    in-place on the scan-carried cache.

    ``cache_layout`` (static; or the legacy ``cache_head_major`` flag) must
    match the layout the cache was built with (``init_kv_cache``) on EVERY
    call that touches it — prefill and decode alike.  ``decode_kernel=True``
    requires the batch-minor ``"shbd"`` layout (and falls back to the XLA
    read path when the flattened H·B axis is not 128-aligned); per-row
    ``cache_positions`` supports ``"bshd"`` and ``"bhsd"``.

    ``prefix_kv`` ``{"k": [L, C, KVH, Dh], "v": [L, C, KVH, Dh],
    "mask": [C]/[1,C]/[B,C]}`` adds a BATCH-SHARED read-only KV segment
    preceding every cached position — the text engine's shared-prefix
    decode stores a few-shot template's KV once instead of per batch row
    (1/B the prefix HBM and per-step read traffic).  The per-layer slices
    ride the layer scan as xs (read-only — no cache copy); the caller owns
    the rotary-position offset (positions of the new tokens must continue
    AFTER the prefix).  Supported with ``self_attn`` prefill and standard
    cached decode; not with ``decode_kernel`` / per-row offsets / the
    fast-decode xs path.
    """
    x = inputs_embeds.astype(cfg.dtype)
    cos, sin = rope_frequencies(cfg, positions)
    use_cache = kv_cache is not None
    # the cached scan does not thread per-layer dropout keys — refuse
    # loudly rather than silently running the adapters deterministic
    assert not (use_cache and lora_dropout and lora_dropout_rng is not None), \
        "LoRA dropout is only supported on the non-cached (training) path"
    cache_len = kv_cache["length"] if use_cache else None
    T = x.shape[1]

    def qkv(x, lp, llora, lkey=None):
        h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
        q = _maybe_lora(h, lp["wq"], llora, "q_proj", lora_scaling,
                        lora_dropout, lkey)
        k = _maybe_lora(h, lp["wk"], llora, "k_proj", lora_scaling,
                        lora_dropout, lkey)
        v = _maybe_lora(h, lp["wv"], llora, "v_proj", lora_scaling,
                        lora_dropout, lkey)
        B = h.shape[0]
        q = q.reshape(B, T, cfg.num_heads, cfg.dim_head)
        k = k.reshape(B, T, cfg.kv_heads, cfg.dim_head)
        v = v.reshape(B, T, cfg.kv_heads, cfg.dim_head)
        return apply_rope(q, cos, sin), apply_rope(k, cos, sin), v

    def post_attention(x, lp, llora, attn_out, lkey=None):
        B = x.shape[0]
        attn_out = attn_out.reshape(B, T, cfg.num_heads * cfg.dim_head)
        x = x + _maybe_lora(attn_out, lp["wo"], llora, "o_proj", lora_scaling,
                            lora_dropout, lkey)
        h = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
        gate = _maybe_lora(h, lp["w_gate"], llora, "gate_proj", lora_scaling,
                           lora_dropout, lkey)
        up = _maybe_lora(h, lp["w_up"], llora, "up_proj", lora_scaling,
                         lora_dropout, lkey)
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(h.dtype) * up
        return x + _maybe_lora(act, lp["w_down"], llora, "down_proj",
                               lora_scaling, lora_dropout, lkey)

    def finish_layer(x, lp, llora, q, k_att, v_att, q_offset, att_mask,
                     lkey=None, kv_layout="bshd", pk=None, pv=None):
        attn_out = attention(q, k_att, v_att, mask=att_mask,
                             q_offset=q_offset, causal=True, impl=attn_impl,
                             kv_layout=kv_layout,
                             prefix_k=pk, prefix_v=pv,
                             prefix_mask=(prefix_kv["mask"]
                                          if pk is not None else None))
        return post_attention(x, lp, llora, attn_out, lkey)

    if use_cache:
        # Cache as scan *carry* (not ys): the dynamic_update_slice aliases
        # the carried buffer in-place inside the while loop — no full-cache
        # copy per decode step (2×[L,B,S,H,Dh] would otherwise round-trip
        # HBM on every generated token).
        quantized_cache = "k_s" in kv_cache  # int8/int4 KV (init_kv_cache)

        per_row = cache_positions is not None
        layout = cache_layout or ("bhsd" if cache_head_major else "bshd")
        # int4 caches pack head pairs per byte — recognised by the halved
        # head axis (static shape check; init_kv_cache(quantized="int4"))
        head_ax = {"bshd": 3, "bhsd": 2, "shbd": 2}[layout]
        int4_cache = quantized_cache and \
            kv_cache["k"].shape[head_ax] == cfg.kv_heads // 2
        if int4_cache:
            assert not decode_kernel, \
                "decode_kernel reads the int8 cache representation"
            assert cfg.kv_heads == cfg.num_heads, \
                "int4 KV currently supports MHA only (head-pair packing)"
            assert not per_row, \
                "int4 KV does not support per-row offsets (SJD)"
        if decode_kernel:
            assert layout == "shbd", (
                "decode_kernel requires the batch-minor cache "
                "(init_kv_cache(layout='shbd') + cache_layout='shbd')")
            assert not per_row, (
                "decode_kernel does not support per-row offsets (SJD)")
            if x.shape[0] * cfg.kv_heads % 128 != 0 \
                    and jax.default_backend() == "tpu":
                # the kernel flattens (H, B) onto the 128-wide lanes; at
                # small batch (e.g. 2 CFG rows x 32 heads = 64) fall back
                # to the XLA read path rather than crash mid-trace —
                # shapes are static here, so this is a compile-time choice
                decode_kernel = False
        if per_row:
            assert layout != "shbd", (
                "per-row cache offsets (SJD) not supported batch-minor")
        if prefix_kv is not None:
            assert not (per_row or decode_kernel), (
                "prefix_kv (batch-shared KV segment) is supported on the "
                "standard cached path only — not SJD per-row offsets or "
                "the Pallas decode kernel")

        # fresh-row permutation [B,T,H,D] → cache row order, and the DUS
        # start index for the shared-offset write
        row_perm = {"bshd": None, "bhsd": (0, 2, 1, 3),
                    "shbd": (1, 2, 0, 3)}[layout]
        dus_idx = {"bshd": lambda li: (li, 0, cache_len, 0, 0),
                   "bhsd": lambda li: (li, 0, 0, cache_len, 0),
                   "shbd": lambda li: (li, cache_len, 0, 0, 0)}[layout]

        def write_kv(cache, li, kval, ks_t, vval, vs_t):
            """Write the fresh rows: shared-offset DUS (standard decode) or
            per-row scatter (speculative Jacobi).  kval/vval are in cache
            row order (``row_perm`` applied); scales are [B, H, T] for the
            batch-major layouts, [T, H, B] for ``shbd`` (layout-matched,
            see ``init_kv_cache``)."""
            if not per_row:
                s_idx = (li, cache_len, 0, 0) if layout == "shbd" \
                    else (li, 0, 0, cache_len)
                out = {
                    "k": jax.lax.dynamic_update_slice(
                        cache["k"], kval[None], dus_idx(li)),
                    "v": jax.lax.dynamic_update_slice(
                        cache["v"], vval[None], dus_idx(li)),
                }
                if ks_t is not None:
                    out["k_s"] = jax.lax.dynamic_update_slice(
                        cache["k_s"], ks_t[None], s_idx)
                    out["v_s"] = jax.lax.dynamic_update_slice(
                        cache["v_s"], vs_t[None], s_idx)
                return out
            hm = layout == "bhsd"
            Bq = kval.shape[0]
            Hq, Tq = (kval.shape[1], kval.shape[2]) if hm \
                else (kval.shape[2], kval.shape[1])
            b3 = jnp.arange(Bq)[:, None, None]
            h3 = jnp.arange(Hq)[None, :, None]
            s3 = (cache_positions[:, None] + jnp.arange(Tq)[None, :])[:, None, :]
            if hm:
                out = {
                    "k": cache["k"].at[li, b3, h3, s3].set(kval),
                    "v": cache["v"].at[li, b3, h3, s3].set(vval),
                }
            else:
                bidx = jnp.arange(Bq)[:, None]
                sidx = cache_positions[:, None] + jnp.arange(Tq)[None, :]
                out = {
                    "k": cache["k"].at[li, bidx, sidx].set(kval),
                    "v": cache["v"].at[li, bidx, sidx].set(vval),
                }
            if ks_t is not None:
                out["k_s"] = cache["k_s"].at[li, b3, h3, s3].set(ks_t)
                out["v_s"] = cache["v_s"].at[li, b3, h3, s3].set(vs_t)
            return out

        # Optional copy-free decode path (T == 1, shared offset, no Pallas
        # kernel): the cache is read as scan *xs* (immutable — its
        # per-layer slice fuses into the attention einsums, no materialised
        # copy) and the fresh rows come out as ys, written back in ONE
        # dynamic_update_slice after the layer scan; the current token's
        # K/V are merged at the score level
        # (ops.attention.decode_step_attention).  Measured on v5e at the
        # 7B B=24 int8 serving point: the per-layer slice copies this
        # removes turn out to overlap well in XLA's schedule, so it is
        # ~2.5% SLOWER end-to-end (965 vs 992 tok/s) while cold-compiling
        # 3.4× faster (178 s vs 616 s) — default off, enable with
        # OSPO_FAST_DECODE=1 where compile latency matters more than peak
        # throughput.
        fast_decode = T == 1 and not self_attn and not per_row \
            and not decode_kernel and not int4_cache \
            and prefix_kv is None \
            and os.environ.get("OSPO_FAST_DECODE", "0") == "1"
        cache0 = {k_: v_ for k_, v_ in kv_cache.items() if k_ != "length"}
        if fast_decode:
            from ospo_tpu.ops.attention import decode_step_attention

            W = attn_window
            pos_ax = {"bshd": 1, "bhsd": 2, "shbd": 0}[layout]
            s_ax = 0 if layout == "shbd" else 2
            # _quantize_rows scales are [B, T, H]; cache scale order is
            # [B, H, T] batch-major, [T, H, B] batch-minor
            sperm = (1, 2, 0) if layout == "shbd" else (0, 2, 1)

            def win(sl, s_axis):
                if W is None:
                    return sl
                return (sl[:W], sl[:, :W], sl[:, :, :W])[s_axis]

            def layer_fast(x, layer_in):
                lp, llora, kc, vc, ksc, vsc = layer_in
                q, k, v = qkv(x, lp, llora)
                if quantized_cache:
                    kq, ks = _quantize_rows(k)          # [B,T,H,*]
                    vq, vs = _quantize_rows(v)
                    # self K/V = what a cache reader would see (dequantised)
                    k_self = kq.astype(jnp.float32) * ks[..., None]
                    v_self = vq.astype(jnp.float32) * vs[..., None]

                    def scales(s):
                        s = win(s, s_ax)
                        return jnp.transpose(s, (2, 1, 0)) \
                            if layout == "shbd" else s

                    k_att = {"q": win(kc, pos_ax), "s": scales(ksc)}
                    v_att = {"q": win(vc, pos_ax), "s": scales(vsc)}
                else:
                    k_self = k.astype(cache0["k"].dtype)
                    v_self = v.astype(cache0["v"].dtype)
                    k_att, v_att = win(kc, pos_ax), win(vc, pos_ax)
                attn_out = decode_step_attention(
                    q, k_att, v_att, k_self, v_self, attention_mask,
                    cache_len, kv_layout=layout)
                x = post_attention(x, lp, llora, attn_out)
                if quantized_cache:
                    kw = jnp.transpose(kq, row_perm) if row_perm else kq
                    vw = jnp.transpose(vq, row_perm) if row_perm else vq
                    return x, (kw, jnp.transpose(ks, sperm),
                               vw, jnp.transpose(vs, sperm))
                return x, (jnp.transpose(k_self, row_perm)
                           if row_perm else k_self,
                           jnp.transpose(v_self, row_perm)
                           if row_perm else v_self)

            # dummy per-layer zeros where an xs leaf is absent (bf16 cache
            # has no scales) — scan needs every leaf to carry the L axis
            dummy = jnp.zeros((cfg.num_layers,), jnp.float32)
            xs_cache = (cache0["k"], cache0["v"],
                        cache0.get("k_s", dummy), cache0.get("v_s", dummy))
            if lora is None:
                x_final, fresh = jax.lax.scan(
                    lambda c, t: layer_fast(c, (t[0], None) + t[1:]),
                    x, (params["layers"],) + xs_cache,
                )
            else:
                x_final, fresh = jax.lax.scan(
                    layer_fast, x, (params["layers"], lora) + xs_cache,
                )
            # one write for all layers' fresh rows
            ys_idx = {"bshd": (0, 0, cache_len, 0, 0),
                      "bhsd": (0, 0, 0, cache_len, 0),
                      "shbd": (0, cache_len, 0, 0, 0)}[layout]
            new_cache = {
                "k": jax.lax.dynamic_update_slice(
                    cache0["k"], fresh[0], ys_idx),
                "length": kv_cache["length"] + T,
            }
            if quantized_cache:
                s_idx = (0, cache_len, 0, 0) if layout == "shbd" \
                    else (0, 0, 0, cache_len)
                new_cache["v"] = jax.lax.dynamic_update_slice(
                    cache0["v"], fresh[2], ys_idx)
                new_cache["k_s"] = jax.lax.dynamic_update_slice(
                    cache0["k_s"], fresh[1], s_idx)
                new_cache["v_s"] = jax.lax.dynamic_update_slice(
                    cache0["v_s"], fresh[3], s_idx)
            else:
                new_cache["v"] = jax.lax.dynamic_update_slice(
                    cache0["v"], fresh[1], ys_idx)
            x_final = rms_norm(x_final, params["final_norm"],
                               cfg.rms_norm_eps)
            return x_final, new_cache

        def layer_body(carry, layer_in):
            x, cache = carry
            lp, llora, li = layer_in[:3]
            # batch-shared prefix KV slices ride the scan as xs (read-only)
            pk, pv = layer_in[3:] if len(layer_in) > 3 else (None, None)
            q, k, v = qkv(x, lp, llora)
            # permute the fresh [B,T,H,D] rows to the cache's row order
            # (position-major writes the projection output untouched)
            k_w = jnp.transpose(k, row_perm) if row_perm else k
            v_w = jnp.transpose(v, row_perm) if row_perm else v

            if quantized_cache:
                if int4_cache:
                    # head-pair packing needs the head axis where qkv puts
                    # it ([B,T,H,D]) — quantize pre-permutation, then move
                    # payload ([B,T,H/2,D]) and scales ([B,T,H]) to cache
                    # row order
                    kq, ks = _quantize_rows_int4(k)
                    vq, vs = _quantize_rows_int4(v)
                    kq = jnp.transpose(kq, row_perm) if row_perm else kq
                    vq = jnp.transpose(vq, row_perm) if row_perm else vq
                    sperm = {"bshd": (0, 2, 1), "bhsd": (0, 2, 1),
                             "shbd": (1, 2, 0)}[layout]
                    ks = jnp.transpose(ks, sperm)
                    vs = jnp.transpose(vs, sperm)
                else:
                    kq, ks = _quantize_rows(k_w)  # scales in cache row order
                    vq, vs = _quantize_rows(v_w)
                    # scales to [B, H, T] (shbd keeps its order [T, H, B])
                    sperm = {"bshd": (0, 2, 1), "bhsd": None,
                             "shbd": None}[layout]
                    if sperm:
                        ks = jnp.transpose(ks, sperm)
                        vs = jnp.transpose(vs, sperm)
                cache = write_kv(cache, li, kq, ks, vq, vs)
            else:
                cache = write_kv(cache, li, k_w.astype(cache["k"].dtype), None,
                                 v_w.astype(cache["v"].dtype), None)

            if self_attn:
                x = finish_layer(x, lp, llora, q, k, v, 0, attention_mask,
                                 pk=pk, pv=pv)
            elif decode_kernel and T == 1:
                # Pallas decode attention: DMAs only the populated cache
                # prefix from HBM in contiguous position blocks (the whole
                # stacked shbd cache is passed pointer-wise — no per-layer
                # slice copy; see ops/decode_attention.py)
                from ospo_tpu.ops.decode_attention import decode_attention

                assert cfg.kv_heads == cfg.num_heads, (
                    "decode_kernel currently supports MHA only"
                )
                attn_out = decode_attention(
                    q, cache["k"], cache["v"], li, cache_len + T,
                    attention_mask,
                    k_scale=cache.get("k_s"), v_scale=cache.get("v_s"),
                    interpret=jax.default_backend() != "tpu",
                )
                x = post_attention(x, lp, llora, attn_out)
            else:
                # attn_window statically truncates the cache read to the
                # prefix that can be populated — segmented decode loops use
                # growing windows so early tokens don't stream the whole
                # (mostly-unwritten) cache from HBM
                W = attn_window

                def at(name, s_axis):
                    sl = jax.lax.dynamic_index_in_dim(
                        cache[name], li, 0, keepdims=False)
                    if W is None:
                        return sl
                    return (sl[:W], sl[:, :W], sl[:, :, :W])[s_axis]

                pos_ax = {"bshd": 1, "bhsd": 2, "shbd": 0}[layout]
                if quantized_cache:
                    # scales are [B,H,S] (batch-major layouts) or [S,H,B]
                    # (shbd) — xla_attention consumes [B,H,S]
                    s_ax = 0 if layout == "shbd" else 2

                    def scales(name):
                        s = at(name, s_ax)
                        return jnp.transpose(s, (2, 1, 0)) \
                            if layout == "shbd" else s

                    qkey = "q4" if int4_cache else "q"
                    k_att = {qkey: at("k", pos_ax), "s": scales("k_s")}
                    v_att = {qkey: at("v", pos_ax), "s": scales("v_s")}
                else:
                    k_att, v_att = at("k", pos_ax), at("v", pos_ax)
                q_off = cache_positions if per_row else cache_len
                x = finish_layer(x, lp, llora, q, k_att, v_att, q_off,
                                 attention_mask, kv_layout=layout,
                                 pk=pk, pv=pv)
            return (x, cache), None

        if remat:
            layer_body = jax.checkpoint(layer_body)
        layer_idx = jnp.arange(cfg.num_layers, dtype=jnp.int32)
        pxs = () if prefix_kv is None else (prefix_kv["k"], prefix_kv["v"])
        if lora is None:
            (x_final, cache_out), _ = jax.lax.scan(
                lambda c, t: layer_body(c, (t[0], None, t[1]) + tuple(t[2:])),
                (x, cache0),
                (params["layers"], layer_idx) + pxs,
            )
        else:
            (x_final, cache_out), _ = jax.lax.scan(
                layer_body,
                (x, cache0),
                (params["layers"], lora, layer_idx) + pxs,
            )
        new_cache = {**cache_out, "length": kv_cache["length"] + T}
    else:
        assert prefix_kv is None, \
            "prefix_kv requires a KV cache (serving path only)"

        def layer_body(x, layer_in):
            lp, llora, lkey = layer_in
            q, k, v = qkv(x, lp, llora, lkey)
            x = finish_layer(x, lp, llora, q, k, v, 0, attention_mask, lkey)
            return x, None

        if remat:
            layer_body = jax.checkpoint(layer_body)
        if lora is None:
            x_final, _ = jax.lax.scan(
                lambda c, t: layer_body(c, (t, None, None)), x, params["layers"]
            )
        elif lora_dropout and lora_dropout_rng is not None:
            layer_keys = jax.random.split(lora_dropout_rng, cfg.num_layers)
            x_final, _ = jax.lax.scan(
                layer_body, x, (params["layers"], lora, layer_keys)
            )
        else:
            x_final, _ = jax.lax.scan(
                lambda c, t: layer_body(c, (t[0], t[1], None)),
                x, (params["layers"], lora),
            )
        new_cache = None

    x_final = rms_norm(x_final, params["final_norm"], cfg.rms_norm_eps)
    return x_final, new_cache


def logits_from_hidden(params: Params, hidden: jax.Array) -> jax.Array:
    return jnp.einsum("btd,vd->btv", hidden, params["lm_head"]).astype(jnp.float32)


def embed_tokens(params: Params, input_ids: jax.Array) -> jax.Array:
    return jnp.take(params["embed"], input_ids, axis=0)


def positions_from_mask(attention_mask: jax.Array) -> jax.Array:
    """Rotary positions for left-padded batches: cumsum of validity − 1,
    clipped at 0 (pad positions get position 0, they're masked anyway)."""
    return jnp.maximum(jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1, 0)
