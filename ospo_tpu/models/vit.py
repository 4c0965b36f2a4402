"""SigLIP Vision Transformer (understanding encoder) in functional JAX.

Re-implements the reference's timm-based ViT
(``janus/models/siglip_vit.py:259-589`` + ``clip_encoder.py:30-122``) the
TPU way: stacked-layer ``lax.scan`` blocks, fused flash/XLA attention, exact
GELU, LayerNorm eps 1e-6.  Janus uses ``global_pool="map"`` with
``ignore_head=True`` and ``select_feature="same"`` — i.e. the understanding
path consumes the *post-norm patch tokens*; the latent attention-pool head
exists in checkpoints but is skipped.  ``select_layer`` truncates depth as
``min(layers, layers + select_layer + 1)`` for non-positive values
(``siglip_vit.py:653-656``).

No class token, no reg tokens (SigLIP), learned absolute position embedding
over patches.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ospo_tpu.ops.attention import attention

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 384
    patch_size: int = 16
    width: int = 1024
    layers: int = 24
    heads: int = 16
    mlp_ratio: float = 4.0
    select_layer: int = -1
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @property
    def depth(self) -> int:
        """Effective depth after select_layer truncation."""
        if self.select_layer <= 0:
            return min(self.layers, self.layers + self.select_layer + 1)
        return min(self.layers, self.select_layer)

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def mlp_hidden(self) -> int:
        return int(self.width * self.mlp_ratio)


# Janus-Pro understanding tower: SigLIP-Large/16 @384
SIGLIP_LARGE_384 = ViTConfig()
# SigLIP-so400m/14 @384 (the other tower the reference supports)
SIGLIP_SO400M_384 = ViTConfig(
    patch_size=14, width=1152, layers=27, heads=16, mlp_ratio=3.7362,
    select_layer=-1,
)


def tiny_vit_config(image_size=32, patch_size=16, width=32, layers=2, heads=2,
                    dtype=jnp.float32) -> ViTConfig:
    return ViTConfig(image_size=image_size, patch_size=patch_size, width=width,
                     layers=layers, heads=heads, select_layer=-1, dtype=dtype)


def init_params(cfg: ViTConfig, key: jax.Array) -> Params:
    keys = jax.random.split(key, 12)
    d, hdim, n = cfg.width, cfg.mlp_hidden, cfg.depth
    p, c = cfg.patch_size, 3
    std = 0.02

    def norm(k, *shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(cfg.dtype)

    return {
        "patch_embed": {
            "w": norm(keys[0], p, p, c, d),
            "b": jnp.zeros((d,), cfg.dtype),
        },
        "pos_embed": norm(keys[1], 1, cfg.num_patches, d),
        "blocks": {
            "norm1_scale": jnp.ones((n, d), cfg.dtype),
            "norm1_bias": jnp.zeros((n, d), cfg.dtype),
            "wqkv": norm(keys[2], n, 3 * d, d),
            "bqkv": jnp.zeros((n, 3 * d), cfg.dtype),
            "wo": norm(keys[3], n, d, d),
            "bo": jnp.zeros((n, d), cfg.dtype),
            "norm2_scale": jnp.ones((n, d), cfg.dtype),
            "norm2_bias": jnp.zeros((n, d), cfg.dtype),
            "w1": norm(keys[4], n, hdim, d),
            "b1": jnp.zeros((n, hdim), cfg.dtype),
            "w2": norm(keys[5], n, d, hdim),
            "b2": jnp.zeros((n, d), cfg.dtype),
        },
        "final_norm": {
            "scale": jnp.ones((d,), cfg.dtype),
            "bias": jnp.zeros((d,), cfg.dtype),
        },
    }


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out.astype(x.dtype) * scale + bias).astype(x.dtype)


def patchify(p: Params, cfg: ViTConfig, pixels: jax.Array) -> jax.Array:
    """[B, H, W, 3] → [B, N, D] via non-overlapping conv (stride = patch)."""
    out = jax.lax.conv_general_dilated(
        pixels.astype(cfg.dtype), p["w"],
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"]
    b, gh, gw, d = out.shape
    return out.reshape(b, gh * gw, d)


def forward(params: Params, cfg: ViTConfig, pixels: jax.Array) -> jax.Array:
    """pixels [B, H, W, 3] (already normalised) → patch features [B, N, D]."""
    x = patchify(params["patch_embed"], cfg, pixels)
    x = x + params["pos_embed"].astype(x.dtype)
    eps = cfg.layer_norm_eps
    h = cfg.heads
    dh = cfg.width // h

    def block(x, bp):
        hidd = layer_norm(x, bp["norm1_scale"], bp["norm1_bias"], eps)
        qkv = jnp.einsum("bnd,fd->bnf", hidd, bp["wqkv"]) + bp["bqkv"]
        b, n, _ = qkv.shape
        q, k, v = jnp.split(qkv.reshape(b, n, 3, h, dh), 3, axis=2)
        q, k, v = (t.squeeze(2) for t in (q, k, v))
        att = attention(q, k, v, mask=None, causal=False)
        att = att.reshape(b, n, h * dh)
        x = x + jnp.einsum("bnd,fd->bnf", att, bp["wo"]) + bp["bo"]

        hidd = layer_norm(x, bp["norm2_scale"], bp["norm2_bias"], eps)
        hidd = jnp.einsum("bnd,fd->bnf", hidd, bp["w1"]) + bp["b1"]
        hidd = jax.nn.gelu(hidd.astype(jnp.float32), approximate=False).astype(x.dtype)
        x = x + jnp.einsum("bnf,df->bnd", hidd, bp["w2"]) + bp["b2"]
        return x, None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    fn = params["final_norm"]
    return layer_norm(x, fn["scale"], fn["bias"], eps)


# ---------------------------------------------------------------------------
# latent attention pool ("map" head)
# ---------------------------------------------------------------------------
# Janus runs the tower with ignore_head=True, so this head is unused on the
# understanding path — but SigLIP checkpoints carry it (timm
# AttentionPoolLatent, siglip_vit.py:415-422) and downstream users of the
# framework may pool features; provided for capability completeness.


def init_attn_pool(cfg: ViTConfig, key: jax.Array) -> Params:
    d, hdim = cfg.width, cfg.mlp_hidden
    keys = jax.random.split(key, 6)
    std = 0.02

    def norm(k, *shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(cfg.dtype)

    return {
        "latent": norm(keys[0], 1, 1, d),
        "q": {"w": norm(keys[1], d, d), "b": jnp.zeros((d,), cfg.dtype)},
        "kv": {"w": norm(keys[2], 2 * d, d), "b": jnp.zeros((2 * d,), cfg.dtype)},
        "proj": {"w": norm(keys[3], d, d), "b": jnp.zeros((d,), cfg.dtype)},
        "norm": {"scale": jnp.ones((d,), cfg.dtype),
                 "bias": jnp.zeros((d,), cfg.dtype)},
        "fc1": {"w": norm(keys[4], hdim, d), "b": jnp.zeros((hdim,), cfg.dtype)},
        "fc2": {"w": norm(keys[5], d, hdim), "b": jnp.zeros((d,), cfg.dtype)},
    }


def attention_pool(params: Params, cfg: ViTConfig, tokens: jax.Array) -> jax.Array:
    """Latent-query attention pooling: [B, N, D] → [B, D] (pool='token')."""
    b, n, d = tokens.shape
    h = cfg.heads
    dh = d // h
    q = jnp.einsum("bld,fd->blf", jnp.broadcast_to(params["latent"], (b, 1, d)),
                   params["q"]["w"]) + params["q"]["b"]
    kv = jnp.einsum("bnd,fd->bnf", tokens, params["kv"]["w"]) + params["kv"]["b"]
    k, v = jnp.split(kv.reshape(b, n, 2, h, dh), 2, axis=2)
    q = q.reshape(b, 1, h, dh)
    att = attention(q, k.squeeze(2), v.squeeze(2), mask=None, causal=False)
    x = att.reshape(b, 1, d)
    x = jnp.einsum("bld,fd->blf", x, params["proj"]["w"]) + params["proj"]["b"]
    hmid = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"],
                      cfg.layer_norm_eps)
    hmid = jnp.einsum("bld,fd->blf", hmid, params["fc1"]["w"]) + params["fc1"]["b"]
    hmid = jax.nn.gelu(hmid.astype(jnp.float32), approximate=False).astype(x.dtype)
    hmid = jnp.einsum("blf,df->bld", hmid, params["fc2"]["w"]) + params["fc2"]["b"]
    x = x + hmid
    return x[:, 0]
