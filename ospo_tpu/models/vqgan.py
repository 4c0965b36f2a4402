"""VQ-GAN image tokenizer/detokenizer in functional JAX (NHWC).

TPU-first re-design of the reference VQModel ("VQ-16",
``janus/models/vq_model.py``): 16384×8 L2-normalised codebook, conv
encoder/decoder with GroupNorm+swish ResNet blocks and single-head
spatial attention at the lowest resolution, 16× downsampling
(384px → 24×24 latents → 576 tokens).

Differences from the torch original, by design:
- NHWC data layout end-to-end (TPU conv-native) instead of NCHW;
- nearest-neighbour codebook lookup as one [N, 8]×[8, 16384] matmul
  (argmin of ||z||² − 2·z·e over the codebook) — MXU-friendly;
- fp32 throughout the conv stacks (the torch bf16 `Upsample` interpolate
  workaround at vq_model.py:417-423 is unnecessary here).

Encode/decode are shape-verified and codebook-roundtrip-verified in
``tests/test_vqgan.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VQConfig:
    codebook_size: int = 16384
    codebook_dim: int = 8
    base_ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 256
    l2_norm_codebook: bool = True
    commit_beta: float = 0.25

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)


VQ_16 = VQConfig()


def tiny_vq_config(
    codebook_size: int = 64,
    codebook_dim: int = 8,
    base_ch: int = 16,
    ch_mult: Tuple[int, ...] = (1, 2),
    z_channels: int = 16,
) -> VQConfig:
    return VQConfig(
        codebook_size=codebook_size,
        codebook_dim=codebook_dim,
        base_ch=base_ch,
        ch_mult=ch_mult,
        z_channels=z_channels,
    )


# ---------------------------------------------------------------------------
# init helpers
# ---------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    w = jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
    w = w * (2.0 / fan_in) ** 0.5
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def _gn_init(ch):
    return {"scale": jnp.ones((ch,), jnp.float32), "bias": jnp.zeros((ch,), jnp.float32)}


def _res_block_init(key, cin, cout):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": _gn_init(cin),
        "conv1": _conv_init(k1, 3, 3, cin, cout),
        "norm2": _gn_init(cout),
        "conv2": _conv_init(k2, 3, 3, cout, cout),
    }
    if cin != cout:
        p["nin_shortcut"] = _conv_init(k3, 1, 1, cin, cout)
    return p


def _attn_block_init(key, ch):
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "norm": _gn_init(ch),
        "q": _conv_init(kq, 1, 1, ch, ch),
        "k": _conv_init(kk, 1, 1, ch, ch),
        "v": _conv_init(kv, 1, 1, ch, ch),
        "proj_out": _conv_init(ko, 1, 1, ch, ch),
    }


def init_params(cfg: VQConfig, key: jax.Array) -> Params:
    keys = iter(jax.random.split(key, 256))
    ch, mults = cfg.base_ch, cfg.ch_mult
    n_levels = len(mults)

    # ----- encoder -----
    enc: Params = {"conv_in": _conv_init(next(keys), 3, 3, 3, ch)}
    levels: List[Params] = []
    in_mults = (1,) + tuple(mults)
    block_in = ch
    for i in range(n_levels):
        block_in = ch * in_mults[i]
        block_out = ch * mults[i]
        level: Params = {"res": [], "attn": []}
        for _ in range(cfg.num_res_blocks):
            level["res"].append(_res_block_init(next(keys), block_in, block_out))
            block_in = block_out
            if i == n_levels - 1:
                level["attn"].append(_attn_block_init(next(keys), block_in))
        if i != n_levels - 1:
            level["downsample"] = _conv_init(next(keys), 3, 3, block_in, block_in)
        levels.append(level)
    enc["levels"] = levels
    enc["mid"] = [
        _res_block_init(next(keys), block_in, block_in),
        _attn_block_init(next(keys), block_in),
        _res_block_init(next(keys), block_in, block_in),
    ]
    enc["norm_out"] = _gn_init(block_in)
    enc["conv_out"] = _conv_init(next(keys), 3, 3, block_in, cfg.z_channels)

    # ----- decoder -----
    block_in = ch * mults[-1]
    dec: Params = {"conv_in": _conv_init(next(keys), 3, 3, cfg.z_channels, block_in)}
    dec["mid"] = [
        _res_block_init(next(keys), block_in, block_in),
        _attn_block_init(next(keys), block_in),
        _res_block_init(next(keys), block_in, block_in),
    ]
    dlevels: List[Params] = []
    for idx, i_level in enumerate(reversed(range(n_levels))):
        block_out = ch * mults[i_level]
        level = {"res": [], "attn": []}
        for _ in range(cfg.num_res_blocks + 1):
            level["res"].append(_res_block_init(next(keys), block_in, block_out))
            block_in = block_out
            if i_level == n_levels - 1:
                level["attn"].append(_attn_block_init(next(keys), block_in))
        if i_level != 0:
            level["upsample"] = _conv_init(next(keys), 3, 3, block_in, block_in)
        dlevels.append(level)
    dec["levels"] = dlevels
    dec["norm_out"] = _gn_init(block_in)
    dec["conv_out"] = _conv_init(next(keys), 3, 3, block_in, 3)

    codebook = jax.random.uniform(
        next(keys), (cfg.codebook_size, cfg.codebook_dim), jnp.float32,
        -1.0 / cfg.codebook_size, 1.0 / cfg.codebook_size,
    )
    if cfg.l2_norm_codebook:
        codebook = codebook / jnp.linalg.norm(codebook, axis=-1, keepdims=True)

    return {
        "encoder": enc,
        "decoder": dec,
        "codebook": codebook,
        "quant_conv": _conv_init(next(keys), 1, 1, cfg.z_channels, cfg.codebook_dim),
        "post_quant_conv": _conv_init(
            next(keys), 1, 1, cfg.codebook_dim, cfg.z_channels
        ),
    }


# ---------------------------------------------------------------------------
# building blocks (all NHWC, fp32)
# ---------------------------------------------------------------------------


def conv2d(p: Params, x: jax.Array, stride: int = 1,
           padding="SAME") -> jax.Array:
    out = jax.lax.conv_general_dilated(
        x, p["w"],
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"]


def group_norm(p: Params, x: jax.Array, groups: int = 32, eps: float = 1e-6) -> jax.Array:
    n, h, w, c = x.shape
    g = min(groups, c)
    xg = x.reshape(n, h, w, g, c // g)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xg.reshape(n, h, w, c) * p["scale"] + p["bias"]


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def res_block(p: Params, x: jax.Array) -> jax.Array:
    h = conv2d(p["conv1"], swish(group_norm(p["norm1"], x)))
    h = conv2d(p["conv2"], swish(group_norm(p["norm2"], h)))
    if "nin_shortcut" in p:
        x = conv2d(p["nin_shortcut"], x)
    return x + h


def attn_block(p: Params, x: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    hn = group_norm(p["norm"], x)
    q = conv2d(p["q"], hn).reshape(n, h * w, c)
    k = conv2d(p["k"], hn).reshape(n, h * w, c)
    v = conv2d(p["v"], hn).reshape(n, h * w, c)
    scores = jnp.einsum("nqc,nkc->nqk", q, k) * (c ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("nqk,nkc->nqc", probs, v).reshape(n, h, w, c)
    return x + conv2d(p["proj_out"], out)


def downsample(p: Params, x: jax.Array) -> jax.Array:
    # torch pads (left=0, right=1, top=0, bottom=1) before a stride-2 valid conv
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return conv2d(p, x, stride=2, padding="VALID")


def upsample(p: Params, x: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest ×2
    return conv2d(p, x)


# ---------------------------------------------------------------------------
# encoder / decoder / quantizer
# ---------------------------------------------------------------------------


def encoder_forward(p: Params, cfg: VQConfig, x: jax.Array) -> jax.Array:
    h = conv2d(p["conv_in"], x)
    n_levels = len(cfg.ch_mult)
    for i, level in enumerate(p["levels"]):
        for j, rp in enumerate(level["res"]):
            h = res_block(rp, h)
            if level["attn"]:
                h = attn_block(level["attn"][j], h)
        if i != n_levels - 1:
            h = downsample(level["downsample"], h)
    h = res_block(p["mid"][0], h)
    h = attn_block(p["mid"][1], h)
    h = res_block(p["mid"][2], h)
    h = conv2d(p["conv_out"], swish(group_norm(p["norm_out"], h)))
    return h


def decoder_forward(p: Params, cfg: VQConfig, z: jax.Array) -> jax.Array:
    h = conv2d(p["conv_in"], z)
    h = res_block(p["mid"][0], h)
    h = attn_block(p["mid"][1], h)
    h = res_block(p["mid"][2], h)
    n_levels = len(cfg.ch_mult)
    for idx, level in enumerate(p["levels"]):
        for j, rp in enumerate(level["res"]):
            h = res_block(rp, h)
            if level["attn"]:
                h = attn_block(level["attn"][j], h)
        if idx != n_levels - 1:
            h = upsample(level["upsample"], h)
    h = conv2d(p["conv_out"], swish(group_norm(p["norm_out"], h)))
    return h


def normalized_codebook(params: Params, cfg: VQConfig) -> jax.Array:
    cb = params["codebook"]
    if cfg.l2_norm_codebook:
        cb = cb / jnp.linalg.norm(cb, axis=-1, keepdims=True)
    return cb


def _nearest_code(params: Params, cfg: VQConfig, z: jax.Array):
    """Shared nearest-codebook core for the inference and training
    quantizers: (zn — L2-normalised encoder output, z_q_raw — looked-up
    codes, ids, d — the [N, K] distance matrix for the entropy loss)."""
    cb = normalized_codebook(params, cfg)
    zn = z
    if cfg.l2_norm_codebook:
        zn = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
    flat = zn.reshape(-1, zn.shape[-1])
    # argmin ||z - e||² = argmin (||z||² − 2 z·e + ||e||²); one MXU matmul
    dots = flat @ cb.T
    d = jnp.sum(flat * flat, axis=-1, keepdims=True) - 2 * dots + jnp.sum(
        cb * cb, axis=-1
    )
    ids = jnp.argmin(d, axis=-1)
    z_q_raw = jnp.take(cb, ids, axis=0).reshape(zn.shape)
    return zn, z_q_raw, ids, d


def quantize(params: Params, cfg: VQConfig, z: jax.Array):
    """Nearest-codebook lookup. z: [B, h, w, Cd] → (z_q, ids [B, h, w])."""
    zn, z_q_raw, ids, _ = _nearest_code(params, cfg, z)
    # straight-through: pass gradients to the (normalised) encoder output
    z_q = zn + jax.lax.stop_gradient(z_q_raw - zn)
    return z_q, ids.reshape(z.shape[:-1])


def quantize_with_losses(params: Params, cfg: VQConfig, z: jax.Array,
                         entropy_loss_ratio: float = 0.0):
    """Training-mode quantization: straight-through z_q plus the VQ-GAN
    losses (vq/codebook, β-weighted commitment, optional entropy) —
    ``VectorQuantizer.forward`` training branch + ``compute_entropy_loss``
    (vq_model.py:266-270, 450-463).  Enables from-scratch/continued VQ
    tokenizer training, a capability the reference model class carries.
    """
    zn, z_q_raw, ids, d = _nearest_code(params, cfg, z)

    vq_loss = jnp.mean((z_q_raw - jax.lax.stop_gradient(zn)) ** 2)
    commit_loss = cfg.commit_beta * jnp.mean(
        (jax.lax.stop_gradient(z_q_raw) - zn) ** 2
    )
    losses = {"vq_loss": vq_loss, "commit_loss": commit_loss}
    if entropy_loss_ratio:
        losses["entropy_loss"] = entropy_loss_ratio * entropy_loss(-d)

    z_q = zn + jax.lax.stop_gradient(z_q_raw - zn)
    return z_q, ids.reshape(z.shape[:-1]), losses


def entropy_loss(affinity: jax.Array, temperature: float = 0.01) -> jax.Array:
    """Sample-entropy minus codebook-usage entropy (vq_model.py:450-463)."""
    flat = affinity.reshape(-1, affinity.shape[-1]) / temperature
    probs = jax.nn.softmax(flat, axis=-1)
    log_probs = jax.nn.log_softmax(flat + 1e-5, axis=-1)
    avg_probs = jnp.mean(probs, axis=0)
    avg_entropy = -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-5))
    sample_entropy = -jnp.mean(jnp.sum(probs * log_probs, axis=-1))
    return sample_entropy - avg_entropy


def encode(params: Params, cfg: VQConfig, pixels: jax.Array):
    """pixels: [B, H, W, 3] in [-1, 1] → (z_q, ids [B, h, w])."""
    h = encoder_forward(params["encoder"], cfg, pixels.astype(jnp.float32))
    z = conv2d(params["quant_conv"], h)
    return quantize(params, cfg, z)


def encode_to_ids(params: Params, cfg: VQConfig, pixels: jax.Array) -> jax.Array:
    """The step-5 hot path: image → 576 flat codebook ids
    (the reference's ``encode(...)[2][2]``, ospo/wrapper/train.py:253-258)."""
    _, ids = encode(params, cfg, pixels)
    return ids.reshape(ids.shape[0], -1)


def decode(params: Params, cfg: VQConfig, z_q: jax.Array) -> jax.Array:
    z = conv2d(params["post_quant_conv"], z_q)
    return decoder_forward(params["decoder"], cfg, z)


def decode_code(params: Params, cfg: VQConfig, ids: jax.Array,
                latent_hw: Optional[Tuple[int, int]] = None) -> jax.Array:
    """Codebook ids → pixels. ids: [B, N] (N = h*w) or [B, h, w].

    Equivalent of ``VQModel.decode_code`` (vq_model.py:505-508); returns
    NHWC float images in approx. [-1, 1].
    """
    if ids.ndim == 2:
        if latent_hw is None:
            side = int(round(ids.shape[1] ** 0.5))
            latent_hw = (side, side)
        ids = ids.reshape(ids.shape[0], *latent_hw)
    cb = normalized_codebook(params, cfg)
    z_q = jnp.take(cb, ids, axis=0)  # [B, h, w, Cd]
    return decode(params, cfg, z_q)


def codebook_lookup(params: Params, cfg: VQConfig, ids: jax.Array) -> jax.Array:
    """ids → (normalised) codebook embeddings, the VQ-side lookup used by
    ``decode_code``.  (Note: Janus' ``gen_embed`` is a separate learned
    [16384, 8] table in the Janus assembly, not this codebook.)"""
    return jnp.take(normalized_codebook(params, cfg), ids, axis=0)
