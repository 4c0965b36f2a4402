"""MLP projectors and the image-token logit head.

Functional equivalents of ``janus/models/projector.py:27-86`` (``mlp_gelu``
projector — the type Janus-Pro uses for both ``aligner`` and
``gen_aligner``) and ``vision_head`` (``modeling_vlm.py:36-51``:
Linear → GELU → Linear over n_embed → image_token_embed → image_token_size).
GELU is exact (erf), matching torch ``nn.GELU`` defaults.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _linear_init(key, cin, cout, dtype):
    std = 0.02
    # torch layout [out, in] — transpose-free porting + copy-free slicing
    return {
        "w": (jax.random.normal(key, (cout, cin), jnp.float32) * std).astype(dtype),
        "b": jnp.zeros((cout,), dtype),
    }


def _linear(p: Params, x: jax.Array) -> jax.Array:
    w = p["w"]
    if isinstance(w, dict):  # weight-only int8 ({"q", "s"}, ops/quant.py)
        y = jnp.einsum("...d,fd->...f", x, w["q"].astype(x.dtype))
        y = y * w["s"].astype(x.dtype)
    else:
        y = jnp.einsum("...d,fd->...f", x, w)
    return y + p["b"]


def _gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


def init_mlp_projector(key, input_dim: int, n_embed: int, depth: int = 2,
                       dtype=jnp.bfloat16) -> Params:
    """``mlp_gelu`` projector: Linear(input→n_embed) then (depth−1)×
    [GELU, Linear(n_embed→n_embed)]."""
    keys = jax.random.split(key, depth)
    layers: List[Params] = [_linear_init(keys[0], input_dim, n_embed, dtype)]
    for i in range(1, depth):
        layers.append(_linear_init(keys[i], n_embed, n_embed, dtype))
    return {"layers": layers}


def mlp_projector(params: Params, x: jax.Array) -> jax.Array:
    layers = params["layers"]
    x = _linear(layers[0], x)
    for lp in layers[1:]:
        x = _linear(lp, _gelu(x))
    return x


def init_projector(key, input_dim: int, n_embed: int, depth: int = 2,
                   projector_type: str = "mlp_gelu",
                   dtype=jnp.bfloat16) -> Params:
    """All four reference projector types (janus/models/projector.py:33-59):
    ``identity`` | ``linear`` | ``mlp_gelu`` | ``low_high_hybrid_split_mlp_gelu``
    (the hybrid type takes a (high_res, low_res) feature pair, projects each
    to n_embed/2, concatenates, then runs the (depth−1)-layer GELU MLP).
    Janus-Pro checkpoints use ``mlp_gelu``; the others are config-selectable
    for parity.  The type is static (pass it to :func:`projector` too) —
    param trees stay pure array pytrees."""
    if projector_type == "identity":
        return {"layers": []}
    if projector_type == "linear":
        return {"layers": [_linear_init(key, input_dim, n_embed, dtype)]}
    if projector_type == "mlp_gelu":
        return init_mlp_projector(key, input_dim, n_embed, depth, dtype)
    if projector_type == "low_high_hybrid_split_mlp_gelu":
        kh, kl, *keys = jax.random.split(key, depth + 1)
        return {
            "high_up": _linear_init(kh, input_dim, n_embed // 2, dtype),
            "low_up": _linear_init(kl, input_dim, n_embed // 2, dtype),
            "layers": [
                _linear_init(keys[i], n_embed, n_embed, dtype)
                for i in range(depth - 1)
            ],
        }
    raise ValueError(f"Unknown projector type: {projector_type}")


def projector(params: Params, x,
              projector_type: str = "mlp_gelu") -> jax.Array:
    """Apply an ``init_projector`` projector; ``x`` is a feature array, or a
    (high_res, low_res) tuple for the hybrid type (projector.py:78-87)."""
    if projector_type == "low_high_hybrid_split_mlp_gelu":
        high, low = x
        x = jnp.concatenate(
            [_linear(params["high_up"], high), _linear(params["low_up"], low)],
            axis=-1)
        for lp in params["layers"]:
            x = _linear(lp, _gelu(x))
        return x
    if projector_type == "identity":
        return x
    if projector_type == "linear":
        return _linear(params["layers"][0], x)
    return mlp_projector(params, x)


def init_vision_head(key, n_embed: int, image_token_embed: int,
                     image_token_size: int, dtype=jnp.bfloat16) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "proj": _linear_init(k1, n_embed, image_token_embed, dtype),
        "head": _linear_init(k2, image_token_embed, image_token_size, dtype),
    }


def vision_head(params: Params, x: jax.Array) -> jax.Array:
    """Hidden states → image-token logits (fp32)."""
    x = _gelu(_linear(params["proj"], x))
    return _linear(params["head"], x).astype(jnp.float32)
