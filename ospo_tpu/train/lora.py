"""LoRA adapters for the Llama trunk — functional, stacked per layer.

Replaces peft (``ospo/utils/model.py:43-89``): adapters live in their own
pytree ``{proj: {"a": [L, d_in, r], "b": [L, r, d_out]}}`` whose leaves are
scanned alongside the base layer stack (see ``llama.forward``'s ``lora``
argument).  ``merge`` folds ``scaling·A@B`` into the base weights — the
equivalent of peft's ``merge_and_unload`` used for round-2 generation.

peft-compatible defaults: A ~ kaiming-uniform, B = 0, scaling = α/r.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ospo_tpu.models.llama import LlamaConfig

# projection name → (base param key, output-width fn)
_PROJ_TO_PARAM = {
    "q_proj": "wq",
    "k_proj": "wk",
    "v_proj": "wv",
    "o_proj": "wo",
    "gate_proj": "w_gate",
    "up_proj": "w_up",
    "down_proj": "w_down",
}

DEFAULT_TARGETS = tuple(_PROJ_TO_PARAM)


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    rank: int = 32
    alpha: int = 64
    dropout: float = 0.05
    target_modules: Tuple[str, ...] = DEFAULT_TARGETS

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank

    def to_dict(self) -> dict:
        return {
            "lora_rank": self.rank,
            "lora_alpha": self.alpha,
            "lora_dropout": self.dropout,
            "target_modules": list(self.target_modules),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "LoraConfig":
        return cls(
            rank=int(d.get("lora_rank", 32)),
            alpha=int(d.get("lora_alpha", 64)),
            dropout=float(d.get("lora_dropout", 0.05)),
            target_modules=tuple(d.get("target_modules", DEFAULT_TARGETS)),
        )


def init_lora(cfg: LlamaConfig, lora_cfg: LoraConfig, key: jax.Array) -> Dict:
    """Zero-effect init: A kaiming-uniform, B zeros (peft defaults)."""
    n, d = cfg.num_layers, cfg.hidden_size
    h, kvh, dh, inter = cfg.num_heads, cfg.kv_heads, cfg.dim_head, cfg.intermediate_size
    widths = {
        "q_proj": (d, h * dh),
        "k_proj": (d, kvh * dh),
        "v_proj": (d, kvh * dh),
        "o_proj": (h * dh, d),
        "gate_proj": (d, inter),
        "up_proj": (d, inter),
        "down_proj": (inter, d),
    }
    r = lora_cfg.rank
    tree: Dict = {}
    keys = jax.random.split(key, len(lora_cfg.target_modules))
    for k, name in zip(keys, lora_cfg.target_modules):
        d_in, d_out = widths[name]
        # peft: kaiming_uniform_(a=√5) on A[r, d_in] → gain √(1/3), bound
        # = gain·√(3/fan_in) = 1/√d_in.  (√(3/d_in) — plain He-uniform —
        # is √3 too wide: grad_B ∝ A@x, so early adapter learning would
        # run ~1.73× hotter than the reference trainer's.)
        bound = (1.0 / d_in) ** 0.5
        tree[name] = {
            "a": jax.random.uniform(k, (n, d_in, r), jnp.float32, -bound, bound),
            "b": jnp.zeros((n, r, d_out), jnp.float32),
        }
    return tree


def merge(base_llama_params: Dict, lora_tree: Dict, scaling: float) -> Dict:
    """Fold adapters into the stacked base weights (merge_and_unload).

    CONSUMES the base projection matrices: one donated jit per stacked
    matrix, dropping each original before merging the next (the
    ``ops/quant.quantize_llama_params_incremental`` pattern).  A
    whole-trunk eager merge would co-reside the old and new trunks plus
    multi-GB fp32 temps — well past 15.75 GB at 7B on a backend that
    ignores donation (the round-2 ``ckpt_path`` porting path runs with
    the bf16 trunk already device-resident)."""
    layers = dict(base_llama_params["layers"])

    def merge_one(w, a, b):
        # torch layout w: [L, d_out, d_in]; fp32 accumulate, cast back
        delta = jnp.einsum("ndr,nrf->nfd", a, b,
                           preferred_element_type=jnp.float32) * scaling
        return (w.astype(jnp.float32) + delta).astype(w.dtype)

    merge_jit = jax.jit(merge_one, donate_argnums=0)
    for name, ab in lora_tree.items():
        pkey = _PROJ_TO_PARAM[name]
        w = layers[pkey]
        layers[pkey] = jax.block_until_ready(
            merge_jit(w, jnp.asarray(ab["a"]), jnp.asarray(ab["b"])))
        if isinstance(w, jax.Array):
            w.delete()  # donation alone is ignored on some backends
    out = dict(base_llama_params)
    out["layers"] = layers
    return out


def merge_into_janus(janus_params: Dict, lora_tree: Dict, scaling: float) -> Dict:
    out = dict(janus_params)
    out["language_model"] = merge(janus_params["language_model"], lora_tree, scaling)
    return out


def num_params(lora_tree: Dict) -> int:
    return sum(x.size for x in jax.tree.leaves(lora_tree))
