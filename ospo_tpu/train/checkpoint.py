"""Checkpointing: LoRA adapters + optimizer state + run config.

Layout (one directory per saved step, ``.../step_000123/``):
  lora.npz     — flattened adapter pytree (path-keyed arrays)
  opt.npz      — optimizer state (same encoding), optional
  meta.json    — {step, lora config, scaling}
  config.yaml  — run config (written once at train start, like save_config)

Downstream generation steps consume a checkpoint via
:func:`merge_lora_checkpoint`, the equivalent of the reference's
``get_lora_config`` + ``load_from_checkpoint`` + ``merge_and_unload``
(ospo/utils/model.py:74-89, ospo/step1.py:198-210).

The flat-npz encoding keeps checkpoints single-file, host-portable and
free of framework pickle formats; Orbax is intentionally not required for
adapter-sized state.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ospo_tpu.train import lora as lora_lib


# ---------------------------------------------------------------------------
# pytree <-> flat npz
# ---------------------------------------------------------------------------


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        if not tree and prefix:
            # empty containers must round-trip: the VQ-GAN levels carry
            # 'attn': [] entries whose ABSENCE after a reload crashes
            # encoder/decoder_forward (KeyError 'attn')
            out[prefix + "__empty_dict__"] = np.zeros((), np.int8)
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        if not tree and prefix:
            out[prefix + "__empty_list__"] = np.zeros((), np.int8)
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}[{i}]/"))
    elif tree is None:
        pass
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict = {}
    for path, value in flat.items():
        keys = path.split("/")
        node = root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        if "__empty_list__" in node:
            return []
        if "__empty_dict__" in node:
            return {}
        if node and all(re.fullmatch(r"\[\d+\]", k) for k in node):
            # list nodes may have gaps (children with no leaves, e.g. optax
            # EmptyState) — keep present indices in numeric order
            idx = sorted(int(k[1:-1]) for k in node)
            return [listify(node[f"[{i}]"]) for i in idx]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def apply_flat(tree: Any, flat: Dict[str, np.ndarray], prefix: str = "") -> Any:
    """Return ``tree`` with every leaf whose path appears in ``flat``
    replaced by the stored value (structure- and order-safe restore)."""
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: apply_flat(v, flat, f"{prefix}{k}/") for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        items = [apply_flat(v, flat, f"{prefix}[{i}]/") for i, v in enumerate(tree)]
        if isinstance(tree, tuple) and hasattr(tree, "_fields"):  # NamedTuple
            return type(tree)(*items)
        return type(tree)(items)
    if tree is None:
        return None
    key = prefix[:-1]
    if key in flat:
        return jnp.asarray(flat[key]).astype(tree.dtype) if hasattr(
            tree, "dtype") else flat[key]
    return tree


def save_tree(path: str, tree: Any) -> None:
    np.savez(path, **_flatten(jax.device_get(tree)))


def load_tree(path: str) -> Any:
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


def load_flat(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


# ---------------------------------------------------------------------------
# checkpoint directory API
# ---------------------------------------------------------------------------


def save_checkpoint(
    ckpt_dir: str,
    step: int,
    trainable_tree: Any,
    lora_cfg: lora_lib.LoraConfig,
    opt_state: Any = None,
    mode: str = "lora",
) -> str:
    path = os.path.join(ckpt_dir, f"step_{step:06d}")
    os.makedirs(path, exist_ok=True)
    save_tree(os.path.join(path, "lora.npz"), trainable_tree)
    if opt_state is not None:
        save_tree(os.path.join(path, "opt.npz"), opt_state)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"step": step, "mode": mode, "lora": lora_cfg.to_dict(),
                   "scaling": lora_cfg.scaling}, f, indent=2)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(ckpt_dir, steps[-1]) if steps else None


def resolve_checkpoint_dir(path: str) -> str:
    """``path`` may be a step directory or a parent dir → the concrete
    step directory.  Resolve ONCE and pass the result to both
    :func:`load_checkpoint` and :func:`checkpoint_mode` — resolving
    independently races a live trainer writing new step_* dirs (tree
    from one step, mode from another)."""
    if not os.path.isfile(os.path.join(path, "meta.json")):
        latest = latest_checkpoint(path)
        if latest is None:
            raise FileNotFoundError(f"no checkpoint under {path}")
        return latest
    return path


def load_checkpoint(path: str) -> Tuple[Any, lora_lib.LoraConfig, int, Any]:
    """→ (lora_tree, lora_cfg, step, opt_state|None). ``path`` may be a
    step directory or a parent dir (latest step used)."""
    path = resolve_checkpoint_dir(path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    lora_tree = load_tree(os.path.join(path, "lora.npz"))
    opt_path = os.path.join(path, "opt.npz")
    # opt state is returned as a flat path→array dict; restore with apply_flat
    opt_flat = load_flat(opt_path) if os.path.isfile(opt_path) else None
    return (
        lora_tree,
        lora_lib.LoraConfig.from_dict(meta.get("lora", {})),
        int(meta.get("step", 0)),
        opt_flat,
    )


def checkpoint_mode(path: str) -> str:
    if not os.path.isfile(os.path.join(path, "meta.json")):
        latest = latest_checkpoint(path)
        if latest:
            path = latest
    try:
        with open(os.path.join(path, "meta.json")) as f:
            return json.load(f).get("mode", "lora")
    except FileNotFoundError:
        return "lora"


def merge_lora_checkpoint(model, ckpt_path: str):
    """Fold a trained checkpoint into the base model for generation
    (round-2 self-improvement entry point).  LoRA checkpoints merge the
    adapters (peft merge_and_unload); full-finetune checkpoints replace
    the trained submodules."""
    import jax.numpy as jnp

    from ospo_tpu.models.janus import JanusModel

    ckpt_path = resolve_checkpoint_dir(ckpt_path)  # one step dir for both
    tree, lora_cfg, _, _ = load_checkpoint(ckpt_path)
    if checkpoint_mode(ckpt_path) == "full":
        params = dict(model.params)
        for name, sub in tree.items():
            ref = params[name]
            params[name] = jax.tree.map(
                lambda saved, cur: jnp.asarray(saved).astype(cur.dtype), sub, ref
            )
        return JanusModel(model.cfg, params)
    merged = lora_lib.merge_into_janus(model.params, tree, lora_cfg.scaling)
    return JanusModel(model.cfg, merged)
