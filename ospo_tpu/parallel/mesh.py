"""GSPMD mesh + sharding rules — the framework's entire parallelism layer.

The reference's only strategy is DDP over NCCL (SURVEY §2.5).  Here a single
``Mesh(('data', 'model'))`` over the ICI provides:

- **DP**: batches sharded on ``data`` (every engine/train batch dim);
- **TP**: the 7B Llama weights sharded on ``model`` with Megatron-style
  column/row rules (qkv/gate/up column-parallel, o/down row-parallel,
  embedding and lm/gen heads vocab-parallel) — XLA inserts the
  all-reduce/all-gather collectives over ICI;
- LoRA adapters follow their base projection's sharding (A replicated,
  B column-sharded), so SimPO training runs dp×tp with zero code changes
  in the train step.

ViT/VQ-GAN params are replicated (≲400M combined — cheaper to replicate
than to shard their conv stacks).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    n_devices: Optional[int] = None,
    model_parallel: Optional[int] = None,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh.  ``model_parallel`` defaults to 1 (pure
    DP) — raise it when per-chip HBM demands sharded weights."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    mp = model_parallel or 1
    assert n_devices % mp == 0, (n_devices, mp)
    grid = devices.reshape(n_devices // mp, mp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


# ---------------------------------------------------------------------------
# sharding rules
# ---------------------------------------------------------------------------


def llama_param_specs() -> Dict[str, Any]:
    """PartitionSpecs for the stacked Llama tree (layer axis first).

    Projections are torch-layout ``[L, out, in]``: column-parallel matrices
    (qkv/gate/up) shard the *out* dim (1); row-parallel (o/down) shard the
    *in* dim (2)."""
    return {
        "embed": P(MODEL_AXIS, None),           # vocab-parallel embedding
        "layers": {
            "attn_norm": P(None, None),
            "wq": P(None, MODEL_AXIS, None),    # column parallel (heads)
            "wk": P(None, MODEL_AXIS, None),
            "wv": P(None, MODEL_AXIS, None),
            "wo": P(None, None, MODEL_AXIS),    # row parallel
            "mlp_norm": P(None, None),
            "w_gate": P(None, MODEL_AXIS, None),
            "w_up": P(None, MODEL_AXIS, None),
            "w_down": P(None, None, MODEL_AXIS),
        },
        "final_norm": P(None),
        "lm_head": P(MODEL_AXIS, None),         # vocab-parallel head
    }


def lora_param_specs(lora_tree: Dict) -> Dict[str, Any]:
    """A replicated, B sharded like its base projection's output dim."""
    col = {"q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"}
    specs: Dict[str, Any] = {}
    for name in lora_tree:
        if name in col:
            specs[name] = {"a": P(None, None, None), "b": P(None, None, MODEL_AXIS)}
        else:  # o_proj / down_proj: row-parallel base → A input-sharded
            specs[name] = {"a": P(None, MODEL_AXIS, None), "b": P(None, None, None)}
    return specs


def _replicated_like(tree: Any) -> Any:
    return jax.tree.map(lambda _: P(), tree)


def _module_specs(key: str, subtree: Any) -> Any:
    """Sharding rules for one top-level Janus submodule (the freeze-matrix
    granularity, ospo/wrapper/train.py:148-216)."""
    if key == "language_model":
        return llama_param_specs()
    if key == "gen_head":
        # gen_head's wide output layer is the other big matrix worth sharding
        return {
            "proj": {"w": P(None, None), "b": P(None)},
            "head": {"w": P(MODEL_AXIS, None), "b": P(MODEL_AXIS)},  # [out, in]
        }
    return _replicated_like(subtree)


def _align_quant_specs(params: Any, specs: Any) -> Any:
    """Expand matrix PartitionSpecs over quantized weight leaves.

    ``quantize_llama_params`` replaces a projection array with a dict
    ``{"q"|"q4": [...], "s": [...]}`` (ops/quant.py) — the spec tree,
    built from names alone, still holds one P for that node.  Align them:
    ``q`` keeps the matrix spec (int8 preserves the shape), ``s`` drops
    the trailing in-axis (scales are per-output-row).  int4 caveat: byte
    packing pairs original row r with row r+F/2 into packed row r, so an
    out-axis shard of ``q4`` holds rows [k·F/2m, (k+1)·F/2m) ∪ the same
    window shifted by F/2 while the contiguous ``s`` shard does NOT —
    the ``s[..., :f2]`` / ``s[..., f2:]`` slices in
    ``quantized_matmul_int4`` make GSPMD reshard the (tiny, per-row)
    scales inside the decode scan.  Correct but not collective-free; a
    plane-major ``[..., 2, F/2]`` scale layout would align it if int4+TP
    ever becomes a production path (int4 weights are quality-gated
    today)."""
    if isinstance(params, dict):
        if set(params) == {"q4", "gs"} and isinstance(specs, P):
            # group-wise int4: gs is [..., F, G=D/group].  Keep the lead +
            # out-dim sharding, REPLICATE the group axis (it can be tiny —
            # G=1 on test shapes — and even at 7B an in-dim shard would
            # need group-aligned splits); in-dim-sharded q4 then makes
            # GSPMD reshard the (tiny) scales, the same correct-but-not-
            # collective-free story as per-row int4's "s" below.
            return {"q4": specs,
                    "gs": P(*tuple(specs)[: params["gs"].ndim - 1], None)}
        if set(params) == {"q", "sa"} and isinstance(specs, P):
            # W8A8: identical layout to {"q", "s"} — only the matmul
            # dispatch differs (activation quantization is per-token,
            # computed inside the program; nothing extra to shard)
            return {"q": specs, "sa": P(*tuple(specs)[: params["sa"].ndim])}
        qkey = "q" if set(params) == {"q", "s"} else (
            "q4" if set(params) == {"q4", "s"} else None)
        if qkey is not None and isinstance(specs, P):
            return {qkey: specs, "s": P(*tuple(specs)[: params["s"].ndim])}
        if isinstance(specs, dict):
            return {k: _align_quant_specs(params[k], specs.get(k, P()))
                    for k in params}
    return specs


def janus_param_specs(params: Dict) -> Dict[str, Any]:
    specs = {k: _module_specs(k, v) for k, v in params.items()}
    specs = _align_quant_specs(params, specs)
    # drop_lm_head replaces the head with a (1, 1) stub (model_factory) —
    # the vocab-parallel spec cannot divide it; replicate the stub
    lm = params.get("language_model")
    if isinstance(lm, dict) and getattr(lm.get("lm_head"), "shape", None) \
            == (1, 1):
        specs["language_model"]["lm_head"] = P(None, None)
    return specs


def _put(x, sharding: NamedSharding):
    """device_put that also accepts COMMITTED device arrays headed for a
    cross-process (non-addressable) sharding: jax only allows host values
    and uncommitted arrays there, so committed leaves (e.g. the factory's
    post-load quantize jit outputs) take a host round-trip — every
    process holds the identical value, which is exactly the multi-process
    device_put contract."""
    if (isinstance(x, jax.Array) and getattr(x, "committed", False)
            and not sharding.is_fully_addressable):
        x = np.asarray(x)
    return jax.device_put(x, sharding)


def shard_janus_params(params: Dict, mesh: Mesh) -> Dict:
    """device_put the full Janus tree with TP rules over ``mesh``."""
    specs = janus_param_specs(params)
    return jax.tree.map(
        lambda x, s: _put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_trainable_params(trainable: Dict, mesh: Mesh) -> Dict:
    """Shard a full-finetune trainable subtree (top-level Janus submodule
    keys, the freeze-matrix granularity) with the same TP rules the full
    tree gets — gradients and AdamW moments then inherit the layouts via
    GSPMD propagation, so sharded full finetune needs no train-step changes."""
    specs = _align_quant_specs(
        trainable, {k: _module_specs(k, v) for k, v in trainable.items()})
    return jax.tree.map(
        lambda x, s: _put(x, NamedSharding(mesh, s)), trainable, specs
    )


def shard_lora_params(lora_tree: Dict, mesh: Mesh) -> Dict:
    specs = lora_param_specs(lora_tree)
    return jax.tree.map(
        lambda x, s: _put(x, NamedSharding(mesh, s)), lora_tree, specs
    )


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard leading batch dims across the data axis."""

    def put(x):
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1))) if x.ndim else P()
        return _put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def data_parallel_size(mesh: Optional[Mesh]) -> int:
    return int(mesh.shape[DATA_AXIS]) if mesh is not None else 1


def shard_on_axis(x, mesh: Mesh, axis: int = 0):
    """device_put one array sharded across ``data`` on the given axis
    (engines' host-built batches; the batch dim is not always leading —
    scoring suffixes are [Q, N, T] with the image batch on axis 1)."""
    spec = [None] * x.ndim
    spec[axis] = DATA_AXIS
    return _put(x, NamedSharding(mesh, P(*spec)))


def replicate(x, mesh: Mesh):
    """device_put fully replicated (rng keys, scalars)."""
    return _put(x, NamedSharding(mesh, P()))
