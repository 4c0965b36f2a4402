"""HF Janus-Pro checkpoint → JAX param trees.

Maps the torch ``MultiModalityCausalLM`` state dict (safetensors shards) to
this framework's functional pytrees:

- per-layer Llama/ViT matrices keep their torch ``[out, in]`` layout and are
  stacked along the layer axis for the ``lax.scan`` forward (the framework's
  projection convention — transpose-free porting, copy-free layer slicing);
- conv kernels go OIHW → HWIO for the NHWC conv stacks;
- timm-ViT ``blocks.{i}`` params stack along layers; the latent
  attention-pool head (``attn_pool.*``, ~20M params) is ported when the
  checkpoint carries it — unused by Janus at runtime (the tower runs with
  ignore_head=True, janus/models/clip_encoder.py + siglip_vit.py:667) but
  kept for MAP-pool capability parity (``vit.attention_pool``).

Weight-mapping correctness for the language model is verified against
transformers in ``tests/test_llama_parity.py`` (same mapping, exported
here); the remaining mappings are verified structurally in
``tests/test_weights.py`` via shape-faithful fake checkpoints.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ospo_tpu.models import janus as janus_lib
from ospo_tpu.models import llama as llama_lib
from ospo_tpu.models import vit as vit_lib
from ospo_tpu.models import vqgan as vqgan_lib

Array = Any


# ---------------------------------------------------------------------------
# state-dict loading + key-coverage audit
# ---------------------------------------------------------------------------


class _CoverageTracker(Mapping):
    """Mapping proxy that records which state-dict keys the port READ.

    ``in``-checks do not count as consumption — only ``__getitem__``.
    Used by :func:`load_janus` to assert 100% key coverage of a
    checkpoint: every key either consumed by ``port_janus`` or in the
    explicit skip set, fail loud on any remainder (a silent leftover key
    means the port is quietly dropping weights — the exact failure mode a
    real Janus-Pro-7B port must never hit).
    """

    def __init__(self, sd: Mapping[str, np.ndarray]):
        self._sd = sd
        self.consumed: set = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return self._sd[k]

    def __contains__(self, k):
        return k in self._sd

    def __iter__(self):
        return iter(self._sd)

    def __len__(self):
        return len(self._sd)


def expected_skipped_keys(sd_keys, cfg: "janus_lib.JanusConfig") -> set:
    """Checkpoint keys the port INTENTIONALLY leaves unconsumed.

    1. ViT blocks truncated by ``select_layer`` (CLIPVisionTower keeps
       ``depth`` of ``layers`` blocks; checkpoints carry all of them —
       janus/models/clip_encoder.py select_layer semantics).
    2. Known non-parameter HF buffers (older transformers serialized
       ``rotary_emb.inv_freq`` per layer; recomputed here from
       ``rope_theta``).
    3. The torch impl's fused-attn runtime flags hold no tensors, so no
       other buffer families exist in the Janus state dict
       (janus/models/modeling_vlm.py:190-264).
    """
    skipped = set()
    for i in range(cfg.vision.depth, cfg.vision.layers):
        pre = f"vision_model.vision_tower.blocks.{i}."
        skipped |= {k for k in sd_keys if k.startswith(pre)}
    skipped |= {k for k in sd_keys if k.endswith("rotary_emb.inv_freq")}
    return skipped


def check_key_coverage(sd_keys, cfg, consumed,
                       context: str = "checkpoint") -> Dict[str, int]:
    """Assert every checkpoint key is consumed or explicitly skipped.

    Returns ``{"consumed": n, "skipped": n}`` on success; raises
    ``ValueError`` naming the leftover keys otherwise.
    """
    sd_keys = set(sd_keys)
    skipped = expected_skipped_keys(sd_keys, cfg)
    leftover = sorted(sd_keys - set(consumed) - skipped)
    if leftover:
        head = "\n  ".join(leftover[:20])
        more = f"\n  ... and {len(leftover) - 20} more" if len(leftover) > 20 else ""
        raise ValueError(
            f"key-coverage audit failed for {context}: {len(leftover)} "
            f"state-dict key(s) neither consumed by the port nor in the "
            f"explicit skip set:\n  {head}{more}\n"
            f"(consumed={len(consumed)}, skipped={len(skipped)}, "
            f"total={len(sd_keys)}) — extend port_janus or "
            f"expected_skipped_keys, never drop weights silently")
    return {"consumed": len(consumed & sd_keys), "skipped": len(skipped)}


def audit_full_index(cfg: "janus_lib.JanusConfig") -> Dict[str, int]:
    """Run the coverage audit against the FULL safetensors index of
    ``cfg`` (e.g. the real 7B) without materializing 7B of tensors: the
    key set depends only on cfg structure, so every tensor is shrunk to
    rank-preserving size ≤2 per dim and the real ``port_janus`` is run
    over the tracking mapping.  CI-runs in milliseconds at 7B scale
    (tests/test_weights_coverage.py)."""
    from ospo_tpu.models.synthetic import janus_key_shapes

    sd = {
        k: np.zeros(tuple(min(d, 2) for d in shape), np.float32)
        for k, shape, _ in janus_key_shapes(cfg)
    }
    tracker = _CoverageTracker(sd)
    port_janus(tracker, cfg)
    return check_key_coverage(sd.keys(), cfg, tracker.consumed,
                              context="full synthetic index")


def load_state_dict(model_path: str) -> Dict[str, np.ndarray]:
    """Read all ``*.safetensors`` shards (or a torch ``*.bin``) as numpy."""
    shards = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    sd: Dict[str, np.ndarray] = {}
    if shards:
        from safetensors import safe_open

        for shard in shards:
            with safe_open(shard, framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
        return sd
    bins = sorted(glob.glob(os.path.join(model_path, "pytorch_model*.bin")))
    if bins:
        import torch

        for b in bins:
            for k, v in torch.load(b, map_location="cpu", weights_only=True).items():
                sd[k] = v.float().numpy()
        return sd
    raise FileNotFoundError(f"no safetensors/bin weights under {model_path}")


def _cast(x: np.ndarray, dtype) -> Array:
    return jnp.asarray(x.astype(np.float32)).astype(dtype)


# ---------------------------------------------------------------------------
# language model
# ---------------------------------------------------------------------------


def port_llama(sd: Mapping[str, np.ndarray], cfg: llama_lib.LlamaConfig,
               prefix: str = "language_model.") -> Dict:
    n = cfg.num_layers
    dt = cfg.dtype

    def stack(fmt: str) -> Array:
        # torch [out, in] layout is kept verbatim — no transposes anywhere
        mats = [np.asarray(sd[prefix + fmt.format(i)], np.float32) for i in range(n)]
        return jnp.asarray(np.stack(mats)).astype(dt)

    return {
        "embed": _cast(np.asarray(sd[prefix + "model.embed_tokens.weight"]), dt),
        "layers": {
            "attn_norm": stack("model.layers.{}.input_layernorm.weight"),
            "wq": stack("model.layers.{}.self_attn.q_proj.weight"),
            "wk": stack("model.layers.{}.self_attn.k_proj.weight"),
            "wv": stack("model.layers.{}.self_attn.v_proj.weight"),
            "wo": stack("model.layers.{}.self_attn.o_proj.weight"),
            "mlp_norm": stack("model.layers.{}.post_attention_layernorm.weight"),
            "w_gate": stack("model.layers.{}.mlp.gate_proj.weight"),
            "w_up": stack("model.layers.{}.mlp.up_proj.weight"),
            "w_down": stack("model.layers.{}.mlp.down_proj.weight"),
        },
        "final_norm": _cast(np.asarray(sd[prefix + "model.norm.weight"]), dt),
        "lm_head": _cast(np.asarray(sd[prefix + "lm_head.weight"]), dt),
    }


# ---------------------------------------------------------------------------
# vision transformer (timm naming under vision_model.vision_tower.)
# ---------------------------------------------------------------------------


def port_vit(sd: Mapping[str, np.ndarray], cfg: vit_lib.ViTConfig,
             prefix: str = "vision_model.vision_tower.") -> Dict:
    n = cfg.depth
    dt = cfg.dtype

    def stack(fmt: str) -> Array:
        mats = [np.asarray(sd[prefix + fmt.format(i)], np.float32) for i in range(n)]
        return jnp.asarray(np.stack(mats)).astype(dt)

    patch_w = np.asarray(sd[prefix + "patch_embed.proj.weight"], np.float32)
    return {
        "patch_embed": {
            "w": _cast(patch_w.transpose(2, 3, 1, 0), dt),  # OIHW → HWIO
            "b": _cast(np.asarray(sd[prefix + "patch_embed.proj.bias"]), dt),
        },
        "pos_embed": _cast(np.asarray(sd[prefix + "pos_embed"]), dt),
        "blocks": {
            "norm1_scale": stack("blocks.{}.norm1.weight"),
            "norm1_bias": stack("blocks.{}.norm1.bias"),
            "wqkv": stack("blocks.{}.attn.qkv.weight"),
            "bqkv": stack("blocks.{}.attn.qkv.bias"),
            "wo": stack("blocks.{}.attn.proj.weight"),
            "bo": stack("blocks.{}.attn.proj.bias"),
            "norm2_scale": stack("blocks.{}.norm2.weight"),
            "norm2_bias": stack("blocks.{}.norm2.bias"),
            "w1": stack("blocks.{}.mlp.fc1.weight"),
            "b1": stack("blocks.{}.mlp.fc1.bias"),
            "w2": stack("blocks.{}.mlp.fc2.weight"),
            "b2": stack("blocks.{}.mlp.fc2.bias"),
        },
        "final_norm": {
            "scale": _cast(np.asarray(sd[prefix + "norm.weight"]), dt),
            "bias": _cast(np.asarray(sd[prefix + "norm.bias"]), dt),
        },
        **(
            {"attn_pool": _port_attn_pool(sd, prefix + "attn_pool.", dt)}
            if prefix + "attn_pool.latent" in sd else {}
        ),
    }


def _port_attn_pool(sd: Mapping[str, np.ndarray], prefix: str, dt) -> Dict:
    def lin(name):
        return {
            "w": _cast(np.asarray(sd[prefix + name + ".weight"]), dt),
            "b": _cast(np.asarray(sd[prefix + name + ".bias"]), dt),
        }

    return {
        "latent": _cast(np.asarray(sd[prefix + "latent"]), dt),
        "q": lin("q"),
        "kv": lin("kv"),
        "proj": lin("proj"),
        "norm": {
            "scale": _cast(np.asarray(sd[prefix + "norm.weight"]), dt),
            "bias": _cast(np.asarray(sd[prefix + "norm.bias"]), dt),
        },
        "fc1": lin("mlp.fc1"),
        "fc2": lin("mlp.fc2"),
    }


# ---------------------------------------------------------------------------
# VQ-GAN (vq_model.py structure under gen_vision_model.)
# ---------------------------------------------------------------------------


def _conv(sd, name: str) -> Dict:
    w = np.asarray(sd[name + ".weight"], np.float32)
    return {
        "w": jnp.asarray(w.transpose(2, 3, 1, 0)),  # OIHW → HWIO
        "b": jnp.asarray(np.asarray(sd[name + ".bias"], np.float32)),
    }


def _gn(sd, name: str) -> Dict:
    return {
        "scale": jnp.asarray(np.asarray(sd[name + ".weight"], np.float32)),
        "bias": jnp.asarray(np.asarray(sd[name + ".bias"], np.float32)),
    }


def _res(sd, name: str, has_shortcut: bool) -> Dict:
    p = {
        "norm1": _gn(sd, name + ".norm1"),
        "conv1": _conv(sd, name + ".conv1"),
        "norm2": _gn(sd, name + ".norm2"),
        "conv2": _conv(sd, name + ".conv2"),
    }
    if has_shortcut:
        p["nin_shortcut"] = _conv(sd, name + ".nin_shortcut")
    return p


def _attn(sd, name: str) -> Dict:
    return {
        "norm": _gn(sd, name + ".norm"),
        "q": _conv(sd, name + ".q"),
        "k": _conv(sd, name + ".k"),
        "v": _conv(sd, name + ".v"),
        "proj_out": _conv(sd, name + ".proj_out"),
    }


def port_vqgan(sd: Mapping[str, np.ndarray], cfg: vqgan_lib.VQConfig,
               prefix: str = "gen_vision_model.") -> Dict:
    def has(k: str) -> bool:
        return prefix + k + ".weight" in sd

    n_levels = len(cfg.ch_mult)

    # encoder
    enc: Dict = {"conv_in": _conv(sd, prefix + "encoder.conv_in")}
    levels = []
    for i in range(n_levels):
        base = f"{prefix}encoder.conv_blocks.{i}"
        level: Dict = {"res": [], "attn": []}
        for j in range(cfg.num_res_blocks):
            level["res"].append(
                _res(sd, f"{base}.res.{j}", has(f"encoder.conv_blocks.{i}.res.{j}.nin_shortcut"))
            )
            if has(f"encoder.conv_blocks.{i}.attn.{j}.q"):
                level["attn"].append(_attn(sd, f"{base}.attn.{j}"))
        if has(f"encoder.conv_blocks.{i}.downsample.conv"):
            level["downsample"] = _conv(sd, f"{base}.downsample.conv")
        levels.append(level)
    enc["levels"] = levels
    enc["mid"] = [
        _res(sd, prefix + "encoder.mid.0", has("encoder.mid.0.nin_shortcut")),
        _attn(sd, prefix + "encoder.mid.1"),
        _res(sd, prefix + "encoder.mid.2", has("encoder.mid.2.nin_shortcut")),
    ]
    enc["norm_out"] = _gn(sd, prefix + "encoder.norm_out")
    enc["conv_out"] = _conv(sd, prefix + "encoder.conv_out")

    # decoder
    dec: Dict = {"conv_in": _conv(sd, prefix + "decoder.conv_in")}
    dec["mid"] = [
        _res(sd, prefix + "decoder.mid.0", has("decoder.mid.0.nin_shortcut")),
        _attn(sd, prefix + "decoder.mid.1"),
        _res(sd, prefix + "decoder.mid.2", has("decoder.mid.2.nin_shortcut")),
    ]
    dlevels = []
    for i in range(n_levels):
        base = f"{prefix}decoder.conv_blocks.{i}"
        level = {"res": [], "attn": []}
        for j in range(cfg.num_res_blocks + 1):
            level["res"].append(
                _res(sd, f"{base}.res.{j}", has(f"decoder.conv_blocks.{i}.res.{j}.nin_shortcut"))
            )
            if has(f"decoder.conv_blocks.{i}.attn.{j}.q"):
                level["attn"].append(_attn(sd, f"{base}.attn.{j}"))
        if has(f"decoder.conv_blocks.{i}.upsample.conv"):
            level["upsample"] = _conv(sd, f"{base}.upsample.conv")
        dlevels.append(level)
    dec["levels"] = dlevels
    dec["norm_out"] = _gn(sd, prefix + "decoder.norm_out")
    dec["conv_out"] = _conv(sd, prefix + "decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "codebook": jnp.asarray(
            np.asarray(sd[prefix + "quantize.embedding.weight"], np.float32)
        ),
        "quant_conv": _conv(sd, prefix + "quant_conv"),
        "post_quant_conv": _conv(sd, prefix + "post_quant_conv"),
    }


# ---------------------------------------------------------------------------
# projectors / heads
# ---------------------------------------------------------------------------


def port_mlp_projector(sd: Mapping[str, np.ndarray], prefix: str, depth: int,
                       dtype) -> Dict:
    """``mlp_gelu`` nn.Sequential indices: Linear=0 then Linear at 2,4,...
    (GELUs in between hold no params)."""
    layers = []
    for d in range(depth):
        idx = 0 if d == 0 else 2 * d
        layers.append({
            "w": _cast(np.asarray(sd[f"{prefix}layers.{idx}.weight"]), dtype),
            "b": _cast(np.asarray(sd[f"{prefix}layers.{idx}.bias"]), dtype),
        })
    return {"layers": layers}


def port_vision_head(sd: Mapping[str, np.ndarray], prefix: str, dtype) -> Dict:
    return {
        "proj": {
            "w": _cast(np.asarray(sd[prefix + "output_mlp_projector.weight"]), dtype),
            "b": _cast(np.asarray(sd[prefix + "output_mlp_projector.bias"]), dtype),
        },
        "head": {
            "w": _cast(np.asarray(sd[prefix + "vision_head.weight"]), dtype),
            "b": _cast(np.asarray(sd[prefix + "vision_head.bias"]), dtype),
        },
    }


# ---------------------------------------------------------------------------
# full assembly
# ---------------------------------------------------------------------------


def config_from_checkpoint(model_path: str) -> janus_lib.JanusConfig:
    """Build a JanusConfig from the HF ``config.json``."""
    with open(os.path.join(model_path, "config.json")) as f:
        hf = json.load(f)
    import jax.numpy as jnp

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}.get(
        hf.get("torch_dtype"), jnp.bfloat16)
    lc = hf.get("language_config", {})
    lang = llama_lib.LlamaConfig(
        vocab_size=lc.get("vocab_size", 102400),
        hidden_size=lc.get("hidden_size", 4096),
        intermediate_size=lc.get("intermediate_size", 11008),
        num_layers=lc.get("num_hidden_layers", 30),
        num_heads=lc.get("num_attention_heads", 32),
        num_kv_heads=lc.get("num_key_value_heads"),
        rope_theta=lc.get("rope_theta", 10000.0),
        rms_norm_eps=lc.get("rms_norm_eps", 1e-6),
        max_seq_len=lc.get("max_position_embeddings", 4096),
        dtype=dtype,
    )
    vp = hf.get("vision_config", {}).get("params", {})
    model_name = vp.get("model_name", "siglip_large_patch16_384")
    presets = {
        "siglip_large_patch16_384": vit_lib.SIGLIP_LARGE_384,
        "siglip_so400m_patch14_384": vit_lib.SIGLIP_SO400M_384,
    }
    base_vit = presets.get(model_name, vit_lib.SIGLIP_LARGE_384)
    import dataclasses as dc

    # explicit shape params (synthetic/test checkpoints self-describe
    # beyond the reference's model_name registry) win over the preset
    vision = dc.replace(
        base_vit,
        image_size=vp.get("image_size", 384),
        select_layer=vp.get("select_layer", base_vit.select_layer),
        **{k: vp[k] for k in ("width", "layers", "heads", "patch_size",
                              "mlp_ratio") if k in vp},
    )
    gvp = hf.get("gen_vision_config", {}).get("params", {})
    vqp = gvp.get("vq")
    if vqp:
        vq = vqgan_lib.VQConfig(
            codebook_size=vqp.get("codebook_size", 16384),
            codebook_dim=vqp.get("codebook_dim", 8),
            base_ch=vqp.get("base_ch", 128),
            ch_mult=tuple(vqp.get("ch_mult", (1, 1, 2, 2, 4))),
            num_res_blocks=vqp.get("num_res_blocks", 2),
            z_channels=vqp.get("z_channels", 256),
        )
    else:
        vq = vqgan_lib.VQ_16
    ap = hf.get("aligner_config", {}).get("params", {})
    gap = hf.get("gen_aligner_config", {}).get("params", {})
    return janus_lib.JanusConfig(
        language=lang,
        vision=dc.replace(vision, dtype=dtype),
        vq=vq,
        gen_embed_dim=gvp.get("n_embed", 8),
        image_token_size=gvp.get("image_token_size", 16384),
        gen_image_size=gvp.get("image_size", 384),
        aligner_depth=ap.get("depth", 2),
        gen_aligner_depth=gap.get("depth", 2),
        dtype=dtype,
    )


def port_janus(sd: Mapping[str, np.ndarray], cfg: janus_lib.JanusConfig) -> Dict:
    dt = cfg.dtype
    return {
        "language_model": port_llama(sd, cfg.language),
        "vision_model": port_vit(sd, cfg.vision),
        "gen_vision_model": port_vqgan(sd, cfg.vq),
        "aligner": port_mlp_projector(sd, "aligner.", cfg.aligner_depth, dt),
        "gen_aligner": port_mlp_projector(sd, "gen_aligner.", cfg.gen_aligner_depth, dt),
        "gen_head": port_vision_head(sd, "gen_head.", dt),
        "gen_embed": _cast(np.asarray(sd["gen_embed.weight"]), dt),
    }


def load_janus(model_path: str,
               cfg: Optional[janus_lib.JanusConfig] = None,
               use_cache: bool = True) -> "janus_lib.JanusModel":
    """Load a Janus checkpoint, caching the ported pytree next to the HF
    files (``ported_params.npz``) so subsequent loads skip the torch-layout
    mapping and shard parsing."""
    if cfg is None:
        cfg = config_from_checkpoint(model_path)
    cache_path = os.path.join(model_path, "ported_params.npz")
    if use_cache and os.path.isfile(cache_path):
        print(f"# Loading ported param cache {cache_path}")
        return janus_lib.JanusModel(cfg, _load_param_cache(cache_path))
    sd = load_state_dict(model_path)
    tracker = _CoverageTracker(sd)
    params = port_janus(tracker, cfg)
    cov = check_key_coverage(sd.keys(), cfg, tracker.consumed,
                             context=model_path)
    print(f"# key coverage: {cov['consumed']} consumed, "
          f"{cov['skipped']} skipped, 0 dropped")
    if use_cache and jax.process_index() == 0:
        # process 0 only (N processes porting the same checkpoint would
        # interleave writes into one zip)
        try:
            _save_param_cache(cache_path, params)
        except OSError as e:  # read-only checkpoint dirs are fine
            print(f"# (ported-param cache not written: {e})")
    return janus_lib.JanusModel(cfg, params)


def _save_param_cache(path: str, params) -> None:
    """Flat-npz param cache; bf16 leaves are stored bit-cast to uint16
    (np.save can't serialise ml_dtypes without pickle)."""
    import jax
    import ml_dtypes

    from ospo_tpu.train.checkpoint import _flatten

    flat = {}
    for k, v in _flatten(jax.device_get(params)).items():
        if v.dtype == ml_dtypes.bfloat16:
            flat[k + "#bf16"] = v.view(np.uint16)
        else:
            flat[k] = v
    # atomic publish: a reader (or the isfile check) must never see a
    # half-written zip — an interrupted multi-minute 7B cache write would
    # otherwise poison every later load with BadZipFile until hand-deleted
    tmp = f"{path}.tmp{os.getpid()}.npz"  # .npz: np.savez appends it anyway
    try:
        np.savez(tmp, **flat)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def _load_param_cache(path: str):
    import ml_dtypes

    from ospo_tpu.train.checkpoint import _unflatten

    with np.load(path) as data:
        flat = {}
        for k in data.files:
            if k.endswith("#bf16"):
                flat[k[:-5]] = data[k].view(ml_dtypes.bfloat16)
            else:
                flat[k] = data[k]
    import jax

    return jax.tree.map(jnp.asarray, _unflatten(flat))
