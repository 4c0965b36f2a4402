"""Model/tokenizer/processor factory for pipeline steps.

Equivalent of ``get_model`` (``ospo/utils/model.py:13-71``): resolve the
model from config and return (model, tokenizer, processor).  Resolution
order:

1. ``config.model_path`` contains a Janus-Pro HF checkpoint → load real
   weights + tokenizer (+ optional sharding over the current mesh);
2. otherwise → random-init the requested preset (``config.model_preset``:
   ``tiny`` (default, CI/tests), ``1b``, ``7b``) with the byte tokenizer.

A ``ckpt_path`` pointing at a LoRA checkpoint is merged into the base
weights before generation steps (round-2 self-improvement), mirroring
``get_peft_model → load_from_checkpoint → merge_and_unload``
(ospo/step1.py:198-210 etc.).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

from ospo_tpu.image_processing import load_image_processor
from ospo_tpu.models import janus as janus_lib
from ospo_tpu.processing import Processor
from ospo_tpu.tokenizer import load_tokenizer

PRESETS = {
    "7b": janus_lib.JANUS_PRO_7B,
    "1b": janus_lib.JANUS_PRO_1B,
}


def has_weights(model_path: Optional[str]) -> bool:
    if not model_path or not os.path.isdir(model_path):
        return False
    import glob

    return bool(
        glob.glob(os.path.join(model_path, "*.safetensors"))
        or glob.glob(os.path.join(model_path, "pytorch_model*.bin"))
    )


def build_model(config, quantize=False) -> janus_lib.JanusModel:
    """Fail-fast resolution: a set ``model_path`` MUST contain weights (a
    typo'd path must never silently degrade to a random-init model), and
    random-init runs must opt in with an explicit ``model_preset``.

    ``quantize`` (random-init path only) fuses trunk quantization into
    the init program (``JanusModel.init(quantize=)``): the bf16 stacks
    never co-reside with their quantized replacements.  The post-build
    incremental pass peaks at full-bf16-model + one matrix's quantize
    temps, which the 4-bit modes' extra pack temps push past a 16 GB
    chip at 7B (observed: the int4g weight gate OOMed where int8/w8a8
    squeaked by)."""
    model_path = config.get("model_path") if hasattr(config, "get") else None
    if model_path:
        if not has_weights(model_path):
            raise FileNotFoundError(
                f"model_path={model_path!r} contains no *.safetensors / "
                "pytorch_model*.bin. Refusing to substitute a random-init "
                "model for a requested checkpoint — fix the path, or unset "
                "model_path and set model_preset: <tiny|1b|7b> to opt in to "
                "an explicit random-init run."
            )
        print(f"# Loading Janus-Pro weights from {model_path}")
        return janus_lib.JanusModel.from_pretrained(model_path)

    preset = config.get("model_preset") if hasattr(config, "get") else None
    if not preset:
        raise ValueError(
            "Neither model_path nor model_preset is set. Set model_path to "
            "a Janus-Pro checkpoint, or model_preset: <tiny|1b|7b> for an "
            "explicit random-init run."
        )
    seed = config.get("seed") if hasattr(config, "get") else 42
    if isinstance(seed, (list, tuple)):  # inference configs carry seed lists
        seed = seed[0] if seed else None
    seed = 42 if seed is None else int(seed)  # seed: 0 is a real seed
    if preset in PRESETS:
        print(f"# Random-init preset '{preset}' (explicit model_preset).")
        cfg = PRESETS[preset]
    elif preset == "tiny":
        print("# Random-init tiny model (explicit model_preset).")
        cfg = janus_lib.tiny_janus_config()
    else:
        raise ValueError(f"unknown model_preset {preset!r} "
                         f"(expected tiny | {' | '.join(PRESETS)})")
    return janus_lib.JanusModel.init(cfg, seed=seed, quantize=quantize)


def _validate_quantize_mode(config) -> str:
    """Reject unknown ``quantize`` spellings BEFORE the (minutes-long at
    7B) model build: a typo would otherwise silently serve an
    unquantized bf16 trunk that OOMs — or quietly changes numerics — at
    the int8-tuned batch sizes."""
    qmode = (str(config.get("quantize") or "")).lower()
    if qmode not in ("", "none", "false", "bf16", "int8", "w8a8", "int4",
                     "int4g", "int4n"):
        raise ValueError(
            f"unrecognized quantize value {config.get('quantize')!r}: "
            "use int8, w8a8, int4, int4g, int4n, or unset/none/bf16")
    return qmode


def get_model(config) -> Tuple[janus_lib.JanusModel, object, Processor]:
    """→ (JanusModel, tokenizer, Processor)."""
    # validate BEFORE the expensive build; the result is reused below
    qmode = _validate_quantize_mode(config)
    want_quant = qmode in ("int8", "w8a8", "int4", "int4g", "int4n")
    # random-init + quantize + no LoRA merge → fuse quantization into the
    # init program (values identical to quantize-after-init: same traced
    # init followed by the same quantize fn, one program)
    fused_quant = (want_quant and not config.get("model_path")
                   and not config.get("ckpt_path"))
    if fused_quant:
        print(f"# Quantizing language-model weights to {qmode} "
              "(fused into the init program).")
    model = build_model(config, quantize=qmode if fused_quant else False)
    model_path = config.get("model_path")
    # tokenizer_path: an explicit tokenizer.json used WITHOUT checkpoint
    # weights — random-init runs at real BPE sequence lengths (the local
    # BPE from scripts/train_bpe.py; ids stay < every preset's vocab)
    tok_src = config.get("tokenizer_path") or (
        model_path if has_weights(model_path) else None)
    tokenizer = load_tokenizer(
        tok_src, vocab_size=model.cfg.language.vocab_size,
    )
    if config.get("tokenizer_path"):
        # an explicit tokenizer larger than the model's vocab would emit
        # out-of-range ids that jnp gather CLAMPS — silent garbage
        # generation (e.g. the local BPE's 4096 ids into the tiny
        # preset's 512-vocab).  Fail loudly like the missing-tokenizer
        # path (ADVICE r4).
        tok_vocab = getattr(tokenizer, "vocab_size", None)
        if tok_vocab and tok_vocab > model.cfg.language.vocab_size:
            raise ValueError(
                f"tokenizer_path vocab ({tok_vocab}) exceeds the model's "
                f"vocab_size ({model.cfg.language.vocab_size}) — ids would "
                f"clamp silently; use a preset with vocab_size >= "
                f"{tok_vocab} or a smaller tokenizer")
    image_size = model.cfg.vision.image_size
    image_processor = load_image_processor(model_path, image_size=image_size)
    # tiny models use fewer image tokens than the 576 protocol constant
    processor = Processor(
        tokenizer,
        image_processor,
        num_image_tokens=model.cfg.num_image_tokens,
    )

    ckpt_path = config.get("ckpt_path")
    if ckpt_path:
        from ospo_tpu.train.checkpoint import merge_lora_checkpoint

        print(f"# Merging LoRA checkpoint {ckpt_path} into base weights.")
        model = merge_lora_checkpoint(model, ckpt_path)

    # optional weight-only int8 (decode-path HBM relief; generation steps
    # only — training consumes full-precision weights).  Checkpoint /
    # LoRA-merged trunks quantize post-build (incrementally); random-init
    # trunks were already quantized inside the init program above.
    if want_quant and not fused_quant:
        from ospo_tpu.ops import quant

        print(f"# Quantizing language-model weights to {qmode} "
              f"({'W8A8' if qmode == 'w8a8' else 'W' + ('8' if qmode == 'int8' else '4') + 'A16'}).")
        # incremental (one stacked matrix at a time): a whole-tree
        # quantize jit double-resides bf16+quantized (~23 GB at 7B) when
        # the backend ignores donation, and every later allocation fails
        model.params = {
            **model.params,
            "language_model": quant.quantize_llama_params_incremental(
                model.params["language_model"], mode=qmode),
        }

    # image-generation steps never call lm_logits — dropping the 0.84 GB
    # bf16 lm_head buys KV-cache headroom (larger serving batch) on a
    # 16 GB chip. Opt-in per step config (step3/inference set it).
    if config.get("drop_lm_head"):
        import jax.numpy as _jnp

        print("# Dropping lm_head (image-generation step).")
        lm = dict(model.params["language_model"])
        lm["lm_head"] = _jnp.zeros((1, 1), model.cfg.dtype)
        model.params = {**model.params, "language_model": lm}

    # text-only steps (2 and 4a question-gen) never touch the vision
    # encoder, the VQ tokenizer, or the generation heads — ~2 GB bf16 at
    # 7B that competes with the decode KV cache for a 15.75 GB chip.
    # Measured consequence of NOT dropping them: the stage-true
    # B=32/p1200 text point (stage_shapes.log, bench model = trunk only)
    # does not reproduce in the full pipeline — the B=32 program fails
    # the AOT compiler's HBM check.  Opt-in per step config, mirrors
    # drop_lm_head (reference: text steps build the full
    # MultiModalityCausalLM too — ospo/utils/model.py:26-40 — but an
    # A100-80G never feels it).
    if config.get("drop_vision"):
        import jax.numpy as _jnp

        print("# Dropping vision/VQ/generation weights (text-only step).")
        stub = _jnp.zeros((1, 1), model.cfg.dtype)
        model.params = {
            **model.params,
            "vision_model": {"_dropped": stub},
            "aligner": {"_dropped": stub},
            "gen_vision_model": {"_dropped": stub},
            "gen_aligner": {"_dropped": stub},
            "gen_head": {"_dropped": stub},
            "gen_embed": stub,
        }

    # image-GENERATION steps (3, inference) never run the SigLIP
    # understanding path — vision_model + aligner are ~1.2 GB bf16 at 7B
    # that sit under the B=24 decode program's ~14 GB peak and tip it
    # over 15.75 GB (the bench headline was measured trunk-only, so the
    # gap only shows in the full pipeline).  Keeps the VQ decoder and
    # gen heads, which step 3 does use.
    if config.get("drop_understanding"):
        import jax.numpy as _jnp

        print("# Dropping SigLIP/aligner weights (image-generation step).")
        stub = _jnp.zeros((1, 1), model.cfg.dtype)
        model.params = {
            **model.params,
            "vision_model": {"_dropped": stub},
            "aligner": {"_dropped": stub},
        }

    # optional in-process parallelism: shard the weights over a
    # (data, model) mesh; engines pick the mesh up via ``model.mesh`` and
    # shard their batches on the data axis.  Under the multi-process
    # launcher (scripts/run_multihost.sh) the scope matters: generation
    # steps shard the ITEM LIST per process, so their mesh must span only
    # this process's local chips (``mesh_scope: local``, the default —
    # identical to the whole mesh in single-process runs), while step-5
    # training shards one global batch over every process's chips
    # (``mesh_scope: global``, set by step5).
    tp = int(config.get("tensor_parallel") or 1)
    dp = int(config.get("data_parallel") or 0)
    model.mesh = None
    if tp > 1 or dp > 1:
        from ospo_tpu.parallel import mesh as mesh_lib

        scope = config.get("mesh_scope") or "local"
        if scope not in ("local", "global"):
            raise ValueError(f"mesh_scope must be local|global, got {scope!r}")
        devices = (jax.devices() if scope == "global"
                   else jax.local_devices())
        n = (dp * tp) if dp else None
        mesh = mesh_lib.create_mesh(n_devices=n, model_parallel=tp,
                                    devices=devices)
        print(f"# Sharding params over {scope} mesh {dict(mesh.shape)}.")
        model.params = mesh_lib.shard_janus_params(model.params, mesh)
        model.mesh = mesh

    return model, tokenizer, processor
