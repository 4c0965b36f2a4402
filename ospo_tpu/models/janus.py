"""Janus-Pro multimodal model assembly in functional JAX.

Composes the seven submodules of the reference ``MultiModalityCausalLM``
(``janus/models/modeling_vlm.py:190-264``):

  vision_model (SigLIP ViT) → aligner (mlp_gelu) ─┐ understanding path
  gen_vision_model (VQ-GAN)                        │
  gen_embed ([16384, 8] table) → gen_aligner ──────┤ generation path
  gen_head (vision_head: hidden → 16384 logits)    │
  language_model (Llama decoder) ──────────────────┘ shared trunk

Everything is a param pytree + pure functions; `JanusModel` is a thin
config-carrying namespace so engines can stay jit-friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ospo_tpu.models import llama, projector, vit, vqgan

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class JanusConfig:
    language: llama.LlamaConfig = dataclasses.field(default_factory=lambda: llama.LLAMA_7B)
    vision: vit.ViTConfig = dataclasses.field(default_factory=lambda: vit.SIGLIP_LARGE_384)
    vq: vqgan.VQConfig = dataclasses.field(default_factory=lambda: vqgan.VQ_16)
    gen_embed_dim: int = 8           # width of the gen_embed table rows
    aligner_depth: int = 2
    gen_aligner_depth: int = 2
    image_token_size: int = 16384    # VQ codebook size = image vocab
    gen_image_size: int = 384        # generated-image resolution (VQ side)
    dtype: Any = jnp.bfloat16

    @property
    def n_embed(self) -> int:
        return self.language.hidden_size

    @property
    def num_image_tokens(self) -> int:
        """Tokens per image on the understanding path (ViT patches)."""
        return self.vision.num_patches

    @property
    def vq_latent_side(self) -> int:
        return self.gen_image_size // self.vq.downsample_factor

    @property
    def num_gen_tokens(self) -> int:
        """Image tokens per generated image (576 for Janus-Pro @384)."""
        return self.vq_latent_side ** 2


JANUS_PRO_7B = JanusConfig()
JANUS_PRO_1B = JanusConfig(language=llama.LLAMA_1B)


def tiny_janus_config(vocab_size: int = 512, dtype=jnp.float32) -> JanusConfig:
    """A miniature Janus with the full module graph, for tests/CI.

    Image side: 32px images, patch 16 → 4 understanding tokens; VQ with
    2 levels → 16×16 latents on 32px images... kept at 4 tokens by using
    ch_mult of length 2 (4× total downsample → 8×8) — tests override image
    sizes explicitly where needed.
    """
    return JanusConfig(
        language=llama.tiny_config(vocab_size=vocab_size, dtype=dtype),
        vision=vit.tiny_vit_config(dtype=dtype),
        vq=vqgan.tiny_vq_config(),
        gen_embed_dim=8,
        image_token_size=64,
        gen_image_size=16,  # 2× VQ downsample → 8×8 = 64 gen tokens
        dtype=dtype,
    )


def init_params(cfg: JanusConfig, key: jax.Array) -> Params:
    k_lm, k_vit, k_vq, k_al, k_gal, k_gh, k_ge = jax.random.split(key, 7)
    return {
        "language_model": llama.init_params(cfg.language, k_lm),
        "vision_model": vit.init_params(cfg.vision, k_vit),
        "gen_vision_model": vqgan.init_params(cfg.vq, k_vq),
        "aligner": projector.init_mlp_projector(
            k_al, cfg.vision.width, cfg.n_embed, cfg.aligner_depth, cfg.dtype
        ),
        "gen_aligner": projector.init_mlp_projector(
            k_gal, cfg.gen_embed_dim, cfg.n_embed, cfg.gen_aligner_depth, cfg.dtype
        ),
        "gen_head": projector.init_vision_head(
            k_gh, cfg.n_embed, cfg.n_embed, cfg.image_token_size, cfg.dtype
        ),
        "gen_embed": (
            jax.random.normal(k_ge, (cfg.image_token_size, cfg.gen_embed_dim),
                              jnp.float32) * 0.02
        ).astype(cfg.dtype),
    }


# ---------------------------------------------------------------------------
# embedding preparation
# ---------------------------------------------------------------------------


def embed_text(params: Params, input_ids: jax.Array) -> jax.Array:
    return llama.embed_tokens(params["language_model"], input_ids)


def encode_images(params: Params, cfg: JanusConfig, pixel_values: jax.Array) -> jax.Array:
    """Understanding path: pixels [N, H, W, 3] → aligned embeds [N, T2, D]."""
    feats = vit.forward(params["vision_model"], cfg.vision, pixel_values)
    return projector.mlp_projector(params["aligner"], feats)


def prepare_inputs_embeds(
    params: Params,
    cfg: JanusConfig,
    input_ids: jax.Array,        # [B, T]
    pixel_values: jax.Array,     # [B, n_images, H, W, 3]
    images_seq_mask: jax.Array,  # [B, T] bool — where image embeds go
    images_emb_mask: jax.Array,  # [B, n_images, T2] bool — which embeds used
    img_embeds: "jax.Array | None" = None,  # [B*n, T2, D] precomputed
) -> jax.Array:
    """Splice aligned image-patch embeddings into the text embedding stream.

    TPU-native version of ``MultiModalityCausalLM.prepare_inputs_embeds``
    (modeling_vlm.py:222-261): instead of boolean fancy-assignment we build a
    gather index per sequence slot — for each position holding an image token
    we pick the corresponding (row-ordered) image embedding — then select
    with ``jnp.where``. Requires, like the reference, that each sample's
    image-token count equals its valid image-embedding count.
    """
    b, t = input_ids.shape
    n_img = images_emb_mask.shape[1]
    t2 = cfg.num_image_tokens

    if img_embeds is None:
        flat_pixels = pixel_values.reshape(b * n_img, *pixel_values.shape[2:])
        img_embeds = encode_images(params, cfg, flat_pixels)
    # precomputed img_embeds let callers jit the ViT encode separately
    # from the trunk prefill (halves peak HBM — scoring's shared-prefix
    # path OOMed 19.6G when both lived in one program at 7B)
    img_embeds = img_embeds.reshape(b, n_img * t2, -1)           # [B, n*T2, D]
    emb_mask = images_emb_mask.reshape(b, n_img * t2)            # [B, n*T2]

    text_embeds = embed_text(params, jnp.maximum(input_ids, 0))

    # Rank the valid image embeds per batch row (stable order), and rank the
    # image slots in the sequence; slot k takes valid image embed k.
    emb_rank = jnp.cumsum(emb_mask.astype(jnp.int32), axis=-1) - 1   # [B, n*T2]
    seq_rank = jnp.cumsum(images_seq_mask.astype(jnp.int32), axis=-1) - 1  # [B, T]

    # scatter valid embeds into a dense [B, max_slots, D] table
    max_slots = n_img * t2
    dense = jnp.zeros((b, max_slots, img_embeds.shape[-1]), img_embeds.dtype)
    scatter_idx = jnp.where(emb_mask, emb_rank, max_slots - 1)
    dense = jax.vmap(lambda d, idx, src, m: d.at[idx].add(
        src * m[:, None].astype(src.dtype)
    ))(dense, scatter_idx, img_embeds, emb_mask)

    gathered = jax.vmap(lambda d, idx: d[idx])(dense, jnp.maximum(seq_rank, 0))
    return jnp.where(images_seq_mask[..., None], gathered, text_embeds)


def prepare_gen_img_embeds(params: Params, cfg: JanusConfig,
                           image_ids: jax.Array) -> jax.Array:
    """Generation path: codebook ids → LM-space embeddings
    (``gen_aligner(gen_embed(ids))``, modeling_vlm.py:263-264)."""
    raw = jnp.take(params["gen_embed"], image_ids, axis=0)
    return projector.mlp_projector(params["gen_aligner"], raw)


def gen_logits(params: Params, hidden: jax.Array) -> jax.Array:
    """LM hidden states → image-token logits (the ``gen_head``)."""
    return projector.vision_head(params["gen_head"], hidden)


def lm_logits(params: Params, hidden: jax.Array) -> jax.Array:
    return llama.logits_from_hidden(params["language_model"], hidden)


def language_forward(params: Params, cfg: JanusConfig, *args, **kwargs):
    return llama.forward(params["language_model"], cfg.language, *args, **kwargs)


@dataclasses.dataclass
class JanusModel:
    """Config + params bundle with convenience methods (non-jitted shell;
    engines jit the functional entry points directly)."""

    cfg: JanusConfig
    params: Params

    @classmethod
    def init(cls, cfg: JanusConfig, seed: int = 0,
             quantize=False) -> "JanusModel":
        # one fused jit: ~250 small init ops as a single device program
        # (dispatching them individually is pathological on remote backends).
        # ``quantize`` (True/"int8", or "int4") fuses trunk quantization
        # into the same program so the bf16 stacks never co-reside with
        # their quantized replacements (13.3+6.7GB would OOM a 16GB chip).
        if quantize:
            # validate the spelling LOUDLY before tracing (True → "int8");
            # a silent coercion here would hand an int8 trunk to a caller
            # who asked for int4 — 2× the planned weight HBM, no error
            if quantize is True:
                quantize = "int8"
            elif quantize not in ("int8", "w8a8", "int4", "int4g", "int4n"):
                raise ValueError(
                    f"JanusModel.init(quantize={quantize!r}): expected "
                    "True, 'int8', 'w8a8', 'int4', 'int4g' or 'int4n'")

        key = jax.random.PRNGKey(seed)
        if not quantize:
            # one fused jit: ~250 small init ops as a single device program
            # (individual dispatch is pathological on remote backends)
            return cls(cfg, jax.jit(lambda k: init_params(cfg, k))(key))

        # Per-matrix fused generate→quantize programs.  A single program
        # holding the whole bf16 trunk (13.3 GB at 7B) plus quantize temps
        # relies on XLA interleaving generation with quantization to fit a
        # 16 GB chip — int8 fit, int4g's extra group-reshape/pack temps
        # OOMed (round-4 campaign, outputs-timed/scoring_redo.log.int4g).
        # Instead each quantizable stacked matrix gets its OWN program that
        # traces the full ``init_params`` and returns only that matrix
        # quantized: everything else is dead-code-eliminated, values match
        # quantize-after-init (int payloads + bf16 leaves bitwise, scales
        # to 1 ulp of compiler fusion — tests/test_quant.py pins this),
        # and peak HBM is bounded at quantized-so-far + one bf16 stack
        # (~2.7 GB at 7B).
        from ospo_tpu.ops import quant

        qfn = quant.quant_fn(quantize)

        def build_one(k, name):
            return qfn(init_params(cfg, k)["language_model"]["layers"][name])

        layers_q = {}
        for name in quant.QUANTIZABLE:
            layers_q[name] = jax.block_until_ready(
                jax.jit(build_one, static_argnums=1)(key, name))

        def build_rest(k):
            p = init_params(cfg, k)
            lm = dict(p["language_model"])
            lm["layers"] = {n: v for n, v in lm["layers"].items()
                            if n not in quant.QUANTIZABLE}
            return {**p, "language_model": lm}

        params = jax.jit(build_rest)(key)
        lm = dict(params["language_model"])
        lm["layers"] = {**lm["layers"], **layers_q}
        return cls(cfg, {**params, "language_model": lm})

    @classmethod
    def from_pretrained(cls, model_path: str,
                        cfg: Optional[JanusConfig] = None) -> "JanusModel":
        from ospo_tpu.models import weights

        return weights.load_janus(model_path, cfg)
