"""from_pretrained end-to-end on a synthetic tiny Janus checkpoint:
config.json + safetensors written in the HF key layout, loaded through
weights.load_janus, and the language model verified against transformers.
This is the dress rehearsal for loading the real Janus-Pro-7B checkpoint."""

import json
import os

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
safetensors_torch = pytest.importorskip("safetensors.torch")

from ospo_tpu.models import janus as janus_lib
from ospo_tpu.models import llama as llama_lib
from ospo_tpu.models import weights


def make_fake_checkpoint(tmp_path):
    """Build an HF-layout state dict for a tiny Janus (language model from
    transformers for oracle comparison; vision/vq tensors shaped like the
    porting code expects)."""
    from tests.test_llama_parity import make_hf_model
    from tests.test_vision_parity import TVQ, TorchViT

    lcfg = llama_lib.tiny_config(vocab_size=128, hidden_size=32,
                                 intermediate_size=64, num_layers=2,
                                 num_heads=2, max_seq_len=128)
    torch.manual_seed(0)
    hf_lm = make_hf_model(lcfg)
    sd = {}
    for k, v in hf_lm.state_dict().items():
        sd[f"language_model.{k}"] = v

    vit = TorchViT(img=32, patch=16, dim=32, depth=2, heads=2)
    for k, v in vit.state_dict_janus().items():
        sd[k] = torch.tensor(v)
    vq = TVQ()
    for k, v in vq.state_dict_janus().items():
        sd[k] = torch.tensor(v)

    # projectors / heads / gen_embed
    n_embed, vit_dim, cb_dim, img_vocab = 32, 32, 8, 64
    def lin(i, o):
        return torch.randn(o, i) * 0.02

    sd.update({
        "aligner.layers.0.weight": lin(vit_dim, n_embed),
        "aligner.layers.0.bias": torch.zeros(n_embed),
        "aligner.layers.2.weight": lin(n_embed, n_embed),
        "aligner.layers.2.bias": torch.zeros(n_embed),
        "gen_aligner.layers.0.weight": lin(cb_dim, n_embed),
        "gen_aligner.layers.0.bias": torch.zeros(n_embed),
        "gen_aligner.layers.2.weight": lin(n_embed, n_embed),
        "gen_aligner.layers.2.bias": torch.zeros(n_embed),
        "gen_head.output_mlp_projector.weight": lin(n_embed, n_embed),
        "gen_head.output_mlp_projector.bias": torch.zeros(n_embed),
        "gen_head.vision_head.weight": lin(n_embed, img_vocab),
        "gen_head.vision_head.bias": torch.zeros(img_vocab),
        "gen_embed.weight": torch.randn(img_vocab, cb_dim) * 0.02,
    })

    ckpt = tmp_path / "janus-tiny"
    os.makedirs(ckpt, exist_ok=True)
    safetensors_torch.save_file(
        {k: v.contiguous() for k, v in sd.items()},
        str(ckpt / "model.safetensors"),
    )
    config = {
        "language_config": {
            "vocab_size": 128, "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "max_position_embeddings": 128,
        },
        "vision_config": {"cls": "CLIPVisionTower",
                          "params": {"image_size": 32,
                                     "model_name": "siglip_large_patch16_384",
                                     "select_layer": -1}},
        "gen_vision_config": {"cls": "VQ-16",
                              "params": {"image_token_size": 64, "n_embed": 8}},
        "aligner_config": {"params": {"depth": 2}},
        "gen_aligner_config": {"params": {"depth": 2}},
    }
    json.dump(config, open(ckpt / "config.json", "w"))
    return str(ckpt), hf_lm, lcfg


def test_from_pretrained_roundtrip(tmp_path):
    import dataclasses

    from ospo_tpu.models import vit as vit_lib
    from ospo_tpu.models import vqgan as vqgan_lib

    ckpt, hf_lm, lcfg = make_fake_checkpoint(tmp_path)

    # tiny overrides the preset dims the auto-config would pick
    cfg = janus_lib.JanusConfig(
        language=lcfg,
        vision=vit_lib.ViTConfig(image_size=32, patch_size=16, width=32,
                                 layers=2, heads=2, select_layer=-1,
                                 dtype=jnp.float32),
        vq=vqgan_lib.tiny_vq_config(),
        gen_embed_dim=8, image_token_size=64, gen_image_size=16,
        dtype=jnp.float32,
    )
    model = janus_lib.JanusModel.from_pretrained(ckpt, cfg)

    # language-model oracle: logits equal to the torch source
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, (2, 9))
    with torch.no_grad():
        ref = hf_lm(input_ids=torch.tensor(ids)).logits.numpy()
    x = janus_lib.embed_text(model.params, jnp.asarray(ids))
    mask = jnp.ones((2, 9), jnp.int32)
    hidden, _ = janus_lib.language_forward(
        model.params, cfg, x, mask, llama_lib.positions_from_mask(mask))
    logits = np.asarray(janus_lib.lm_logits(model.params, hidden))
    np.testing.assert_allclose(logits, ref, atol=2e-4, rtol=2e-4)

    # full multimodal paths run
    gen = janus_lib.prepare_gen_img_embeds(
        model.params, cfg, jnp.array([[1, 2]]))
    assert gen.shape == (1, 2, 32)
    pix = jnp.zeros((1, 1, 32, 32, 3))
    out = janus_lib.prepare_inputs_embeds(
        model.params, cfg, jnp.asarray(ids[:1]), pix,
        jnp.zeros((1, 9), bool), jnp.zeros((1, 1, 4), bool))
    assert out.shape == (1, 9, 32)


def test_config_from_checkpoint_7b_defaults(tmp_path):
    ckpt = tmp_path / "fake7b"
    os.makedirs(ckpt)
    json.dump({
        "language_config": {"vocab_size": 102400, "hidden_size": 4096,
                            "intermediate_size": 11008,
                            "num_hidden_layers": 30,
                            "num_attention_heads": 32},
        "vision_config": {"params": {"image_size": 384,
                                     "model_name": "siglip_large_patch16_384"}},
        "gen_vision_config": {"params": {"image_token_size": 16384,
                                         "n_embed": 8}},
    }, open(ckpt / "config.json", "w"))
    cfg = weights.config_from_checkpoint(str(ckpt))
    assert cfg.language.num_layers == 30
    assert cfg.language.hidden_size == 4096
    assert cfg.num_gen_tokens == 576
    assert cfg.vision.num_patches == 576
    assert cfg.image_token_size == 16384
