"""Capability-surface extras: ViT attention pool, VQ training losses,
chat-template registry, LoRA dropout."""

import numpy as np
import jax
import jax.numpy as jnp

from ospo_tpu import chat
from ospo_tpu.models import llama, vit, vqgan
from ospo_tpu.train import lora as lora_lib


def test_attention_pool_shapes_and_port():
    cfg = vit.tiny_vit_config()
    pool = vit.init_attn_pool(cfg, jax.random.PRNGKey(0))
    tokens = jax.random.normal(jax.random.PRNGKey(1), (2, 4, cfg.width))
    out = vit.attention_pool(pool, cfg, tokens)
    assert out.shape == (2, cfg.width)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_vq_losses():
    cfg = vqgan.tiny_vq_config(codebook_size=16, codebook_dim=4)
    params = vqgan.init_params(cfg, jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 3, 4))
    z_q, ids, losses = vqgan.quantize_with_losses(params, cfg, z,
                                                  entropy_loss_ratio=0.1)
    assert z_q.shape == z.shape
    assert set(losses) == {"vq_loss", "commit_loss", "entropy_loss"}
    for v in losses.values():
        assert np.isfinite(float(v))
    # commitment = beta * vq distance on the straight-through pair
    np.testing.assert_allclose(
        float(losses["commit_loss"]), cfg.commit_beta * float(losses["vq_loss"]),
        rtol=1e-5,
    )

    # losses must produce encoder-side gradients through the ST estimator
    def loss_fn(z):
        _, _, L = vqgan.quantize_with_losses(params, cfg, z)
        return L["commit_loss"]

    g = jax.grad(loss_fn)(z)
    assert float(jnp.abs(g).sum()) > 0


def test_template_registry_llama2_and_plain():
    msgs = [("[INST]", "hello"), ("[/INST]", "hi there")]
    out = chat.render_template("llama-2", msgs, system_prompt="SYS")
    assert out.startswith("[INST] <<SYS>>\nSYS\n<</SYS>>\n\n")
    assert "hi there </s><s>" in out
    assert chat.render_template("plain", msgs) == "hellohi there"


def test_lora_dropout_changes_output_only_with_rng():
    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    lcfg = lora_lib.LoraConfig(rank=4, alpha=8, dropout=0.5)
    tree = lora_lib.init_lora(cfg, lcfg, jax.random.PRNGKey(1))
    tree = jax.tree.map(
        lambda a: jax.random.normal(jax.random.PRNGKey(2), a.shape) * 0.05, tree)

    ids = jnp.arange(12).reshape(1, 12) % cfg.vocab_size
    x = llama.embed_tokens(params, ids)
    mask = jnp.ones((1, 12), jnp.int32)
    pos = llama.positions_from_mask(mask)

    base, _ = llama.forward(params, cfg, x, mask, pos, lora=tree,
                            lora_scaling=lcfg.scaling)
    dropped, _ = llama.forward(params, cfg, x, mask, pos, lora=tree,
                               lora_scaling=lcfg.scaling,
                               lora_dropout=0.5,
                               lora_dropout_rng=jax.random.PRNGKey(3))
    # with rng: stochastic adapter branch → different output
    assert not np.allclose(np.asarray(base), np.asarray(dropped))
    # without rng (eval mode): dropout is a no-op
    eval_out, _ = llama.forward(params, cfg, x, mask, pos, lora=tree,
                                lora_scaling=lcfg.scaling, lora_dropout=0.5)
    np.testing.assert_allclose(np.asarray(base), np.asarray(eval_out))


def test_projector_types():
    """All four reference projector types (projector.py:33-59): shapes, the
    identity passthrough, and the hybrid high/low split-concat."""
    from ospo_tpu.models import projector as proj

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 5, 16), jnp.float32)

    p = proj.init_projector(key, 16, 24, projector_type="identity",
                            dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(proj.projector(p, x, "identity")), np.asarray(x))

    p = proj.init_projector(key, 16, 24, projector_type="linear",
                            dtype=jnp.float32)
    out = proj.projector(p, x, "linear")
    assert out.shape == (2, 5, 24)
    ref = np.asarray(x) @ np.asarray(p["layers"][0]["w"]).T \
        + np.asarray(p["layers"][0]["b"])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    p = proj.init_projector(key, 16, 24, depth=2, projector_type="mlp_gelu",
                            dtype=jnp.float32)
    assert proj.projector(p, x, "mlp_gelu").shape == (2, 5, 24)

    p = proj.init_projector(key, 16, 24, depth=2,
                            projector_type="low_high_hybrid_split_mlp_gelu",
                            dtype=jnp.float32)
    out = proj.projector(p, (x, x + 1), "low_high_hybrid_split_mlp_gelu")
    assert out.shape == (2, 5, 24)


def test_load_images_path_and_base64(tmp_path):
    """Conversation image loading accepts file paths and base64 data URIs
    (janus/utils/io.py:44-83)."""
    import base64
    import io as _io

    from PIL import Image

    from ospo_tpu.io import load_images

    img = Image.new("RGB", (8, 8), (10, 200, 30))
    path = tmp_path / "a.png"
    img.save(path)
    buf = _io.BytesIO()
    img.save(buf, format="PNG")
    uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()

    convo = [
        {"role": "User", "content": "<image_placeholder>",
         "images": [str(path), uri]},
        {"role": "Assistant", "content": ""},
    ]
    out = load_images(convo)
    assert len(out) == 2
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(out[1]))
