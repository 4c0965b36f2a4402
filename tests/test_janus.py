"""Janus assembly: embed splice semantics, gen-path shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from ospo_tpu.models import janus


def make_model():
    cfg = janus.tiny_janus_config()
    return cfg, janus.init_params(cfg, jax.random.PRNGKey(0))


def test_prepare_gen_img_embeds_shape():
    cfg, params = make_model()
    ids = jnp.array([[1, 2, 3], [4, 5, 6]])
    out = janus.prepare_gen_img_embeds(params, cfg, ids)
    assert out.shape == (2, 3, cfg.n_embed)


def test_gen_logits_shape():
    cfg, params = make_model()
    hidden = jnp.zeros((2, 5, cfg.n_embed))
    logits = janus.gen_logits(params, hidden)
    assert logits.shape == (2, 5, cfg.image_token_size)
    assert logits.dtype == jnp.float32


def test_prepare_inputs_embeds_splice():
    """Image-token slots must receive image embeddings in row order, other
    slots keep their text embeddings — matching the boolean-mask assignment
    of the reference (modeling_vlm.py:255-259)."""
    cfg, params = make_model()
    b, t = 2, 10
    t2 = cfg.num_image_tokens  # tiny vit: (32/16)^2 = 4
    n_img = 1

    rng = np.random.default_rng(0)
    input_ids = rng.integers(0, cfg.language.vocab_size, (b, t))
    pixels = jnp.asarray(rng.normal(size=(b, n_img, 32, 32, 3)), jnp.float32)

    seq_mask = np.zeros((b, t), bool)
    seq_mask[0, 2:2 + t2] = True       # row 0: image at positions 2..5
    seq_mask[1, 5:5 + t2] = True       # row 1: image at positions 5..8
    emb_mask = np.ones((b, n_img, t2), bool)

    out = janus.prepare_inputs_embeds(
        params, cfg, jnp.asarray(input_ids), pixels,
        jnp.asarray(seq_mask), jnp.asarray(emb_mask),
    )
    assert out.shape == (b, t, cfg.n_embed)

    img_embeds = janus.encode_images(
        params, cfg, pixels.reshape(b * n_img, 32, 32, 3)
    ).reshape(b, t2, -1)
    text_embeds = janus.embed_text(params, jnp.asarray(input_ids))

    np.testing.assert_allclose(
        np.asarray(out[0, 2:2 + t2]), np.asarray(img_embeds[0]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out[1, 5:5 + t2]), np.asarray(img_embeds[1]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out[0, :2]), np.asarray(text_embeds[0, :2]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out[1, 9:]), np.asarray(text_embeds[1, 9:]), atol=1e-6)


def test_prepare_inputs_embeds_no_image():
    """Rows with no image (emb_mask all-False) must be pure text embeds."""
    cfg, params = make_model()
    b, t = 1, 6
    input_ids = jnp.arange(6).reshape(1, 6)
    pixels = jnp.zeros((b, 1, 32, 32, 3))
    seq_mask = jnp.zeros((b, t), bool)
    emb_mask = jnp.zeros((b, 1, cfg.num_image_tokens), bool)
    out = janus.prepare_inputs_embeds(params, cfg, input_ids, pixels,
                                      seq_mask, emb_mask)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(janus.embed_text(params, input_ids)),
        atol=1e-6)
