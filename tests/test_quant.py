"""Weight-only int8: quantization error bounds and forward equivalence."""

import numpy as np
import jax
import jax.numpy as jnp

from ospo_tpu.models import janus, llama
from ospo_tpu.ops import quant


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 32)) * 0.1
    qw = quant.quantize_matrix(w)
    assert qw["q"].dtype == jnp.int8
    assert qw["s"].shape == (4, 64)
    back = quant.dequantize_matrix(qw, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(w))
    # per-row max error ≤ scale/2 (+eps)
    assert (err <= np.asarray(qw["s"])[..., None] * 0.51).all()


def test_quantized_llama_forward_close():
    cfg = llama.tiny_config(hidden_size=128, intermediate_size=256, num_heads=4)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = quant.quantize_llama_params(params)

    ids = jnp.arange(24).reshape(2, 12) % cfg.vocab_size
    mask = jnp.ones((2, 12), jnp.int32)
    pos = llama.positions_from_mask(mask)
    x = llama.embed_tokens(params, ids)

    ref, _ = llama.forward(params, cfg, x, mask, pos)
    out, _ = llama.forward(qparams, cfg, x, mask, pos)
    ref, out = np.asarray(ref), np.asarray(out)
    denom = np.abs(ref).mean()
    assert np.abs(out - ref).mean() / denom < 0.05  # W8 relative error budget


def test_quantized_janus_gen_path():
    cfg = janus.tiny_janus_config()
    model = janus.JanusModel.init(cfg, seed=0)
    qparams = quant.quantize_janus_params(model.params)
    hidden = jax.random.normal(jax.random.PRNGKey(1), (2, 3, cfg.n_embed)) * 0.3
    ref = np.asarray(janus.gen_logits(model.params, hidden))
    out = np.asarray(janus.gen_logits(qparams, hidden))
    # logit ordering preserved in the bulk (sampling-tolerance criterion)
    agree = (ref.argmax(-1) == out.argmax(-1)).mean()
    assert agree > 0.9
    assert quant.hbm_bytes(qparams["language_model"]["layers"]) < quant.hbm_bytes(
        model.params["language_model"]["layers"]
    )
