"""Numerical parity of the JAX Llama decoder against transformers' torch
LlamaForCausalLM — the strongest oracle available for the language-model
port (the reference model *is* transformers Llama,
janus/models/modeling_vlm.py:218-219).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ospo_tpu.models import llama as jl

torch = pytest.importorskip("torch")


def make_hf_model(cfg):
    from transformers import LlamaConfig as HFConfig
    from transformers.models.llama.modeling_llama import LlamaForCausalLM

    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.kv_heads,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        max_position_embeddings=cfg.max_seq_len,
        attention_bias=False,
        mlp_bias=False,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = LlamaForCausalLM(hf_cfg)
    model.eval()
    return model


def port_from_hf(model, cfg):
    """Torch state_dict → stacked JAX param tree via the production mapping
    (ospo_tpu.models.weights.port_llama with an empty prefix)."""
    from ospo_tpu.models import weights

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return weights.port_llama(sd, cfg, prefix="")


@pytest.fixture(scope="module")
def setup():
    cfg = jl.tiny_config(vocab_size=128, hidden_size=32, intermediate_size=64,
                         num_layers=2, num_heads=2, max_seq_len=128)
    torch.manual_seed(0)
    hf = make_hf_model(cfg)
    params = port_from_hf(hf, cfg)
    return cfg, hf, params


def test_forward_logits_match(setup):
    cfg, hf, params = setup
    rng = np.random.default_rng(0)
    b, t = 2, 12
    ids = rng.integers(0, cfg.vocab_size, (b, t))
    # left padding on row 1
    attn = np.ones((b, t), np.int64)
    attn[1, :4] = 0

    with torch.no_grad():
        out = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(attn),
        ).logits.numpy()

    x = jl.embed_tokens(params, jnp.asarray(ids))
    pos = jl.positions_from_mask(jnp.asarray(attn))
    hidden, _ = jl.forward(params, cfg, x, jnp.asarray(attn), pos)
    logits = np.asarray(jl.logits_from_hidden(params, hidden))

    valid = attn.astype(bool)
    np.testing.assert_allclose(logits[valid], out[valid], atol=2e-4, rtol=2e-4)


def test_kv_cache_decode_matches_full_forward(setup):
    cfg, hf, params = setup
    rng = np.random.default_rng(1)
    b, t_prompt, t_total, smax = 2, 8, 14, 32
    ids = rng.integers(0, cfg.vocab_size, (b, t_total))
    attn_full = np.ones((b, t_total), np.int64)
    attn_full[0, :3] = 0  # left padding

    # full forward (no cache)
    x = jl.embed_tokens(params, jnp.asarray(ids))
    pos = jl.positions_from_mask(jnp.asarray(attn_full))
    hidden_full, _ = jl.forward(params, cfg, x, jnp.asarray(attn_full), pos)

    # prefill + step-by-step decode via cache
    cache = jl.init_kv_cache(cfg, b, smax)
    window = np.zeros((b, smax), np.int64)
    window[:, :t_prompt] = attn_full[:, :t_prompt]
    h_prefill, cache = jl.forward(
        params, cfg, x[:, :t_prompt], jnp.asarray(attn_full[:, :t_prompt]),
        pos[:, :t_prompt], kv_cache=cache, self_attn=True,
    )
    valid = attn_full[:, :t_prompt].astype(bool)  # pad rows are garbage-by-design
    np.testing.assert_allclose(
        np.asarray(h_prefill)[valid],
        np.asarray(hidden_full[:, :t_prompt])[valid],
        atol=1e-5, rtol=1e-5,
    )

    h_steps = []
    for step in range(t_prompt, t_total):
        window[:, step] = 1
        h_step, cache = jl.forward(
            params, cfg, x[:, step:step + 1], jnp.asarray(window),
            pos[:, step:step + 1], kv_cache=cache,
        )
        h_steps.append(np.asarray(h_step)[:, 0])
    h_decode = np.stack(h_steps, axis=1)
    np.testing.assert_allclose(
        h_decode, np.asarray(hidden_full[:, t_prompt:]), atol=1e-5, rtol=1e-5
    )
