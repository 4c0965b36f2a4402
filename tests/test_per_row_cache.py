"""Per-row cache offsets (the speculative-Jacobi substrate): rows written
at independent positions must produce the same hidden states as running
each row separately with the standard path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ospo_tpu.models import llama


@pytest.mark.parametrize("quantized", [False, True])
def test_per_row_offsets_match_independent_rows(quantized):
    cfg = llama.tiny_config(hidden_size=128, intermediate_size=256, num_heads=4)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b, smax, W = 3, 64, 4
    prompt_lens = [5, 9, 7]            # rows advance unevenly
    ids = rng.integers(0, cfg.vocab_size, (b, 16))

    # --- per-row path: prefill rows together (max len, left-aligned
    # per-row via cache_positions=zeros), then write a W-token window at
    # each row's own offset ---
    cache = llama.init_kv_cache(cfg, b, smax, quantized=quantized)
    offs = jnp.asarray(prompt_lens, jnp.int32)

    # prefill each row's prompt using per-row positions from 0 (right-pad)
    t0 = max(prompt_lens)
    x_prompt = llama.embed_tokens(params, jnp.asarray(ids[:, :t0]))
    prompt_valid = np.zeros((b, smax), np.int64)
    for i, pl_ in enumerate(prompt_lens):
        prompt_valid[i, :pl_] = 1
    pos0 = jnp.broadcast_to(jnp.arange(t0), (b, t0))
    _, cache = llama.forward(
        params, cfg, x_prompt, jnp.asarray(prompt_valid), pos0,
        kv_cache=cache, cache_positions=jnp.zeros((b,), jnp.int32),
    )
    # overwrite garbage rows beyond each prompt via the window write below

    x_win = llama.embed_tokens(params, jnp.asarray(ids[:, t0:t0 + W]))
    win_valid = prompt_valid.copy()
    for i, pl_ in enumerate(prompt_lens):
        win_valid[i, pl_:pl_ + W] = 1
    pos_win = offs[:, None] + jnp.arange(W)[None, :]
    h_win, cache = llama.forward(
        params, cfg, x_win, jnp.asarray(win_valid), pos_win,
        kv_cache=cache, cache_positions=offs,
    )

    # --- reference: each row independently, contiguous tokens ---
    for i, pl_ in enumerate(prompt_lens):
        row_ids = np.concatenate([ids[i, :pl_], ids[i, t0:t0 + W]])
        x = llama.embed_tokens(params, jnp.asarray(row_ids)[None])
        mask = jnp.ones((1, len(row_ids)), jnp.int32)
        pos = llama.positions_from_mask(mask)
        if quantized:
            # identical quantized-cache machinery (incl. quantized prompt
            # reads) so the comparison isolates the per-row write path
            c = llama.init_kv_cache(cfg, 1, smax, quantized=True)
            pm = np.zeros((1, smax), np.int64)
            pm[0, :pl_] = 1
            _, c = llama.forward(
                params, cfg, x[:, :pl_], jnp.asarray(pm), pos[:, :pl_],
                kv_cache=c, cache_positions=jnp.zeros((1,), jnp.int32),
            )
            win_mask = np.zeros((1, smax), np.int64)
            win_mask[0, :pl_ + W] = 1
            h_ref, _ = llama.forward(
                params, cfg, x[:, pl_:], jnp.asarray(win_mask), pos[:, pl_:],
                kv_cache=c, cache_positions=jnp.asarray([pl_], jnp.int32),
            )
        else:
            h_full, _ = llama.forward(params, cfg, x, mask, pos)
            h_ref = h_full[:, pl_:]
        np.testing.assert_allclose(
            np.asarray(h_win[i]), np.asarray(h_ref[0]), atol=2e-4, rtol=2e-4,
            err_msg=f"row {i}",
        )
