"""Speculative Jacobi decoding: near-greedy equivalence with the
sequential engine, termination, and acceptance-driven iteration savings."""

import numpy as np
import pytest
import jax

from ospo_tpu.engine.image_engine import ImageGenEngine
from ospo_tpu.image_processing import ImageProcessor
from ospo_tpu.models import janus
from ospo_tpu.processing import Processor, t2i_prompt
from ospo_tpu.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = janus.tiny_janus_config()
    model = janus.JanusModel.init(cfg, seed=0)
    tok = ByteTokenizer(vocab_size=cfg.language.vocab_size)
    proc = Processor(tok, ImageProcessor(image_size=16), num_image_tokens=4)
    return cfg, model, proc


def make_engine(model, proc, **kw):
    return ImageGenEngine(model, proc, image_token_num=24, img_size=16,
                          patch_size=4, **kw)


def test_sjd_matches_sequential_near_greedy(setup):
    """At temperature→0 the target distribution is (near-)deterministic:
    every draft equals the argmax, acceptance ratio is 1, and SJD must
    reproduce the sequential token stream exactly."""
    cfg, model, proc = setup
    prompts = [t2i_prompt(proc, "A black umbrella"),
               t2i_prompt(proc, "A red moon")]
    seq = make_engine(model, proc, temperature=1e-4)
    sjd = make_engine(model, proc, temperature=1e-4, speculative=4)
    ref = seq.generate_tokens(prompts, seed=0)
    out = sjd.generate_tokens(prompts, seed=0)
    np.testing.assert_array_equal(ref, out)
    # near-greedy acceptance ⇒ far fewer model calls than tokens
    assert sjd.last_sjd_iters < 24


def test_sjd_sampling_terminates_and_fills(setup):
    cfg, model, proc = setup
    prompts = [t2i_prompt(proc, "A cat")]
    sjd = make_engine(model, proc, temperature=1.0, speculative=4)
    out = sjd.generate_tokens(prompts, seed=1)
    assert out.shape == (1, 24)
    assert int(out.max()) < cfg.image_token_size
    assert sjd.last_sjd_iters <= 24  # never worse than sequential


def test_sjd_deterministic_per_seed(setup):
    cfg, model, proc = setup
    prompts = [t2i_prompt(proc, "A cat"), t2i_prompt(proc, "A dog")]
    sjd = make_engine(model, proc, speculative=4)
    a = sjd.generate_tokens(prompts, seed=7)
    b = sjd.generate_tokens(prompts, seed=7)
    np.testing.assert_array_equal(a, b)


def test_sjd_window_row_and_rope_convention(setup):
    """Pin the SJD body's cache-row/rotary convention against the
    INDEPENDENT teacher-forced sequential path: the verify window's first
    query is out[n_gen-1], so its K/V row is t_prompt+n_gen-1 and its
    rotary position is prompt_len+n_gen-1.  The historical off-by-one
    (row/pos at +n_gen) left cache row t_prompt an attended all-zero
    phantom and shifted every image token's rope by +1 — a 2e-5 max|Δp|
    systematic bias vs sequential; aligned, the match is float noise."""
    import jax.numpy as jnp
    from ospo_tpu.models import janus as janus_lib
    from ospo_tpu.models import llama

    cfg, model, proc = setup
    eng = make_engine(model, proc)
    prompts = [t2i_prompt(proc, "A cat")]
    tok0 = np.array([5], np.int32)
    forced = np.zeros((1, 24), np.int32)
    forced[0, 0] = tok0[0]
    # sequential teacher-forced: distribution of token 1 given tok0
    seq_logits = eng.forced_cfg_logits(prompts, forced)
    seq_p1 = np.asarray(jax.nn.softmax(seq_logits[0, 1]))

    params, c = model.params, model.cfg
    tokens, mask = eng.build_cfg_batch(prompts)
    tokens_j, mask_j = jnp.asarray(tokens), jnp.asarray(mask)
    two_b, t_prompt = tokens_j.shape
    W, n_img = 4, 24
    s_max = t_prompt + n_img + W
    emb = janus_lib.embed_text(params, tokens_j)
    pos = llama.positions_from_mask(mask_j)
    kv = llama.init_kv_cache(c.language, two_b, s_max)
    hidden, kv = janus_lib.language_forward(
        params, c, emb, mask_j, pos, kv_cache=kv, self_attn=True,
        cache_layout="bshd")
    prompt_len = jnp.sum(mask_j, -1)
    base_mask = jnp.concatenate(
        [mask_j, jnp.zeros((two_b, s_max - t_prompt), mask_j.dtype)], -1)
    s_idx = jnp.arange(s_max)[None, :]
    n_gen = jnp.ones((1,), jnp.int32)          # tok0 committed
    row_b = t_prompt + n_gen - 1
    row2b = jnp.concatenate([row_b, row_b])
    drafts = jnp.zeros((1, W), jnp.int32)
    inputs = jnp.concatenate([jnp.asarray(tok0)[:, None], drafts[:, :W - 1]], 1)
    inputs2b = jnp.concatenate([inputs, inputs], 0)
    embeds = janus_lib.prepare_gen_img_embeds(params, c, inputs2b)
    pos2 = (prompt_len + jnp.concatenate([n_gen, n_gen]) - 1)[:, None] \
        + jnp.arange(W)[None, :]
    m = base_mask | (
        (s_idx >= t_prompt) & (s_idx < (row2b + W)[:, None])
    ).astype(base_mask.dtype)
    hid, _ = janus_lib.language_forward(
        params, c, embeds, m, pos2, kv_cache=kv,
        cache_positions=row2b, cache_layout="bshd")
    logits = janus_lib.gen_logits(params, hid)
    cond, unc = logits[:1], logits[1:]
    fused = unc + 5.0 * (cond - unc)
    p_body = np.asarray(jax.nn.softmax(fused[0, 0].astype(jnp.float32)))
    np.testing.assert_allclose(p_body, seq_p1, atol=1e-6)


def test_kv_quant_spelling_validated():
    """Unrecognized kv_quant spellings must raise, not silently pick a
    cache precision (parse_kv_quant convention — CLAUDE.md)."""
    with pytest.raises(ValueError):
        ImageGenEngine(None, None, kv_quant="INT_8")


def test_sjd_first_token_distribution_matches(setup):
    """Distribution preservation spot-check: the marginal of the first
    sampled token must match the sequential engine's across seeds."""
    cfg, model, proc = setup
    prompts = [t2i_prompt(proc, "A cat")]
    seq = make_engine(model, proc)
    sjd = make_engine(model, proc, speculative=4)
    n = 60
    seq_first = [int(seq.generate_tokens(prompts, seed=s)[0, 1]) for s in range(n)]
    sjd_first = [int(sjd.generate_tokens(prompts, seed=s)[0, 1]) for s in range(n)]
    # same support and roughly similar histograms (coarse check)
    inter = len(set(seq_first) & set(sjd_first))
    assert inter >= 1
    assert len(set(sjd_first)) > 1  # actually sampling, not collapsing
