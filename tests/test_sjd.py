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
