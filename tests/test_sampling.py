"""Sampling ops: nucleus filter vs transformers' TopPLogitsWarper,
categorical distribution sanity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ospo_tpu.ops.sampling import sample_token, top_p_filter

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


@pytest.mark.parametrize("top_p", [0.3, 0.5, 0.9])
def test_top_p_filter_matches_hf(top_p):
    from transformers.generation.logits_process import TopPLogitsWarper

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 50)).astype(np.float32) * 2

    warper = TopPLogitsWarper(top_p=top_p)
    ref = warper(None, torch.tensor(logits)).numpy()
    ours = np.asarray(top_p_filter(jnp.asarray(logits), top_p))

    np.testing.assert_array_equal(np.isinf(ours), np.isinf(ref))
    np.testing.assert_allclose(
        ours[~np.isinf(ours)], ref[~np.isinf(ref)], atol=1e-6
    )


def test_greedy_is_argmax():
    logits = jnp.asarray(np.random.default_rng(1).normal(size=(3, 20)))
    out = sample_token(jax.random.PRNGKey(0), logits, do_sample=False)
    np.testing.assert_array_equal(np.asarray(out), np.argmax(logits, -1))


def test_temperature_sampling_distribution():
    """Empirical sampling frequencies must track softmax(logits/T)."""
    logits = jnp.asarray([[2.0, 1.0, 0.0, -1.0]])
    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    samples = jax.vmap(
        lambda k: sample_token(k, logits, temperature=1.0)
    )(keys)
    counts = np.bincount(np.asarray(samples).ravel(), minlength=4) / 4000
    expect = np.asarray(jax.nn.softmax(logits, -1))[0]
    np.testing.assert_allclose(counts, expect, atol=0.03)


def test_top_p_excludes_tail():
    logits = jnp.asarray([[5.0, 4.0, -10.0, -10.0]])
    keys = jax.random.split(jax.random.PRNGKey(1), 200)
    samples = jax.vmap(
        lambda k: sample_token(k, logits, temperature=1.0, top_p=0.5)
    )(keys)
    assert set(np.asarray(samples).ravel().tolist()) == {0}


def test_top_p_tied_probabilities_keep_prefix_only():
    """Index-based nucleus mask: with UNIFORM logits a value threshold
    would keep all V tokens (everything ties the cutoff), silently
    disabling nucleus sampling; the sorted-prefix mask keeps ~top_p·V."""
    from ospo_tpu.ops.sampling import top_p_filter

    v = 100
    logits = jnp.zeros((1, v), jnp.float32)
    out = np.asarray(top_p_filter(logits, 0.1))
    kept = int(np.isfinite(out).sum())
    # ~0.1·V, ±1 for float cumsum rounding at the exact boundary —
    # the point is kept << V (the old value threshold kept all 100)
    assert 10 <= kept <= 11


def test_top_p_zero_keeps_top_token():
    from ospo_tpu.ops.sampling import top_p_filter

    logits = jnp.asarray([[0.1, 3.0, 1.0]], jnp.float32)
    out = np.asarray(top_p_filter(logits, 0.0))
    assert np.isfinite(out[0, 1])          # argmax survives
    assert not np.isfinite(out[0, 0]) and not np.isfinite(out[0, 2])


def test_top_p_normal_case_matches_hf_cutoff():
    from ospo_tpu.ops.sampling import top_p_filter

    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]], jnp.float32))
    out = np.asarray(top_p_filter(logits, 0.7))
    # prev-mass: 0, .5, .8, .95 → keep first two (HF: last kept is the one
    # whose preceding cumulative mass first reaches top_p)
    np.testing.assert_array_equal(np.isfinite(out[0]),
                                  [True, True, False, False])
