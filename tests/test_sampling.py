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


# ---- top-k-bounded nucleus sampler (round 5: the full-vocab double
# argsort in top_p_filter dominated integrated step-2 decode; see
# ROUND_r05.json / BENCH_NOTES round 5) ----

def _kept_set_exact(logits, top_p):
    """Support of the exact nucleus filter, per row."""
    filt = np.asarray(top_p_filter(jnp.asarray(logits), top_p))
    return [set(np.nonzero(~np.isinf(filt[r]))[0].tolist())
            for r in range(filt.shape[0])]


def test_topk_nucleus_support_matches_exact_when_nucleus_fits():
    """Peaked logits (nucleus ≪ K): every sampled token lies in the exact
    filter's support, and every exact-support token is reachable."""
    from ospo_tpu.ops.sampling import top_p_sample_topk

    rng = np.random.default_rng(2)
    # sharply peaked rows: a handful of large logits, long flat tail
    logits = rng.normal(size=(4, 500)).astype(np.float32)
    logits[:, :6] += 12.0
    for top_p in (0.3, 0.5, 0.9):
        exact = _kept_set_exact(logits, top_p)
        keys = jax.random.split(jax.random.PRNGKey(3), 600)
        samples = jax.vmap(
            lambda k: top_p_sample_topk(k, jnp.asarray(logits), top_p, 64)
        )(keys)
        samples = np.asarray(samples)          # [600, 4]
        for r in range(4):
            seen = set(samples[:, r].tolist())
            assert seen <= exact[r], (top_p, r, seen - exact[r])
            # every exact-nucleus token shows up across 600 draws
            assert seen == exact[r], (top_p, r, exact[r] - seen)


def test_topk_nucleus_renormalized_probabilities_match_exact():
    """Within-support sampling frequencies track softmax restricted to
    the exact nucleus (distributional parity, not just support)."""
    from ospo_tpu.ops.sampling import top_p_sample_topk

    logits = jnp.asarray([[4.0, 3.0, 2.0] + [-8.0] * 97])
    top_p = 0.9
    keys = jax.random.split(jax.random.PRNGKey(4), 6000)
    samples = np.asarray(jax.vmap(
        lambda k: top_p_sample_topk(k, logits, top_p, 16)
    )(keys)).ravel()
    kept = sorted(_kept_set_exact(np.asarray(logits), top_p)[0])
    sub = np.asarray(logits)[0, kept]
    expect = np.exp(sub) / np.exp(sub).sum()
    counts = np.asarray([(samples == t).mean() for t in kept])
    assert samples.max() <= max(kept)
    np.testing.assert_allclose(counts, expect, atol=0.03)


def test_topk_nucleus_truncates_to_topk_on_flat_logits():
    """Near-uniform logits (nucleus > K): documented degradation to
    top-k sampling — samples stay within the K highest logits instead of
    nucleus sampling switching itself off."""
    from ospo_tpu.ops.sampling import top_p_sample_topk

    rng = np.random.default_rng(5)
    logits = rng.normal(size=(1, 2048)).astype(np.float32) * 0.01
    k = 32
    topk_idx = set(np.argsort(-logits[0])[:k].tolist())
    keys = jax.random.split(jax.random.PRNGKey(6), 400)
    samples = np.asarray(jax.vmap(
        lambda kk: top_p_sample_topk(kk, jnp.asarray(logits), 0.99, k)
    )(keys)).ravel()
    assert set(samples.tolist()) <= topk_idx


def test_sample_token_topp_exact_env_roundtrip(monkeypatch):
    """OSPO_TOPP_EXACT=1 restores the full-sort path; both paths stay in
    the exact nucleus support on peaked logits."""
    logits = jnp.asarray([[6.0, 5.0, -9.0, -9.0]])
    exact = _kept_set_exact(np.asarray(logits), 0.8)[0]
    for env in ("1", ""):
        monkeypatch.setenv("OSPO_TOPP_EXACT", env)
        keys = jax.random.split(jax.random.PRNGKey(7), 300)
        samples = np.asarray(jax.vmap(
            lambda k: sample_token(k, logits, temperature=1.0, top_p=0.8)
        )(keys)).ravel()
        assert set(samples.tolist()) <= exact
