"""Token sampling ops (jit-safe, fixed-shape).

Replaces torch ``softmax``/``multinomial``/HF sampling with ``jax.random``
equivalents.  Exact sample-level parity with torch RNG is impossible by
construction; distributional equivalence is what the pipeline protocol
requires (BASELINE.md sampling tolerance).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sample_categorical(key: jax.Array, logits: jax.Array,
                       temperature) -> jax.Array:
    """Temperature sampling over the last axis. logits: [..., V] fp32."""
    return jax.random.categorical(key, logits / jnp.maximum(temperature, 1e-6))


def top_p_filter(logits: jax.Array, top_p) -> jax.Array:
    """Nucleus filtering: keep the smallest prefix of the sorted distribution
    with cumulative probability ≥ top_p; everything else → -inf.

    Matches HF semantics: the first token whose *preceding* cumulative mass
    already reaches top_p is the last kept one.  The keep mask is INDEX
    based (scattered back through the sort permutation), not a probability
    threshold — a value threshold keeps every token TIED with the cutoff
    (near-uniform logits would then pass all V tokens, i.e. nucleus
    sampling would switch itself off exactly in the degenerate cases it
    exists to guard).  The top-ranked token is always kept, so top_p ≤ 0
    degrades to greedy-support rather than an all--inf row.
    """
    sorted_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sorted_idx, axis=-1)
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    # mass strictly before each sorted position; position 0 has 0 < top_p
    prev_cum = jnp.cumsum(sorted_probs, axis=-1) - sorted_probs
    keep_sorted = prev_cum < top_p
    keep_sorted = keep_sorted.at[..., 0].set(True)     # never empty
    inv = jnp.argsort(sorted_idx, axis=-1)             # scatter back
    keep = jnp.take_along_axis(keep_sorted, inv, axis=-1)
    return jnp.where(keep, logits, -jnp.inf)


def top_p_sample_topk(key: jax.Array, scaled_logits: jax.Array,
                      top_p, k: int) -> jax.Array:
    """Nucleus sampling restricted to the ``k`` highest-logit candidates.

    ``top_p_filter`` is exact but runs TWO full-vocab argsorts per call —
    at V=102400 that dominated the decode step on the chip (integrated
    round r5: step-2 dispatches ran ~4x slower than the ``top_p=None``
    bench POINT; ROUND_r05.json / BENCH_NOTES round 5).  ``lax.top_k``
    with a small static ``k`` removes both sorts.

    Semantics: candidate probabilities are computed against the FULL
    distribution (logsumexp over V), and the HF index-based cutoff (keep
    while the *preceding* cumulative mass is < top_p; the top-ranked
    token is always kept) is applied within the candidates — identical
    to the exact filter whenever the nucleus fits inside the top ``k``.
    For any trained model at production top_p (0.5/0.9) the nucleus is a
    handful of tokens, so k=64 is exact in practice; if the nucleus
    overflows ``k`` (near-uniform logits, e.g. random-weight rehearsals)
    this truncates to top-k sampling instead of switching nucleus off.
    Reference sampling surface: HF ``generate(top_p=...)`` via
    ospo/wrapper/text_generation.py:63-81.
    """
    k = min(int(k), scaled_logits.shape[-1])
    vals, idx = jax.lax.top_k(scaled_logits, k)            # [..., k]
    lse = jax.nn.logsumexp(scaled_logits, axis=-1, keepdims=True)
    probs = jnp.exp(vals - lse)                            # full-dist probs
    prev_cum = jnp.cumsum(probs, axis=-1) - probs
    keep = prev_cum < top_p
    keep = keep.at[..., 0].set(True)                       # never empty
    choice = jax.random.categorical(key, jnp.where(keep, vals, -jnp.inf))
    return jnp.take_along_axis(
        idx, choice[..., None], axis=-1)[..., 0]


def sample_token(
    key: jax.Array,
    logits: jax.Array,
    temperature=1.0,
    top_p: Optional[float] = None,
    do_sample: bool = True,
) -> jax.Array:
    """One sampling step. logits [..., V] fp32 → token ids [...].

    With ``top_p`` set, dispatches to the top-k-bounded nucleus sampler
    (trace-time knobs: ``OSPO_TOPP_K`` candidate count, default 64;
    ``OSPO_TOPP_EXACT=1`` restores the full-sort filter)."""
    if not do_sample:
        return jnp.argmax(logits, axis=-1)
    scaled = logits / jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-6)
    if top_p is not None and top_p < 1.0:
        import os
        if os.environ.get("OSPO_TOPP_EXACT") == "1":
            return jax.random.categorical(key, top_p_filter(scaled, top_p))
        k = int(os.environ.get("OSPO_TOPP_K", "64"))
        return top_p_sample_topk(key, scaled, top_p, k)
    return jax.random.categorical(key, scaled)
