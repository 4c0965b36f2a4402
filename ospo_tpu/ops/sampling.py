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


def sample_token(
    key: jax.Array,
    logits: jax.Array,
    temperature=1.0,
    top_p: Optional[float] = None,
    do_sample: bool = True,
) -> jax.Array:
    """One sampling step. logits [..., V] fp32 → token ids [...]."""
    if not do_sample:
        return jnp.argmax(logits, axis=-1)
    scaled = logits / jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-6)
    if top_p is not None and top_p < 1.0:
        scaled = top_p_filter(scaled, top_p)
    return jax.random.categorical(key, scaled)
