"""Optimizers and LR schedules (optax).

AdamW + the two custom schedules of the reference
(``ospo/utils/train.py:63-148``): ``CosineDecayWarmUpRestarts`` (linear
warmup → single cosine decay to eta_min) and
``CosineAnnealingWarmUpRestarts`` (SGDR-style warm restarts with decaying
peak).  'constant' matches torch ``ConstantLR(factor=1.0)`` — a flat LR.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import optax


def _cast_updates(dtype) -> optax.GradientTransformation:
    """Cast incoming gradients to ``dtype`` (see build_optimizer: fp32
    second moments for bf16 trainables)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return jax.tree.map(lambda g: g.astype(dtype), updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def cosine_decay_warmup(init_lr: float, warmup_steps: int, max_steps: int,
                        min_lr: float = 1e-6):
    """Linear warmup to ``init_lr`` then cosine decay to ``min_lr``
    (CosineDecayWarmUpRestarts, utils/train.py:119-148)."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = jnp.maximum(warmup_steps, 1)
        warmup_lr = init_lr * step / warm
        progress = jnp.clip(
            (step - warmup_steps) / jnp.maximum(max_steps - warmup_steps, 1), 0.0, 1.0
        )
        cos_lr = min_lr + (init_lr - min_lr) * 0.5 * (1 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup_steps, warmup_lr, cos_lr)

    return schedule


def cosine_annealing_warmup_restarts(
    first_cycle_steps: int,
    max_lr: float,
    min_lr: float = 1e-6,
    warmup_steps: int = 0,
    cycle_mult: float = 1.0,
    gamma: float = 1.0,
):
    """SGDR warm restarts with per-cycle linear warmup and peak decay
    (CosineAnnealingWarmUpRestarts, utils/train.py:63-116)."""

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        if cycle_mult == 1.0:
            cycle = jnp.floor(step / first_cycle_steps)
            in_cycle = step - cycle * first_cycle_steps
            cycle_steps = jnp.asarray(first_cycle_steps, jnp.float32)
        else:
            # closed-form cycle index for geometric cycle growth
            n = jnp.floor(
                jnp.log(step / first_cycle_steps * (cycle_mult - 1) + 1)
                / math.log(cycle_mult)
            )
            start = first_cycle_steps * (cycle_mult ** n - 1) / (cycle_mult - 1)
            cycle = n
            in_cycle = step - start
            cycle_steps = first_cycle_steps * cycle_mult ** n
        peak = max_lr * gamma ** cycle
        warmup_lr = (peak - min_lr) * in_cycle / jnp.maximum(warmup_steps, 1) + min_lr
        progress = jnp.clip(
            (in_cycle - warmup_steps) / jnp.maximum(cycle_steps - warmup_steps, 1),
            0.0, 1.0,
        )
        cos_lr = min_lr + (peak - min_lr) * 0.5 * (1 + jnp.cos(jnp.pi * progress))
        return jnp.where(in_cycle < warmup_steps, warmup_lr, cos_lr)

    return schedule


def build_optimizer(
    init_lr: float = 4e-5,
    betas=(0.9, 0.95),
    weight_decay: float = 0.0,
    eps: float = 1e-8,
    scheduler_type: str = "constant",
    max_steps: int = 10000,
    warmup_ratio: float = 0.0,
    min_lr: float = 1e-6,
    grad_clip: Optional[float] = 1.0,
    accumulation_steps: int = 1,
) -> optax.GradientTransformation:
    if scheduler_type == "constant":
        schedule = init_lr
    elif scheduler_type == "cosine":
        schedule = cosine_decay_warmup(
            init_lr, int(max_steps * warmup_ratio), max_steps, min_lr
        )
    elif scheduler_type == "cosine_restarts":
        schedule = cosine_annealing_warmup_restarts(
            first_cycle_steps=max_steps, max_lr=init_lr, min_lr=min_lr,
            warmup_steps=int(max_steps * warmup_ratio),
        )
    else:
        raise ValueError(f"unknown scheduler_type: {scheduler_type}")

    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    # fp32 moments even for bf16 trainables (full-finetune mode): adamw's
    # mu_dtype only covers the FIRST moment — nu follows the grad dtype,
    # and a bf16 nu (8-bit mantissa) rounds the b2=0.95 EMA of small
    # squared gradients to zero/stale values.  Casting the grads up gives
    # fp32 nu and fp32 updates (apply_updates casts back to param dtype).
    chain.append(_cast_updates(jnp.float32))
    chain.append(
        optax.adamw(schedule, b1=betas[0], b2=betas[1], eps=eps,
                    weight_decay=weight_decay,
                    mu_dtype="float32")
    )
    tx = optax.chain(*chain)
    if accumulation_steps and accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    return tx
