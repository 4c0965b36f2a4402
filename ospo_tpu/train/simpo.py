"""SimPO (reference-free DPO) loss and batch log-prob computation.

Mirrors the math of ``JanusProTrainWrapper`` exactly
(``ospo/wrapper/train.py:317-396``):

  logits  = (logp_chosen − logp_rejected) − γ/β
  sigmoid: −logσ(β·logits)·(1−ls) − logσ(−β·logits)·ls
  hinge:   relu(1 − β·logits)

with length-averaged log-probs over label-masked tokens (labels shifted by
one against logits).  Verified against a hand-computed torch port in
``tests/test_simpo.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ospo_tpu.constants import IGNORE_ID


@dataclasses.dataclass(frozen=True)
class SimPOConfig:
    beta: float = 10.0
    gamma_beta_ratio: float = 0.5
    label_smoothing: float = 0.0
    sft_weight: float = 0.0
    loss_type: str = "sigmoid"  # sigmoid | hinge


def batch_logps(
    logits: jax.Array,   # [B, T, V] fp32
    labels: jax.Array,   # [B, T] int (IGNORE_ID masks)
    average_log_prob: bool = True,
) -> jax.Array:
    """Per-sequence (mean) log-prob of the labelled tokens, next-token
    aligned (``get_batch_logps``, train.py:375-396)."""
    labels = labels[:, 1:]
    logits = logits[:, :-1, :]
    loss_mask = labels != IGNORE_ID
    safe_labels = jnp.where(loss_mask, labels, 0)
    logps = jax.nn.log_softmax(logits, axis=-1)
    tok_logps = jnp.take_along_axis(logps, safe_labels[..., None], axis=-1)[..., 0]
    total = jnp.sum(tok_logps * loss_mask, axis=-1)
    if average_log_prob:
        return total / jnp.maximum(jnp.sum(loss_mask, axis=-1), 1)
    return total


def simpo_loss(
    cfg: SimPOConfig,
    chosen_logps: jax.Array,
    rejected_logps: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """→ (per-pair losses, chosen_rewards, rejected_rewards)."""
    pi_logratios = chosen_logps - rejected_logps
    logits = pi_logratios - cfg.gamma_beta_ratio
    if cfg.loss_type == "sigmoid":
        losses = (
            -jax.nn.log_sigmoid(cfg.beta * logits) * (1 - cfg.label_smoothing)
            - jax.nn.log_sigmoid(-cfg.beta * logits) * cfg.label_smoothing
        )
    elif cfg.loss_type == "hinge":
        losses = jax.nn.relu(1 - cfg.beta * logits)
    else:
        raise ValueError(f"Unknown loss type: {cfg.loss_type}")
    chosen_rewards = cfg.beta * jax.lax.stop_gradient(chosen_logps)
    rejected_rewards = cfg.beta * jax.lax.stop_gradient(rejected_logps)
    return losses, chosen_rewards, rejected_rewards


def sft_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over labelled (non-ignored) positions of the chosen half
    (train.py:421-428)."""
    labels = labels[:, 1:]
    logits = logits[:, :-1, :]
    mask = labels != IGNORE_ID
    safe = jnp.where(mask, labels, 0)
    logps = jax.nn.log_softmax(logits, axis=-1)
    tok = jnp.take_along_axis(logps, safe[..., None], axis=-1)[..., 0]
    return -jnp.sum(tok * mask) / jnp.maximum(jnp.sum(mask), 1)


def loss_and_metrics(
    cfg: SimPOConfig,
    all_logits: jax.Array,   # [2B, T, V] (chosen stacked over rejected)
    all_labels: jax.Array,   # [2B, T]
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    b2 = all_logits.shape[0]
    b = b2 // 2
    logps = batch_logps(all_logits, all_labels, average_log_prob=True)
    chosen_logps, rejected_logps = logps[:b], logps[b:]
    losses, chosen_rw, rejected_rw = simpo_loss(cfg, chosen_logps, rejected_logps)
    loss = jnp.mean(losses)
    metrics = {
        "rewards/chosen": jnp.mean(chosen_rw),
        "rewards/rejected": jnp.mean(rejected_rw),
        "rewards/accuracies": jnp.mean((chosen_rw > rejected_rw).astype(jnp.float32)),
        "rewards/margins": jnp.mean(chosen_rw - rejected_rw),
        "logps/chosen": jnp.mean(chosen_logps),
        "logps/rejected": jnp.mean(rejected_logps),
        "logits/chosen": jnp.mean(all_logits[:b]),
        "logits/rejected": jnp.mean(all_logits[b:]),
    }
    if cfg.sft_weight > 0.0:
        sft = sft_cross_entropy(all_logits[:b], all_labels[:b])
        loss = loss + cfg.sft_weight * sft
        metrics["sft_loss"] = sft
    metrics["loss"] = loss
    return loss, metrics
