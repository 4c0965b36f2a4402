"""SimPO loss math vs a direct torch transcription of the reference
(train.py:317-396), plus LoRA merge semantics and a tiny end-to-end
training smoke test."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as tF

from ospo_tpu.constants import IGNORE_ID
from ospo_tpu.train import lora as lora_lib
from ospo_tpu.train.simpo import SimPOConfig, batch_logps, simpo_loss


def ref_get_batch_logps(logits, labels, label_pad=-100):
    labels = labels[:, 1:].clone()
    logits = logits[:, :-1, :]
    loss_mask = labels != label_pad
    labels[labels == label_pad] = 0
    per_tok = torch.gather(
        logits.log_softmax(-1), dim=2, index=labels.unsqueeze(2)
    ).squeeze(2)
    return (per_tok * loss_mask).sum(-1) / loss_mask.sum(-1)


def ref_simpo_loss(c_logps, r_logps, beta, gamma_beta_ratio, ls=0.0):
    logits = (c_logps - r_logps) - gamma_beta_ratio
    losses = (
        -tF.logsigmoid(beta * logits) * (1 - ls)
        - tF.logsigmoid(-beta * logits) * ls
    )
    return losses, beta * c_logps.detach(), beta * r_logps.detach()


def test_batch_logps_matches_reference():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 10, 16)).astype(np.float32)
    labels = rng.integers(0, 16, (4, 10))
    labels[:, :3] = IGNORE_ID

    ours = batch_logps(jnp.asarray(logits), jnp.asarray(labels))
    ref = ref_get_batch_logps(torch.tensor(logits), torch.tensor(labels))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


@pytest.mark.parametrize("ls", [0.0, 0.1])
def test_simpo_loss_matches_reference(ls):
    rng = np.random.default_rng(1)
    c = rng.normal(size=(6,)).astype(np.float32)
    r = rng.normal(size=(6,)).astype(np.float32)
    cfg = SimPOConfig(beta=10.0, gamma_beta_ratio=0.5, label_smoothing=ls)
    losses, crw, rrw = simpo_loss(cfg, jnp.asarray(c), jnp.asarray(r))
    ref_losses, ref_crw, ref_rrw = ref_simpo_loss(
        torch.tensor(c), torch.tensor(r), 10.0, 0.5, ls
    )
    np.testing.assert_allclose(np.asarray(losses), ref_losses.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(crw), ref_crw.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rrw), ref_rrw.numpy(), atol=1e-5)


def test_lora_zero_at_init_and_merge():
    from ospo_tpu.models import llama

    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    lcfg = lora_lib.LoraConfig(rank=4, alpha=8)
    tree = lora_lib.init_lora(cfg, lcfg, jax.random.PRNGKey(1))

    ids = jnp.arange(12).reshape(1, 12) % cfg.vocab_size
    x = llama.embed_tokens(params, ids)
    mask = jnp.ones((1, 12), jnp.int32)
    pos = llama.positions_from_mask(mask)
    base, _ = llama.forward(params, cfg, x, mask, pos)
    with_lora, _ = llama.forward(params, cfg, x, mask, pos, lora=tree,
                                 lora_scaling=lcfg.scaling)
    # B = 0 → adapters are a no-op at init
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-6)

    # non-trivial adapters: runtime application == merged weights
    tree = jax.tree.map(
        lambda a: jax.random.normal(jax.random.PRNGKey(2), a.shape) * 0.02, tree
    )
    with_lora, _ = llama.forward(params, cfg, x, mask, pos, lora=tree,
                                 lora_scaling=lcfg.scaling)
    merged = lora_lib.merge(params, tree, lcfg.scaling)
    merged_out, _ = llama.forward(merged, cfg, x, mask, pos)
    np.testing.assert_allclose(
        np.asarray(with_lora), np.asarray(merged_out), atol=1e-4, rtol=1e-4
    )


def test_checkpoint_roundtrip(tmp_path):
    from ospo_tpu.models import llama
    from ospo_tpu.train import checkpoint as ck

    cfg = llama.tiny_config()
    lcfg = lora_lib.LoraConfig(rank=4, alpha=8)
    tree = lora_lib.init_lora(cfg, lcfg, jax.random.PRNGKey(0))
    path = ck.save_checkpoint(str(tmp_path), 7, tree, lcfg)
    loaded, loaded_cfg, step, _ = ck.load_checkpoint(str(tmp_path))
    assert step == 7 and loaded_cfg.rank == 4
    for name in tree:
        np.testing.assert_array_equal(
            np.asarray(tree[name]["a"]), loaded[name]["a"]
        )
    assert path.endswith("step_000007")


def test_lora_init_bound_matches_peft():
    """peft kaiming_uniform_(a=√5) on A[r, d_in] → bound 1/√d_in (gain
    √(1/3) × √(3/fan_in)); √3 wider would run early adapter learning
    ~1.73× hotter than the reference trainer."""
    from ospo_tpu.models.llama import tiny_config
    cfg = tiny_config()
    lcfg = lora_lib.LoraConfig(rank=4, alpha=8)
    tree = lora_lib.init_lora(cfg, lcfg, jax.random.PRNGKey(0))
    a = np.asarray(tree["q_proj"]["a"])
    d_in = cfg.hidden_size
    bound = 1.0 / d_in ** 0.5
    assert np.abs(a).max() <= bound + 1e-7
    # uniform(-b, b) std = b/√3; loose 15% tolerance on the sample std
    assert abs(a.std() - bound / 3 ** 0.5) < 0.15 * bound / 3 ** 0.5
    assert not np.asarray(tree["q_proj"]["b"]).any()


def test_janus_init_quantize_spelling_validated():
    from ospo_tpu.models import janus as janus_lib
    with pytest.raises(ValueError, match="quantize"):
        janus_lib.JanusModel.init(janus_lib.tiny_janus_config(),
                                  quantize="int4x")
