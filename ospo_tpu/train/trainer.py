"""SimPO trainer (step 5): jitted train step + host loop.

TPU-first restructuring of ``JanusProTrainWrapper`` + Lightning
(``ospo/wrapper/train.py``, ``ospo/utils/train.py``): one jitted step fuses
the whole pipeline the reference runs in python —

  on-device VQ encode of chosen/rejected images → 576 ids each
  → gen-aligner embeds, concat with zero-padded text embeds (labels −100)
  → 2B stacked trunk forward (remat) → gen_head logits → SimPO loss
  → grads over the LoRA adapters only → optax AdamW update

Reference semantics preserved: text positions contribute no loss; the
trunk sees an all-ones attention mask (the reference passes none);
chosen/rejected halves share the text prefix.  Gradient accumulation uses
``optax.MultiSteps``; metrics match train.py:432-443.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ospo_tpu.config import save_config
from ospo_tpu.constants import IGNORE_ID
from ospo_tpu.models import janus as janus_lib
from ospo_tpu.models import llama as llama_lib
from ospo_tpu.models import vqgan
from ospo_tpu.ops import pixels as pixels_ops
from ospo_tpu.parallel import mesh as mesh_lib
from ospo_tpu.pipeline.datasets import PreferenceDataset
from ospo_tpu.train import checkpoint as ckpt_lib
from ospo_tpu.train import lora as lora_lib
from ospo_tpu.train.optim import build_optimizer, cosine_decay_warmup
from ospo_tpu.train.simpo import SimPOConfig, loss_and_metrics


def _bucket(n: int, step: int = 32) -> int:
    return max(step, ((n + step - 1) // step) * step)


def _parse_quantize_base(value):
    """Normalize ``experiment.quantize_base`` to None | "int8" | "w8a8".

    Unknown spellings raise (project convention: a silently-ignored
    quantize knob changes HBM by GBs at the tuned batch sizes).  int4
    modes are deliberately NOT offered here — their training-gradient
    behavior is untested."""
    if value is None or value is False:
        return None
    if value is True:
        return "int8"
    s = str(value).strip().lower()
    if s in ("", "none", "false", "bf16", "0", "off"):
        return None
    if s in ("true", "1", "on"):
        return "int8"
    if s in ("int8", "w8a8"):
        return s
    raise ValueError(
        f"unrecognized quantize_base value {value!r}: use int8, w8a8, "
        "true (= int8), or false/unset (bf16 trunk)")


class SimPOTrainer:
    def __init__(self, config, model: janus_lib.JanusModel, processor):
        self.config = config
        self.model = model
        self.processor = processor
        self._t_pad = None          # run-level text bucket, set by fit()

        algo = config.get("algo") or {}
        self.simpo_cfg = SimPOConfig(
            beta=float(algo.get("beta", 1.0)),
            gamma_beta_ratio=float(algo.get("gamma_beta_ratio", 0.0)),
            label_smoothing=float(algo.get("label_smoothing", 0.0)),
            sft_weight=float(algo.get("sft_weight", 0.0)),
            loss_type=algo.get("loss_type", "sigmoid"),
        )

        self.use_peft = bool(config.get("use_peft", True))
        lcfg = config.get("lora") or {}
        self.lora_cfg = lora_lib.LoraConfig(
            rank=int(lcfg.get("lora_rank", 32)),
            alpha=int(lcfg.get("lora_alpha", 64)),
            dropout=float(lcfg.get("lora_dropout", 0.05)),
            target_modules=tuple(
                lcfg.get("target_modules") or lora_lib.DEFAULT_TARGETS
            ),
        )

        exp = config.get("experiment") or {}
        opt_cfg = config.get("optimizer") or {}
        self.max_steps = int(exp.get("max_training_steps") or 1000)
        self.save_steps = exp.get("save_steps")
        self.log_steps = int(exp.get("log_steps") or 10)
        self.grad_accum = int(exp.get("gradient_accumulation_steps") or 1)
        self.remat = bool(exp.get("gradient_checkpointing", True))
        self.seed = int(exp.get("seed", 42))

        self.init_lr = float(opt_cfg.get("init_lr", 4e-5))
        scheduler_type = opt_cfg.get("scheduler_type", "constant")
        warmup_ratio = float(exp.get("warmup_ratio") or 0.0)
        min_lr = float(opt_cfg.get("min_lr") or 1e-6)
        self.tx = build_optimizer(
            init_lr=self.init_lr,
            betas=tuple(opt_cfg.get("betas", (0.9, 0.95))),
            weight_decay=float(opt_cfg.get("weight_decay") or 0.0),
            eps=float(opt_cfg.get("eps") or 1e-8),
            scheduler_type=scheduler_type,
            max_steps=self.max_steps,
            warmup_ratio=warmup_ratio,
            min_lr=min_lr,
            grad_clip=exp.get("gradient_clip_val", 1.0),
            accumulation_steps=self.grad_accum,
        )
        # logged LR must come from the SAME schedule the optimizer uses
        if scheduler_type == "constant":
            self._lr_fn = lambda s: self.init_lr
        elif scheduler_type == "cosine_restarts":
            from ospo_tpu.train.optim import cosine_annealing_warmup_restarts

            sched = cosine_annealing_warmup_restarts(
                first_cycle_steps=self.max_steps, max_lr=self.init_lr,
                min_lr=min_lr,
                warmup_steps=int(self.max_steps * warmup_ratio),
            )
            self._lr_fn = lambda s: float(sched(s))
        else:
            sched = cosine_decay_warmup(
                self.init_lr, int(self.max_steps * warmup_ratio),
                self.max_steps, min_lr,
            )
            self._lr_fn = lambda s: float(sched(s))

        base = config.get("base") or {}
        self.save_path = base.get("save_path") or "./checkpoints/simpo"
        exp_name = base.get("exp_name") or "ospo"
        self.log_dir = os.path.join(self.save_path, exp_name)

        # trainable state — either LoRA adapters (use_peft) or the unfrozen
        # submodules of the freeze matrix (full finetune, train.py:148-216)
        if self.use_peft:
            wq = model.params["language_model"]["layers"]["wq"]
            already_quantized = isinstance(wq, dict)
            qb_mode = _parse_quantize_base(exp.get("quantize_base"))
            if qb_mode and already_quantized:
                # the trunk was quantized upstream (factory / init) — it
                # must match the MODE this config asks to train with, or
                # the run silently measures/trains a different trunk
                # (worse: a pre-quantized int4 trunk would train through
                # the deliberately-unoffered int4 gradient path)
                have = ("w8a8" if "sa" in wq
                        else "int8" if set(wq) == {"q", "s"} else "int4*")
                if have != qb_mode:
                    raise ValueError(
                        f"experiment.quantize_base={qb_mode!r} but the "
                        f"model's trunk is already {have}-quantized — "
                        "rebuild the model unquantized (quantize: none) "
                        "or align the two settings")
            if qb_mode and not already_quantized:
                # QLoRA-style memory lever (beyond the reference): the
                # frozen trunk's projections go int8 — W8A16 (~6.6GB saved
                # at 7B → roughly double the train batch) or W8A8 (same
                # bytes + the MXU's 2× int8 rate on the compute-bound 2B
                # concatenated forward; STE backward, ops/quant.py); LoRA
                # matmuls and grads stay bf16/fp32, the quantized base is
                # a constant in the backward pass.  embed/norms stay bf16.
                from ospo_tpu.ops import quant

                # incremental per-matrix quantize + explicit deletes: a
                # whole-tree donated jit would be fine on a well-behaved
                # backend, but the tunneled chip IGNORES donation, so
                # bf16+int8 would co-reside (~20 GB at 7B) and OOM — same
                # fix as the model factory's post-load quantize
                model.params = {
                    **model.params,
                    "language_model": quant.quantize_llama_params_incremental(
                        model.params["language_model"], mode=qb_mode),
                }
            self.trainable = lora_lib.init_lora(
                model.cfg.language, self.lora_cfg, jax.random.PRNGKey(self.seed)
            )
        else:
            freeze = dict(exp.get("freeze") or {})
            self.trainable_keys = sorted(
                k for k in model.params if not freeze.get(k, True)
            )
            if not self.trainable_keys:
                raise ValueError("full-finetune mode with everything frozen")
            self.trainable = {k: model.params[k] for k in self.trainable_keys}
            # frozen/trainable must be buffer-disjoint: the train step
            # donates the trainable tree, so aliased base entries would be
            # dead buffers on the next call
            self.frozen_params = {
                k: v for k, v in model.params.items()
                if k not in self.trainable_keys
            }
        # serving/train mesh from the factory (`tensor_parallel` /
        # `data_parallel` in the model config): shard the trainable tree
        # up front so the optimizer state inherits the layouts; batches
        # shard on 'data' in fit().  dryrun/test paths that shard
        # externally are unaffected (re-sharding is idempotent).
        self.mesh = getattr(model, "mesh", None)
        if self.mesh is not None:
            if self.use_peft:
                self.trainable = mesh_lib.shard_lora_params(
                    self.trainable, self.mesh)
            else:
                self.trainable = mesh_lib.shard_trainable_params(
                    self.trainable, self.mesh)
        # multi-process (multi-host pod) training: every process runs this
        # same trainer over the SAME dataset order (seeded), builds the
        # identical global batch, and shards it over the global mesh —
        # GSPMD then all-reduces the gradients over ICI/DCN.  This is the
        # reference's Lightning-DDP train contract (ospo/utils/train.py)
        # expressed as one global (data, model) mesh; launch via
        # scripts/run_multihost.sh.
        self.n_proc = jax.process_count()
        self.is_main = jax.process_index() == 0
        if self.n_proc > 1 and self.mesh is None:
            raise ValueError(
                "multi-process training needs a global device mesh: set "
                "model.data_parallel (and optionally model.tensor_parallel) "
                "so the factory shards the weights over all processes' "
                "devices")
        if self.n_proc > 1 and self.mesh.devices.size != len(jax.devices()):
            # a per-process (mesh_scope: local) mesh would pass the check
            # above but silently train the full batch on every process —
            # N× duplicated compute with no gradient all-reduce
            raise ValueError(
                f"multi-process training needs a mesh over ALL "
                f"{len(jax.devices())} global devices, got one over "
                f"{self.mesh.devices.size} (a config with "
                f"model.mesh_scope: local? step 5 requires 'global')")
        self.opt_state = self.tx.init(self.trainable)
        self.global_step = 0
        # training attention: XLA by default (at SimPO's ~640-token sequences
        # it matches the flash kernel's speed); set experiment.attn_impl=flash
        # for long-sequence runs where the O(T²) scores matrix pressures HBM —
        # the flash kernel is fully differentiable (custom VJP)
        self.attn_impl = exp.get("attn_impl", "xla")

        self._writer = None

    @property
    def lora_tree(self):
        return self.trainable if self.use_peft else None

    @lora_tree.setter
    def lora_tree(self, value):
        assert self.use_peft
        self.trainable = value

    # ------------------------------------------------------------------
    # preprocessing (host): variable-length text → bucketed arrays
    # ------------------------------------------------------------------
    def collate(self, items: List[Dict]) -> Dict[str, np.ndarray]:
        # one static bucket per RUN when fit() has seen the dataset
        # (self._t_pad): per-batch buckets made shuffled short/long batches
        # dispatch different shapes — up to 6 XLA signatures (~100 s remote
        # compile each) billed to "steady state" in the r5 integrated round
        # (0.537 samples/s vs the 2.04 single-shape POINT, ROUND_r05.json)
        t_max = self._t_pad or _bucket(
            max(len(it["text_tokens"]) for it in items))
        b = len(items)
        text_ids = np.zeros((b, t_max), np.int32)
        text_mask = np.zeros((b, t_max), np.float32)
        for i, it in enumerate(items):
            ids = it["text_tokens"]
            text_ids[i, : len(ids)] = ids       # right padding (train.py:237-239)
            text_mask[i, : len(ids)] = 1.0
        return {
            "text_ids": text_ids,
            "text_mask": text_mask,
            "chosen_pixels": np.stack([it["chosen_pixels"] for it in items]),
            "rejected_pixels": np.stack([it["rejected_pixels"] for it in items]),
        }

    # ------------------------------------------------------------------
    # jitted step
    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1, 2))
    def _jit_step(self, trainable, opt_state, frozen_params, text_ids,
                  text_mask, chosen_pixels, rejected_pixels, rng=None):
        """``frozen_params`` must be passed explicitly — closing over the
        model tree would bake ~13GB of weights into the lowered program as
        constants.  It is buffer-disjoint from ``trainable`` (which is
        donated)."""
        cfg = self.model.cfg
        b = text_ids.shape[0]

        def assemble(trainable):
            if self.use_peft:
                return frozen_params, trainable
            return {**frozen_params, **trainable}, None

        # frozen VQ tokenizer: images → codebook ids (train.py:253-258)
        vq_params, _ = assemble(jax.lax.stop_gradient(trainable))
        pixels = jnp.concatenate([chosen_pixels, rejected_pixels], axis=0)
        # dataset batches arrive uint8 (4x fewer transfer bytes);
        # float inputs (bench, entry, tests) pass through unchanged
        pixels = pixels_ops.normalize_pixels(
            pixels, self.processor.image_processor)
        img_ids = jax.lax.stop_gradient(
            vqgan.encode_to_ids(vq_params["gen_vision_model"], cfg.vq, pixels)
        )                                                       # [2B, 576]

        def loss_fn(trainable):
            params, lora_tree = assemble(trainable)
            text_embeds = janus_lib.embed_text(params, text_ids)
            text_embeds = text_embeds * text_mask[..., None]    # zero-pad embeds
            text_2b = jnp.concatenate([text_embeds, text_embeds], axis=0)
            img_embeds = janus_lib.prepare_gen_img_embeds(params, cfg, img_ids)
            seq = jnp.concatenate([text_2b, img_embeds], axis=1)

            t_total = seq.shape[1]
            attn = jnp.ones((2 * b, t_total), jnp.int32)
            pos = jnp.broadcast_to(jnp.arange(t_total), (2 * b, t_total))
            hidden, _ = llama_lib.forward(
                params["language_model"], cfg.language, seq, attn, pos,
                lora=lora_tree, lora_scaling=self.lora_cfg.scaling,
                lora_dropout=self.lora_cfg.dropout if self.use_peft else 0.0,
                lora_dropout_rng=rng,
                remat=self.remat,
                attn_impl=self.attn_impl,
            )
            logits = janus_lib.gen_logits(params, hidden)        # [2B, T, 16384]

            text_labels = jnp.full((2 * b, text_ids.shape[1]), IGNORE_ID, jnp.int32)
            labels = jnp.concatenate([text_labels, img_ids.astype(jnp.int32)], axis=1)
            return loss_and_metrics(self.simpo_cfg, logits, labels)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        if not self.use_peft and "gen_vision_model" in grads:
            # the VQ codebook (token embedding) stays frozen even when the
            # VQ stack is unfrozen (train.py:161-168)
            grads["gen_vision_model"]["codebook"] = jnp.zeros_like(
                grads["gen_vision_model"]["codebook"]
            )
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = self.tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, metrics

    def _step(self, trainable, opt_state, text_ids, text_mask,
              chosen_pixels, rejected_pixels, rng=None):
        frozen = self.model.params if self.use_peft else self.frozen_params
        return self._jit_step(trainable, opt_state, frozen,
                              text_ids, text_mask, chosen_pixels,
                              rejected_pixels, rng=rng)

    # ------------------------------------------------------------------
    # host loop
    # ------------------------------------------------------------------
    def writer(self):
        if self._writer is None:
            from tensorboardX import SummaryWriter

            os.makedirs(self.log_dir, exist_ok=True)
            self._writer = SummaryWriter(self.log_dir)
        return self._writer

    def resume(self, ckpt_path: str) -> None:
        tree, lora_cfg, step, opt_flat = ckpt_lib.load_checkpoint(ckpt_path)
        self.trainable = jax.tree.map(jnp.asarray, tree)
        if self.mesh is not None:
            self.trainable = (
                mesh_lib.shard_lora_params(self.trainable, self.mesh)
                if self.use_peft else
                mesh_lib.shard_trainable_params(self.trainable, self.mesh))
        if self.use_peft:
            self.lora_cfg = lora_cfg
        self.global_step = step
        if opt_flat is not None:
            # path-keyed restore into the freshly-initialised optax structure
            self.opt_state = ckpt_lib.apply_flat(self.opt_state, opt_flat)
        print(f"# Resumed from {ckpt_path} at step {step}.")

    def _replicated(self, tree):
        """All-gather a cross-process-sharded tree into full per-process
        replicas (a jitted identity with replicated out-shardings) so the
        host can serialize it — one full copy per device, fine at LoRA /
        trainable-subtree sizes."""
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(self.mesh, PartitionSpec())
        return jax.jit(
            lambda t: t,
            out_shardings=jax.tree.map(lambda _: rep, tree))(tree)

    def save(self) -> str:
        trainable, opt_state = self.trainable, self.opt_state
        if self.n_proc > 1:
            # collective: every process participates in the gather, only
            # process 0 touches the filesystem
            trainable = self._replicated(trainable)
            opt_state = self._replicated(opt_state)
            if not self.is_main:
                return ""
        path = ckpt_lib.save_checkpoint(
            self.log_dir, self.global_step, trainable, self.lora_cfg,
            opt_state=opt_state,
            mode="lora" if self.use_peft else "full",
        )
        print(f"# Saved checkpoint: {path}")
        return path

    def fit(self, dataset: PreferenceDataset, batch_size: int,
            max_epochs: int = 1) -> Dict[str, float]:
        if self.is_main:
            save_config(self.log_dir, self.config)
        # pin ONE text bucket for the whole run (see collate) — a host
        # tokenization pass, no image IO
        if hasattr(dataset, "max_text_len"):
            self._t_pad = _bucket(dataset.max_text_len())
        last_metrics: Dict[str, float] = {}
        t0 = time.time()
        samples = 0
        # compile/steady split (VERDICT r4 #3/#7): the first optimizer
        # update's log forces a metrics sync, so its wall time bounds the
        # train-step compile; everything after is steady-state
        first_update_s = None
        first_update_samples = 0
        # single-worker prefetch: the NEXT batch's host work overlaps the
        # current device step.  The worker owns the dataset iterator, so
        # the expensive part — PreferenceDataset.__getitem__'s PNG decode
        # + image preprocessing, which runs lazily at next() — happens on
        # the worker too, not just the cheap collate stack.
        from ospo_tpu.utils.prefetch import prefetch_iter

        dp = (mesh_lib.data_parallel_size(self.mesh)
              if self.mesh is not None else 1)
        # global_step counts OPTIMIZER updates (Lightning max_steps
        # semantics): with gradient accumulation, optax.MultiSteps applies
        # one update per grad_accum micro-batches, so counting micro-
        # batches would run 1/k of the reference's updates and leave the
        # cosine schedule (stepped per update) stuck near init_lr.  The
        # dropout rng folds the MICRO index so accumulation micro-batches
        # don't share masks.
        micro = self.global_step * self.grad_accum
        for epoch in range(max_epochs):
            if self.global_step >= self.max_steps:
                break  # don't decode a prefetch batch for a no-op epoch
            for batch_items, batch in prefetch_iter(dataset.iter_batches(
                batch_size, shuffle=True, seed=self.seed + epoch
            ), self.collate):
                if self.global_step >= self.max_steps:
                    break
                arrs = {k: batch[k] for k in (
                    "text_ids", "text_mask",
                    "chosen_pixels", "rejected_pixels")}
                rem = len(batch_items) % dp
                if rem and self.n_proc > 1:
                    # a process-local array can't express a global batch,
                    # so a ragged final batch is padded by repeating its
                    # last row (DistributedSampler-style duplication; only
                    # that batch's mean loss is slightly reweighted)
                    pad = dp - rem
                    arrs = {k: np.concatenate(
                        [v, np.repeat(v[-1:], pad, axis=0)])
                        for k, v in arrs.items()}
                    rem = 0
                if self.mesh is not None and rem == 0:
                    arrs = mesh_lib.shard_batch(arrs, self.mesh)
                else:  # ragged final batch: let GSPMD place it
                    arrs = {k: jnp.asarray(v) for k, v in arrs.items()}
                self.trainable, self.opt_state, metrics = self._step(
                    self.trainable, self.opt_state,
                    arrs["text_ids"], arrs["text_mask"],
                    arrs["chosen_pixels"], arrs["rejected_pixels"],
                    rng=jax.random.fold_in(
                        jax.random.PRNGKey(self.seed), micro
                    ),
                )
                micro += 1
                samples += len(batch_items)
                if micro % self.grad_accum:
                    continue  # accumulation micro-batch — no update yet
                self.global_step += 1

                if (self.global_step % self.log_steps == 0
                        or self.global_step == 1) and self.is_main:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    if first_update_s is None:
                        first_update_s = time.time() - t0
                        first_update_samples = samples
                    metrics["lr"] = self._lr_fn(self.global_step)
                    metrics["samples_per_sec"] = samples / (time.time() - t0)
                    w = self.writer()
                    for k, v in metrics.items():
                        w.add_scalar(f"train/{k}", v, self.global_step)
                    print(
                        f"step {self.global_step}: loss={metrics['loss']:.4f} "
                        f"acc={metrics['rewards/accuracies']:.3f} "
                        f"margin={metrics['rewards/margins']:.4f} "
                        f"{metrics['samples_per_sec']:.2f} samples/s"
                    )
                    last_metrics = metrics

                if self.save_steps and self.global_step % int(self.save_steps) == 0:
                    self.save()
        self.save()
        if self._writer is not None:
            self._writer.flush()
        if self.is_main:
            total_s = time.time() - t0
            steady_s = total_s - (first_update_s or 0.0)
            steady_n = samples - first_update_samples
            stats = {
                "first_update_s": round(first_update_s or 0.0, 1),
                "total_s": round(total_s, 1),
                "samples": samples,
                "samples_per_s_wall": round(samples / total_s, 3)
                if total_s > 0 else 0.0,
                "samples_per_s_steady": round(steady_n / steady_s, 3)
                if steady_s > 0 and steady_n > 0 else None,
            }
            try:
                import json

                with open(os.path.join(self.log_dir,
                                       "train_stats.json"), "w") as f:
                    json.dump(stats, f, indent=1)
            except OSError as e:  # diagnostics, never fail training
                print(f"# train_stats.json not written: {e}")
        return last_metrics
