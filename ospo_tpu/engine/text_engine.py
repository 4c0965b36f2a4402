"""Batched text generation engine (steps 1, 2, 4a).

Replaces HF ``language_model.generate`` (used at
``ospo/wrapper/text_generation.py:63-81``, ``vqa.py:46-58``) with a jitted
prefill + ``lax.while_loop`` decode over a preallocated KV cache:

- left-padded prompt batches, bucketed to multiples of 64 so each
  (B, T_bucket, max_new_tokens) signature compiles once;
- temperature / top-p / greedy sampling inside the loop (fp32 logits);
- per-row EOS tracking with early exit once every row has finished —
  the while_loop stops instead of burning the full token budget.

Returns only the newly generated ids (HF semantics for
``inputs_embeds``-driven generate).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ospo_tpu.models import janus as janus_lib
from ospo_tpu.models import llama
from ospo_tpu.ops.quant import parse_kv_quant
from ospo_tpu.ops.sampling import sample_token
from ospo_tpu.processing import Processor


def _bucket(n: int, step: int = 64) -> int:
    return max(step, ((n + step - 1) // step) * step)


class TextGenEngine:
    def __init__(
        self,
        model: janus_lib.JanusModel,
        processor: Processor,
        max_new_tokens: int = 256,
        temperature: float = 1.0,
        top_p: Optional[float] = None,
        do_sample: bool = True,
        kv_quant: bool = False,
        mesh=None,
        batch_cap: int = None,
    ):
        self.model = model
        self.processor = processor
        self.max_new_tokens = int(max_new_tokens)
        self.temperature = float(temperature)
        self.top_p = top_p
        self.do_sample = bool(do_sample)
        # validate spellings loudly HERE, not only in the config-driven
        # constructor: a direct TextGenEngine(kv_quant="INT4") must error,
        # not silently build an int8 (or bf16) cache at int4-tuned batches
        self.kv_quant = parse_kv_quant(kv_quant)
        # multi-device serving mesh (params sharded by the caller via
        # parallel.mesh.shard_janus_params); batches shard on 'data'
        self.mesh = mesh
        # cap the power-of-two batch bucket at the configured batch size
        # (HBM-tuned; rounding a full batch up re-OOMs the budget)
        self.batch_cap = batch_cap

    @classmethod
    def from_generation_config(cls, model, processor, gen_cfg,
                               kv_quant=False,
                               batch_cap=None) -> "TextGenEngine":
        """Build from a step-config ``generation_config`` block (same keys
        as the HF kwargs the reference passes through).  Inherits the
        model's serving mesh when the factory sharded it; ``kv_quant``
        comes from the step config (int8 cache halves the decode stream
        and the HBM footprint at large text batches)."""
        gen_cfg = gen_cfg or {}
        return cls(
            model,
            processor,
            max_new_tokens=gen_cfg.get("max_new_tokens", 256),
            temperature=gen_cfg.get("temperature", 1.0),
            top_p=gen_cfg.get("top_p"),
            do_sample=gen_cfg.get("do_sample", True),
            # honor int4 too (init_kv_cache supports it) — silently
            # falling back to a bf16 cache would 4x the planned KV HBM,
            # so unknown spellings are an error rather than "off"
            kv_quant=parse_kv_quant(kv_quant),
            mesh=getattr(model, "mesh", None),
            batch_cap=batch_cap,
        )

    # ------------------------------------------------------------------
    @functools.partial(
        jax.jit, static_argnums=(0,),
        static_argnames=("max_new", "do_sample", "top_p"),
    )
    def _generate(self, params, tokens, attn_mask, rng, temperature,
                  *, max_new: int, do_sample: bool, top_p: Optional[float]):
        cfg = self.model.cfg
        b, t_prompt = tokens.shape
        s_max = t_prompt + max_new
        eos = self.processor.tokenizer.eos_id

        inputs_embeds = janus_lib.embed_text(params, tokens)
        positions = llama.positions_from_mask(attn_mask)
        kv = llama.init_kv_cache(cfg.language, b, s_max, quantized=self.kv_quant)
        hidden, kv = janus_lib.language_forward(
            params, cfg, inputs_embeds, attn_mask, positions,
            kv_cache=kv, self_attn=True,
        )
        prompt_len = jnp.sum(attn_mask, axis=-1)
        window_mask = jnp.concatenate(
            [attn_mask, jnp.ones((b, max_new), attn_mask.dtype)], axis=-1
        )

        def sample(hidden_last, key, done):
            logits = janus_lib.lm_logits(params, hidden_last[:, None, :])[:, 0]
            tok = sample_token(key, logits, temperature=temperature,
                               top_p=top_p, do_sample=do_sample)
            return jnp.where(done, eos, tok)

        keys = jax.random.split(rng, max_new)
        out_buf = jnp.full((b, max_new), eos, jnp.int32)
        done0 = jnp.zeros((b,), bool)

        tok0 = sample(hidden[:, -1], keys[0], done0)
        out_buf = out_buf.at[:, 0].set(tok0)
        done = done0 | (tok0 == eos)

        def cond_fn(state):
            step, _, _, done, _ = state
            return (step < max_new) & ~jnp.all(done)

        def body_fn(state):
            step, kv, prev_tok, done, out_buf = state
            embeds = janus_lib.embed_text(params, prev_tok[:, None])
            pos = (prompt_len + step - 1)[:, None]
            hidden, kv = janus_lib.language_forward(
                params, cfg, embeds, window_mask, pos, kv_cache=kv,
            )
            key = keys[step]
            tok = sample(hidden[:, -1], key, done)
            out_buf = jax.lax.dynamic_update_slice(out_buf, tok[:, None], (0, step))
            done = done | (tok == eos)
            return step + 1, kv, tok, done, out_buf

        _, _, _, _, out_buf = jax.lax.while_loop(
            cond_fn, body_fn, (jnp.int32(1), kv, tok0, done, out_buf)
        )
        return out_buf

    # ------------------------------------------------------------------
    def _batch_bucket(self, b_real: int) -> int:
        """Batch bucket: powers of two (ragged final batches reuse the
        compiled program), capped at the HBM-tuned serving batch, rounded
        up to the mesh's data-axis size.  ONE formula shared by
        :meth:`signature_for` and :meth:`generate_ids` — if they drifted,
        prewarm would AOT-compile a program the dispatch never uses and
        the first real batch would pay the cold compile anyway."""
        from ospo_tpu.parallel import mesh as mesh_lib

        b = 1 << (b_real - 1).bit_length()
        if self.batch_cap:
            b = min(b, max(self.batch_cap, b_real))
        dp = mesh_lib.data_parallel_size(self.mesh)
        return ((b + dp - 1) // dp) * dp

    def signature_for(self, prompts: Sequence[str]) -> tuple:
        """The (batch_bucket, prompt_bucket) compile signature
        ``generate_ids`` will use for this batch — feed to :meth:`prewarm`.
        Only the MAX encoded length matters (left-pad target), so this
        skips building the padded arrays generate_ids will rebuild."""
        tok = self.processor.tokenizer
        t_max = max(len(tok.encode(p)) for p in prompts)
        return self._batch_bucket(len(prompts)), _bucket(t_max)

    def prewarm(self, signatures, max_workers: int = 4) -> int:
        """AOT-compile the decode program for each distinct
        (batch_bucket, prompt_bucket) signature ahead of the data loop,
        overlapping compilations in a thread pool (XLA compiles outside
        the GIL, so distinct signatures compile concurrently instead of
        serializing the first pipeline pass; later ``generate`` calls hit
        the compilation cache).  The reference has no equivalent — HF
        ``generate`` pays eager dispatch every call.  Returns the number
        of distinct programs compiled."""
        import concurrent.futures

        sigs = sorted({(int(b), int(t)) for b, t in signatures})

        def compile_one(sig):
            from ospo_tpu.parallel import mesh as mesh_lib

            b, t = sig
            toks = jnp.zeros((b, t), jnp.int32)
            mask = jnp.ones((b, t), jnp.int32)
            rng = jax.random.PRNGKey(0)
            if self.mesh is not None:
                # match generate_ids' input shardings — an unsharded
                # lowering compiles a DIFFERENT executable and the warm
                # compile is wasted
                toks = mesh_lib.shard_on_axis(toks, self.mesh)
                mask = mesh_lib.shard_on_axis(mask, self.mesh)
                rng = mesh_lib.replicate(rng, self.mesh)
            type(self)._generate.lower(
                self, self.model.params, toks, mask, rng,
                jnp.float32(self.temperature),
                max_new=self.max_new_tokens, do_sample=self.do_sample,
                top_p=self.top_p,
            ).compile()

        if not sigs:
            return 0
        with concurrent.futures.ThreadPoolExecutor(
                min(max_workers, len(sigs))) as ex:
            list(ex.map(compile_one, sigs))
        return len(sigs)

    def generate_ids(self, prompts: Sequence[str], seed: Optional[int] = None,
                     rng: Optional[jax.Array] = None) -> np.ndarray:
        """prompt strings → generated ids [B, max_new_tokens] (eos-filled)."""
        b_real = len(prompts)
        input_ids, mask = self.processor.encode_batch_left_padded(prompts)
        t_bucket = _bucket(input_ids.shape[1])
        pad = t_bucket - input_ids.shape[1]
        if pad:
            input_ids = np.pad(input_ids, ((0, 0), (pad, 0)),
                               constant_values=self.processor.pad_id)
            mask = np.pad(mask, ((0, 0), (pad, 0)))
        from ospo_tpu.parallel import mesh as mesh_lib

        b_bucket = self._batch_bucket(b_real)
        if b_bucket != b_real:
            reps = b_bucket - b_real
            input_ids = np.concatenate(
                [input_ids, np.repeat(input_ids[-1:], reps, 0)])
            mask = np.concatenate([mask, np.repeat(mask[-1:], reps, 0)])
        if rng is None:
            rng = jax.random.PRNGKey(0 if seed is None else seed)
        input_ids, mask = jnp.asarray(input_ids), jnp.asarray(mask)
        if self.mesh is not None:
            input_ids = mesh_lib.shard_on_axis(input_ids, self.mesh)
            mask = mesh_lib.shard_on_axis(mask, self.mesh)
            rng = mesh_lib.replicate(rng, self.mesh)
        out = self._generate(
            self.model.params, input_ids, mask, rng,
            jnp.float32(self.temperature),
            max_new=self.max_new_tokens, do_sample=self.do_sample,
            top_p=self.top_p,
        )
        return np.asarray(out)[:b_real]

    def generate(self, prompts: Sequence[str], seed: Optional[int] = None,
                 rng: Optional[jax.Array] = None) -> List[str]:
        """prompt strings → decoded generations (special tokens stripped)."""
        ids = self.generate_ids(prompts, seed=seed, rng=rng)
        tok = self.processor.tokenizer
        out = []
        for row in ids:
            row = row.tolist()
            if tok.eos_id in row:
                row = row[: row.index(tok.eos_id)]
            out.append(tok.decode(row, skip_special_tokens=True))
        return out
