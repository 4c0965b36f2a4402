"""Batched text generation engine (steps 1, 2, 4a).

Replaces HF ``language_model.generate`` (used at
``ospo/wrapper/text_generation.py:63-81``, ``vqa.py:46-58``) with a jitted
prefill + ``lax.while_loop`` decode over a preallocated KV cache:

- left-padded prompt batches, bucketed to multiples of 64 so each
  (B, T_bucket, max_new_tokens) signature compiles once;
- temperature / top-p / greedy sampling inside the loop (fp32 logits);
- per-row EOS tracking with early exit once every row has finished —
  the while_loop stops instead of burning the full token budget;
- shared-prefix decode: the batch's common token prefix (the few-shot
  template — step 1 repeats ONE prompt verbatim) prefills once at B=1
  and is read as a batch-shared attention segment, so its KV costs 1/B
  the HBM and is streamed once per decode step instead of per row
  (exact math — ``llama.forward(prefix_kv=...)``; tests in
  ``test_shared_prefix.py``).

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


def _bucket_tail(n: int) -> int:
    """Per-row sequence bucket (tails and plain prompts): 64-token steps
    up to 512, 256-token steps beyond.  Long DISTINCT tails only occur
    when a batch's rows do not share a template (template-impure batches;
    step-2b worst cases) — there the fine 64-step grid spread production
    lengths over many (960/1280/1344/1408…) signatures, each a slow
    remote compile on the tunneled chip (VERDICT r4 #4); coarsening
    collapses them to ~3 signatures at ≤256 pad tokens of extra prefill."""
    return _bucket(n) if n <= 512 else _bucket(n, step=256)


def _compile_helper_crash(e: Exception) -> bool:
    """True for the tunneled remote-compile service's per-shape crash
    (HTTP 500 / helper subprocess death).  Deliberately NARROW: OOMs
    (RESOURCE_EXHAUSTED) and every other runtime error stay loud —
    splitting a batch can only fix a compiler-service defect, and
    masking anything else would hide real bugs behind silent retries."""
    s = str(e)
    return ("remote_compile" in s and "HTTP 500" in s
            and "RESOURCE_EXHAUSTED" not in s)


def _splittable_failure(e: Exception) -> bool:
    """Failures a half-sized batch genuinely fixes: the compile helper's
    per-shape crash (its AOT pass also rejects programs over the HBM
    budget with the same HTTP 500) and execution RESOURCE_EXHAUSTED —
    the per-row KV cache dominates text-decode HBM, so half the rows is
    half the cache.  Everything else stays loud."""
    return _compile_helper_crash(e) or "RESOURCE_EXHAUSTED" in str(e)


class TextGenEngine:
    # prompts whose common token prefix is shorter than this run the plain
    # path — below it the shared-prefix program's extra B=1 prefill pass
    # outweighs the savings
    SHARED_PREFIX_MIN = 64

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
        shared_prefix: Optional[bool] = None,
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
        # shared-prefix decode (steps 1/2/4a batch few-shot prompts whose
        # template prefix is identical across rows): the prefix KV is
        # prefilled ONCE at batch 1 and read as a batch-shared attention
        # segment — 1/B the prefix prefill FLOPs, 1/B its cache HBM, and
        # the decode loop streams it once per step instead of B times.
        # Exact math (joint softmax; parity test in test_text_engine.py).
        # None → on, unless OSPO_SHARED_PREFIX=0
        if shared_prefix is None:
            import os
            shared_prefix = os.environ.get("OSPO_SHARED_PREFIX", "1") != "0"
        self.shared_prefix = bool(shared_prefix)
        # signatures whose compile deterministically crashes the tunneled
        # remote-compile helper (HTTP 500 — a per-shape backend bug, NOT
        # an OOM; e.g. step-2b's (shared, 32, 128, 1536) dense-phase
        # shape).  Dispatch splits such batches in half and retries —
        # the halves' smaller programs compile — instead of killing a
        # multi-hour pipeline stage on a compiler-service defect.
        self._poisoned_sigs: set = set()
        # per-signature dispatch timing → stage compile/steady split
        # (profiling.DispatchStats; dumped as engine_stats.json)
        from ospo_tpu.utils.profiling import DispatchStats

        self.dispatch_stats = DispatchStats()

    @classmethod
    def from_generation_config(cls, model, processor, gen_cfg,
                               kv_quant=False,
                               batch_cap=None,
                               shared_prefix=None) -> "TextGenEngine":
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
            shared_prefix=shared_prefix,
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
        return self._decode_loop(params, kv, hidden, prompt_len, window_mask,
                                 rng, temperature, max_new=max_new,
                                 do_sample=do_sample, top_p=top_p)

    @functools.partial(
        jax.jit, static_argnums=(0,),
        static_argnames=("max_new", "do_sample", "top_p"),
    )
    def _generate_shared(self, params, prefix_ids, prefix_mask, tail_ids,
                         tail_mask, rng, temperature,
                         *, max_new: int, do_sample: bool,
                         top_p: Optional[float]):
        """Shared-prefix variant of :meth:`_generate` — ONE program (the
        prefix KV never crosses a jit boundary, so layout assignment
        unifies the B=1 prefill writes with every downstream reader):

        1. the common token prefix (few-shot template) prefills at B=1
           into a bf16 cache — stored ONCE, 1/B the HBM of the plain path
           (bf16 regardless of ``kv_quant``: at 1/B footprint the halving
           is irrelevant and the longest context segment keeps full
           precision);
        2. per-row tails prefill into a per-row cache holding ONLY
           tail + generated rows, attending to the shared segment via
           ``prefix_kv`` (joint softmax — exact math);
        3. the decode loop streams the shared segment once per step
           instead of once per row."""
        cfg = self.model.cfg
        b, t_tail = tail_ids.shape

        c_b = prefix_ids.shape[1]
        pkv = llama.init_kv_cache(cfg.language, 1, c_b)
        p_embeds = janus_lib.embed_text(params, prefix_ids)
        p_pos = llama.positions_from_mask(prefix_mask)
        _, pkv = janus_lib.language_forward(
            params, cfg, p_embeds, prefix_mask, p_pos,
            kv_cache=pkv, self_attn=True,
        )
        prefix = {"k": pkv["k"][:, 0], "v": pkv["v"][:, 0],
                  "mask": prefix_mask}                    # [L, C, H, Dh] ×2
        prefix_len = jnp.sum(prefix_mask)                 # same every row

        kv = llama.init_kv_cache(cfg.language, b, t_tail + max_new,
                                 quantized=self.kv_quant)
        t_embeds = janus_lib.embed_text(params, tail_ids)
        # rotary positions continue AFTER the prefix
        t_pos = prefix_len + llama.positions_from_mask(tail_mask)
        hidden, kv = janus_lib.language_forward(
            params, cfg, t_embeds, tail_mask, t_pos,
            kv_cache=kv, self_attn=True, prefix_kv=prefix,
        )
        prompt_len = prefix_len + jnp.sum(tail_mask, axis=-1)
        window_mask = jnp.concatenate(
            [tail_mask, jnp.ones((b, max_new), tail_mask.dtype)], axis=-1
        )
        return self._decode_loop(params, kv, hidden, prompt_len, window_mask,
                                 rng, temperature, max_new=max_new,
                                 do_sample=do_sample, top_p=top_p,
                                 prefix=prefix)

    def _decode_loop(self, params, kv, hidden, prompt_len, window_mask,
                     rng, temperature, *, max_new: int, do_sample: bool,
                     top_p: Optional[float], prefix=None):
        """Sampling loop shared by the plain and shared-prefix programs
        (traced inside their jits): per-row EOS tracking, early exit once
        every row finished, eos-filled [B, max_new] output buffer."""
        cfg = self.model.cfg
        b = hidden.shape[0]
        eos = self.processor.tokenizer.eos_id

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
                prefix_kv=prefix,
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

    def _shared_split(self, prompts: Sequence[str]):
        """Host half of the shared-prefix path: tokenize, find the common
        token prefix across the batch, split into (prefix, per-row tails).
        Returns None when the batch should run the plain path (singleton
        batch, or common prefix < SHARED_PREFIX_MIN tokens)."""
        if not self.shared_prefix or len(prompts) < 2:
            return None
        tok = self.processor.tokenizer
        enc = [np.asarray(tok.encode(p), np.int32) for p in prompts]
        minlen = min(len(e) for e in enc)
        stacked = np.stack([e[:minlen] for e in enc])
        neq = (stacked != stacked[0]).any(axis=0)
        common = minlen if not neq.any() else int(np.argmax(neq))
        common = min(common, minlen - 1)  # ≥1 tail token (identical prompts)
        if common < self.SHARED_PREFIX_MIN:
            return None
        c_b = _bucket(common)
        pad_id = self.processor.pad_id
        prefix_ids = np.full((1, c_b), pad_id, np.int32)
        prefix_mask = np.zeros((1, c_b), np.int32)
        prefix_ids[0, c_b - common:] = enc[0][:common]
        prefix_mask[0, c_b - common:] = 1
        t_b = _bucket_tail(max(len(e) - common for e in enc))
        tail_ids = np.full((len(enc), t_b), pad_id, np.int32)
        tail_mask = np.zeros((len(enc), t_b), np.int32)
        for i, e in enumerate(enc):
            t = e[common:]
            tail_ids[i, t_b - len(t):] = t
            tail_mask[i, t_b - len(t):] = 1
        return prefix_ids, prefix_mask, tail_ids, tail_mask

    def signature_for(self, prompts: Sequence[str]) -> tuple:
        """The compile signature ``generate_ids`` will use for this batch —
        feed to :meth:`prewarm`.  Plain path: ``("plain", batch_bucket,
        prompt_bucket)``; shared-prefix path: ``("shared", batch_bucket,
        prefix_bucket, tail_bucket)`` (same split logic as generate_ids,
        so prewarm AOT-compiles the program dispatch will actually use)."""
        split = self._shared_split(prompts)
        if split is not None:
            prefix_ids, _, tail_ids, _ = split
            return ("shared", self._batch_bucket(len(prompts)),
                    prefix_ids.shape[1], tail_ids.shape[1])
        tok = self.processor.tokenizer
        t_max = max(len(tok.encode(p)) for p in prompts)
        return ("plain", self._batch_bucket(len(prompts)), _bucket_tail(t_max))

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

        # legacy (b, t) pairs are plain-path signatures
        sigs = sorted({("plain",) + tuple(int(x) for x in s)
                       if not isinstance(s[0], str)
                       else (s[0],) + tuple(int(x) for x in s[1:])
                       for s in signatures})

        def compile_one(sig):
            from ospo_tpu.parallel import mesh as mesh_lib

            def dev(a, shard_batch=True):
                if self.mesh is None:
                    return a
                # match generate_ids' input shardings — an unsharded
                # lowering compiles a DIFFERENT executable and the warm
                # compile is wasted
                return (mesh_lib.shard_on_axis(a, self.mesh) if shard_batch
                        else mesh_lib.replicate(a, self.mesh))

            rng = dev(jax.random.PRNGKey(0), shard_batch=False)
            if sig[0] == "shared":
                _, b, c, t = sig
                type(self)._generate_shared.lower(
                    self, self.model.params,
                    dev(jnp.zeros((1, c), jnp.int32), shard_batch=False),
                    dev(jnp.ones((1, c), jnp.int32), shard_batch=False),
                    dev(jnp.zeros((b, t), jnp.int32)),
                    dev(jnp.ones((b, t), jnp.int32)),
                    rng, jnp.float32(self.temperature),
                    max_new=self.max_new_tokens, do_sample=self.do_sample,
                    top_p=self.top_p,
                ).compile()
                return
            _, b, t = sig
            type(self)._generate.lower(
                self, self.model.params,
                dev(jnp.zeros((b, t), jnp.int32)),
                dev(jnp.ones((b, t), jnp.int32)),
                rng, jnp.float32(self.temperature),
                max_new=self.max_new_tokens, do_sample=self.do_sample,
                top_p=self.top_p,
            ).compile()

        def compile_guarded(sig):
            # a helper-crash signature must not kill the pipeline stage
            # during warmup: record it so dispatch pre-splits, and let the
            # halves compile lazily (their buckets depend on the actual
            # prompt split, unknowable from the signature alone)
            try:
                compile_one(sig)
                return True
            except jax.errors.JaxRuntimeError as e:
                if not _compile_helper_crash(e):
                    raise
                import sys
                self._poisoned_sigs.add(sig)
                print(f"# prewarm: remote-compile helper crashed on "
                      f"{sig}; dispatch will split such batches",
                      file=sys.stderr)
                return False

        if not sigs:
            return 0
        import time as _time

        t0 = _time.time()
        with concurrent.futures.ThreadPoolExecutor(
                min(max_workers, len(sigs))) as ex:
            n = sum(ex.map(compile_guarded, sigs))
        self.dispatch_stats.add_prewarm(_time.time() - t0)
        return n

    def generate_ids(self, prompts: Sequence[str], seed: Optional[int] = None,
                     rng: Optional[jax.Array] = None) -> np.ndarray:
        """prompt strings → generated ids [B, max_new_tokens] (eos-filled).

        Dispatches to the shared-prefix program when the batch's prompts
        share a ≥SHARED_PREFIX_MIN-token common prefix (few-shot templates
        always do) — same sampling-key schedule and exact attention math,
        so outputs match the plain path up to float reduction order.

        Compile-helper resilience: certain shapes deterministically crash
        the tunneled remote-compile service (HTTP 500, a per-shape backend
        bug distinct from OOM).  Such a batch is split in half and retried
        (each half folds its index into the rng so rows don't repeat
        sampling keys); the signature is remembered so later batches
        pre-split without a doomed compile attempt."""
        if rng is None:
            rng = jax.random.PRNGKey(0 if seed is None else seed)
        if len(prompts) > 1:
            # the signature is only needed to consult/extend the poisoned
            # set — computing it eagerly double-tokenized every batch
            # (signature_for + _generate_ids_once both run _shared_split)
            # even when no shape had ever crashed (ADVICE r4)
            if self._poisoned_sigs and (
                    self.signature_for(prompts) in self._poisoned_sigs):
                return self._generate_ids_halves(prompts, rng)
            try:
                return self._generate_ids_once(prompts, rng)
            except jax.errors.JaxRuntimeError as e:
                if not _splittable_failure(e):
                    raise
                import sys
                sig = self.signature_for(prompts)
                self._poisoned_sigs.add(sig)
                kind = ("remote-compile helper crashed"
                        if _compile_helper_crash(e) else
                        "execution RESOURCE_EXHAUSTED")
                print(f"# text engine: {kind} on signature {sig} — "
                      f"splitting the batch in half (sticky; later "
                      f"batches of this shape pre-split)",
                      file=sys.stderr)
                return self._generate_ids_halves(prompts, rng)
        return self._generate_ids_once(prompts, rng)

    def _generate_ids_halves(self, prompts: Sequence[str],
                             rng: jax.Array) -> np.ndarray:
        """Split dispatch for poisoned compile signatures: two half
        batches (recursive — quarters if a half's shape also crashes),
        per-half rng fold so sampling keys differ across halves."""
        mid = (len(prompts) + 1) // 2
        parts = [self.generate_ids(list(prompts[:mid]),
                                   rng=jax.random.fold_in(rng, 0)),
                 self.generate_ids(list(prompts[mid:]),
                                   rng=jax.random.fold_in(rng, 1))]
        return np.concatenate(parts, axis=0)

    def _generate_ids_once(self, prompts: Sequence[str],
                           rng: jax.Array) -> np.ndarray:
        """Single-program dispatch (shared-prefix or plain).  ``rng`` is
        required — ``generate_ids`` always constructs it first."""
        b_real = len(prompts)
        split = self._shared_split(prompts)
        if split is not None:
            return self._generate_ids_shared(split, b_real, rng=rng)
        input_ids, mask = self.processor.encode_batch_left_padded(prompts)
        t_bucket = _bucket_tail(input_ids.shape[1])
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
        input_ids, mask = jnp.asarray(input_ids), jnp.asarray(mask)
        if self.mesh is not None:
            input_ids = mesh_lib.shard_on_axis(input_ids, self.mesh)
            mask = mesh_lib.shard_on_axis(mask, self.mesh)
            rng = mesh_lib.replicate(rng, self.mesh)
        # signature from the already-padded operands (no re-tokenize)
        with self.dispatch_stats.timed(("plain", b_bucket, t_bucket)):
            out = self._generate(
                self.model.params, input_ids, mask, rng,
                jnp.float32(self.temperature),
                max_new=self.max_new_tokens, do_sample=self.do_sample,
                top_p=self.top_p,
            )
            out = np.asarray(out)
        return out[:b_real]

    def _generate_ids_shared(self, split, b_real: int,
                             rng: jax.Array = None) -> np.ndarray:
        """Device dispatch for the shared-prefix path: pad the tail batch
        to its bucket, shard tails on 'data', replicate the prefix.
        ``rng`` is required (generate_ids constructs it)."""
        from ospo_tpu.parallel import mesh as mesh_lib

        prefix_ids, prefix_mask, tail_ids, tail_mask = split
        b_bucket = self._batch_bucket(b_real)
        if b_bucket != b_real:
            reps = b_bucket - b_real
            tail_ids = np.concatenate(
                [tail_ids, np.repeat(tail_ids[-1:], reps, 0)])
            tail_mask = np.concatenate(
                [tail_mask, np.repeat(tail_mask[-1:], reps, 0)])
        operands = [jnp.asarray(prefix_ids), jnp.asarray(prefix_mask),
                    jnp.asarray(tail_ids), jnp.asarray(tail_mask)]
        if self.mesh is not None:
            operands[0] = mesh_lib.replicate(operands[0], self.mesh)
            operands[1] = mesh_lib.replicate(operands[1], self.mesh)
            operands[2] = mesh_lib.shard_on_axis(operands[2], self.mesh)
            operands[3] = mesh_lib.shard_on_axis(operands[3], self.mesh)
            rng = mesh_lib.replicate(rng, self.mesh)
        sig = ("shared", b_bucket, prefix_ids.shape[1], tail_ids.shape[1])
        with self.dispatch_stats.timed(sig):
            out = self._generate_shared(
                self.model.params, *operands, rng,
                jnp.float32(self.temperature),
                max_new=self.max_new_tokens, do_sample=self.do_sample,
                top_p=self.top_p,
            )
            out = np.asarray(out)
        return out[:b_real]

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
