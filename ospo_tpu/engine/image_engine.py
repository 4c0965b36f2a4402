"""CFG image-token decode engine — the throughput-critical path (step 3).

TPU-first redesign of the reference's 576-iteration python loop
(``ospo/wrapper/image_generation.py:110-191``):

- the cond/uncond pair is one fused batch of 2B rows ([0:B] cond, [B:2B]
  uncond — stacked halves instead of the reference's interleaved rows; the
  math is identical, slicing is cheaper);
- prompt prefill runs once through the flash-attention path, then all 576
  image tokens are generated inside a single ``lax.scan`` holding the KV
  cache — zero host↔device sync until the final token block;
- CFG combine ``uncond + w·(cond − uncond)``, temperature softmax and
  categorical sampling all run inside the scan in fp32;
- prompt lengths are bucketed (multiples of 64) so each (2B, T_bucket)
  combination compiles exactly once;
- the VQ detokeniser (``decode_code``) is a second jitted call.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ospo_tpu.constants import IMAGE_TOKEN_NUM_PER_IMAGE, IMG_SIZE, PATCH_SIZE
from ospo_tpu.models import janus as janus_lib
from ospo_tpu.models import llama, vqgan
from ospo_tpu.processing import Processor, t2i_prompt


def _bucket(n: int, step: int = 64) -> int:
    return max(step, ((n + step - 1) // step) * step)


class ImageGenEngine:
    def __init__(
        self,
        model: janus_lib.JanusModel,
        processor: Processor,
        cfg_weight: float = 5.0,
        temperature: float = 1.0,
        image_token_num: int = IMAGE_TOKEN_NUM_PER_IMAGE,
        img_size: int = IMG_SIZE,
        patch_size: int = PATCH_SIZE,
        batch_bucketing: bool = True,
        kv_quant: bool = False,
        decode_segments: int = 1,
        decode_kernel: bool = False,
        speculative: int = 0,
        kv_layout: str = None,
        mesh=None,
        batch_cap: int = None,
    ):
        self.model = model
        self.processor = processor
        self.cfg_weight = float(cfg_weight)
        self.temperature = float(temperature)
        self.image_token_num = image_token_num
        self.img_size = img_size
        self.patch_size = patch_size
        # pad ragged batches up to powers of two (pipeline-friendly: no
        # retraces); disable when the exact batch size must be respected
        # (e.g. at the HBM limit)
        self.batch_bucketing = batch_bucketing
        # quantized KV cache: True/"int8" halves the decode loop's dominant
        # HBM stream at large batch (cache reads exceed weight reads past
        # ~4 CFG pairs); "int4" quarters it (two heads packed per byte —
        # llama._quantize_rows_int4), raising the OOM-bound serving batch
        # at a quality cost bounded by tests/test_kv_quant.py.  Spellings
        # validate loudly (parse_kv_quant): "INT4"/"int_8"/"yes" must not
        # silently become an int8 cache at int4-tuned batch sizes
        from ospo_tpu.ops.quant import parse_kv_quant

        self.kv_quant = parse_kv_quant(kv_quant)
        # segmented decode: the 576-step loop runs as N scans with growing
        # attention windows, so early segments read only a prefix of the
        # cache. Effectiveness is layout-dependent (the window slice must
        # be copy-free): with the batch-minor "shbd" int8 cache at B=24 on
        # v5e, segments=8 measured 898 tok/s vs 721 unsegmented (+25%);
        # with the position-major "bshd" cache at B=12 it LOST (543.9 →
        # 515.7 tok/s — XLA materialises the slice). Saturates by ~8
        # segments (windows are 64-aligned).
        self.decode_segments = max(1, int(decode_segments))
        # Pallas decode-attention kernel: stream only the populated cache
        # prefix per step (ops/decode_attention.py)
        self.decode_kernel = decode_kernel
        # speculative Jacobi decoding: window size W (0 = sequential).
        # Drafts from the previous Jacobi iterate are verified W-at-a-time
        # with speculative-sampling acceptance (target distribution
        # preserved exactly); batch rows advance unevenly via per-row
        # cache offsets. arXiv:2410.01699 for the algorithm family.
        self.speculative = int(speculative)
        # KV-cache layout (llama.init_kv_cache): default position-major
        # "bshd"; the Pallas kernel needs batch-minor "shbd" (its position
        # blocks are contiguous DMAs there); "shbd" also avoids XLA's
        # in-loop layout copies at very large batch on the non-kernel path
        self.kv_layout = kv_layout or ("shbd" if decode_kernel else "bshd")
        if decode_kernel:
            assert self.kv_layout == "shbd", "decode_kernel needs shbd"
            assert not self.speculative, \
                "decode_kernel does not support speculative decoding"
            assert self.kv_quant != "int4", \
                "decode_kernel reads the int8 cache representation"
        if self.speculative:
            assert self.kv_layout != "shbd", \
                "speculative decoding needs per-row offsets (bshd/bhsd)"
            assert self.kv_quant != "int4", \
                "int4 KV does not support per-row offsets (SJD)"
        # multi-device serving: a (data, model) Mesh whose params the
        # caller sharded via parallel.mesh.shard_janus_params.  The engine
        # shards the fused 2B CFG batch on the data axis (cond rows
        # [0:B] and uncond [B:2B] stay aligned because B is padded to a
        # multiple of the dp size) and GSPMD propagates the TP layouts
        # through the cached decode scan — the reference's equivalent is
        # Lightning DDP over ranks (ospo/utils/generate.py:5-15)
        self.mesh = mesh
        # cap the power-of-two batch bucket at the pipeline's configured
        # batch size: serving points are HBM-tuned (B=20 on 16 GB), and
        # rounding a full batch up to the next power of two (20 → 32
        # pairs = 64 CFG rows) re-OOMs the budget the cap was chosen for.
        # Ragged tails still bucket to powers of two BELOW the cap.
        self.batch_cap = batch_cap
        self._decode_fn = jax.jit(self._decode_tokens)
        # per-signature dispatch timing → stage compile/steady split
        # (dispatch is async here, so this reads ≈ pure compile time)
        from ospo_tpu.utils.profiling import DispatchStats

        self.dispatch_stats = DispatchStats()

    # ------------------------------------------------------------------
    # prompt construction (host)
    # ------------------------------------------------------------------
    def build_cfg_batch(self, prompts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """Tokenise prompts and build the fused [2B, T] cond/uncond batch.

        The uncond rows mask every prompt token to ``<pad>`` except the
        first (BOS) and last (``<begin_of_image>``) — replicating
        ospo/wrapper/image_generation.py:135-141, including the quirk that
        the attention mask still covers the pad-masked positions.
        """
        tok = self.processor.tokenizer
        ids_list = [np.asarray(tok.encode(p), np.int32) for p in prompts]
        t_max = _bucket(max(len(x) for x in ids_list))
        b = len(prompts)
        tokens = np.full((2 * b, t_max), self.processor.pad_id, np.int32)
        mask = np.zeros((2 * b, t_max), np.int32)
        for i, ids in enumerate(ids_list):
            start = t_max - len(ids)
            tokens[i, start:] = ids
            tokens[b + i, start:] = ids
            tokens[b + i, start + 1 : -1] = self.processor.pad_id  # uncond
            mask[i, start:] = 1
            mask[b + i, start:] = 1
        return tokens, mask

    # ------------------------------------------------------------------
    # jitted core
    # ------------------------------------------------------------------
    def _segmented_decode(self, params, tokens, attn_mask, step_fn,
                          keys=None):
        """ONE serving decode loop shared by sampling and the
        teacher-forced probe: prompt prefill into the KV cache, then
        ``n_img`` steps under ``decode_segments`` growing attention
        windows.  ``step_fn(hidden_last, step, key, prompt_len) →
        (emit, embeds, pos)`` defines what each step emits (token [B] or
        logits [B, V], stacked along axis 1) and what it feeds next;
        ``keys`` (optional [n_img] rng keys) are threaded per step.
        Sharing the scaffold keeps the quality probe measuring EXACTLY
        the program that serves (same segment bounds, window rounding,
        s_max alignment, layout/quantization)."""
        cfg = self.model.cfg
        two_b, t_prompt = tokens.shape
        n_img = self.image_token_num
        s_max = t_prompt + n_img
        if self.decode_kernel:  # kernel DMA blocks need a 64-aligned window
            s_max = ((s_max + 63) // 64) * 64

        inputs_embeds = janus_lib.embed_text(params, tokens)
        positions = llama.positions_from_mask(attn_mask)
        kv = llama.init_kv_cache(cfg.language, two_b, s_max,
                                 quantized=self.kv_quant,
                                 layout=self.kv_layout)

        # ---- prefill (flash attention over the prompt block) ----
        hidden, kv = janus_lib.language_forward(
            params, cfg, inputs_embeds, attn_mask, positions,
            kv_cache=kv, self_attn=True,
            cache_layout=self.kv_layout,
        )
        prompt_len = jnp.sum(attn_mask, axis=-1)  # [2B] valid prompt tokens

        # window mask over the whole cache: prompt part + all-ones image part
        # (row-causality / cur_len exclude not-yet-written rows); alignment
        # pad rows (decode_kernel) stay masked out
        window_mask = jnp.concatenate(
            [attn_mask, jnp.ones((two_b, n_img), attn_mask.dtype),
             jnp.zeros((two_b, s_max - t_prompt - n_img), attn_mask.dtype)],
            axis=-1,
        )

        # first step runs off the prefill's last hidden state
        emit0, embeds, pos = step_fn(
            hidden[:, -1], 0, None if keys is None else keys[0], prompt_len)

        def make_body(window):
            def body(carry, xs):
                kv, embeds, pos = carry
                key, step = xs if keys is not None else (None, xs)
                hidden, kv = janus_lib.language_forward(
                    params, cfg, embeds, window_mask[:, :window], pos,
                    kv_cache=kv, attn_window=window,
                    decode_kernel=self.decode_kernel,
                    cache_layout=self.kv_layout,
                )
                emit, embeds, pos = step_fn(hidden[:, -1], step, key,
                                            prompt_len)
                return (kv, embeds, pos), emit

            return body

        # segmented decode with growing cache windows (see __init__)
        n_seg = min(self.decode_segments, max(1, (n_img - 1) // 64))
        bounds = [1 + (n_img - 1) * (s + 1) // n_seg for s in range(n_seg)]
        carry = (kv, embeds, pos)
        outs = [emit0[:, None]]
        start = 1
        for end in bounds:
            if end <= start:
                continue
            # window covers every row written during this segment (+64 align);
            # the Pallas kernel streams the exact populated prefix itself, so
            # its mask/window always span the whole cache
            window = s_max if self.decode_kernel else \
                min(s_max, ((t_prompt + end + 63) // 64) * 64)
            steps = jnp.arange(start, end, dtype=jnp.int32)
            carry, seg = jax.lax.scan(
                make_body(window), carry,
                (keys[start:end], steps) if keys is not None else steps,
            )
            outs.append(jnp.moveaxis(seg, 0, 1))
            start = end
        return jnp.concatenate(outs, axis=1)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _generate_tokens(self, params, tokens, attn_mask, rng,
                         cfg_weight, temperature):
        cfg = self.model.cfg
        b = tokens.shape[0] // 2

        def sample_step(hidden_last, step, key, prompt_len):
            logits = janus_lib.gen_logits(params, hidden_last[:, None, :])[:, 0]
            cond, uncond = logits[:b], logits[b:]
            fused = uncond + cfg_weight * (cond - uncond)
            next_tok = jax.random.categorical(
                key, fused / jnp.maximum(temperature, 1e-6)
            )                                                  # [B]
            both = jnp.concatenate([next_tok, next_tok])       # [2B]
            embeds = janus_lib.prepare_gen_img_embeds(params, cfg, both[:, None])
            pos = (prompt_len + step)[:, None]                  # [2B, 1]
            return next_tok, embeds, pos

        keys = jax.random.split(rng, self.image_token_num)
        return self._segmented_decode(params, tokens, attn_mask,
                                      sample_step, keys=keys)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _forced_cfg_logits(self, params, tokens, attn_mask, forced,
                           cfg_weight):
        """Teacher-forced CFG decode: the SAME cached decode loop as
        ``_generate_tokens`` (shared ``_segmented_decode`` scaffold — KV
        layout/quantization/segmentation identical by construction) but
        feeding the provided ``forced`` image tokens [B, n_img] instead
        of sampling, returning the fused CFG logits at every step
        [B, n_img, V].  This is the decode-divergence probe: comparing
        bf16-cache vs int8/int4-cache engines teacher-forced on one token
        sequence isolates the quantization error per step (the serving
        quality gate for ``kv_quant`` — scripts/validate_weights.py)."""
        cfg = self.model.cfg
        b = tokens.shape[0] // 2

        def forced_step(hidden_last, step, key, prompt_len):
            logits = janus_lib.gen_logits(params, hidden_last[:, None, :])[:, 0]
            cond, uncond = logits[:b], logits[b:]
            fused = (uncond + cfg_weight * (cond - uncond)).astype(jnp.float32)
            tok = jax.lax.dynamic_slice_in_dim(forced, step, 1, axis=1)[:, 0]
            both = jnp.concatenate([tok, tok])
            embeds = janus_lib.prepare_gen_img_embeds(params, cfg, both[:, None])
            pos = (prompt_len + step)[:, None]
            return fused, embeds, pos

        return self._segmented_decode(params, tokens, attn_mask, forced_step)

    def forced_cfg_logits(self, prompts: Sequence[str],
                          forced_tokens: np.ndarray) -> np.ndarray:
        """Host wrapper: teacher-forced fused CFG logits [B, n_img, V]."""
        tokens, mask = self.build_cfg_batch(list(prompts))
        return np.asarray(self._forced_cfg_logits(
            self.model.params, jnp.asarray(tokens), jnp.asarray(mask),
            jnp.asarray(forced_tokens, jnp.int32),
            jnp.float32(self.cfg_weight)))

    @functools.partial(jax.jit, static_argnums=(0,))
    def _generate_tokens_sjd(self, params, tokens, attn_mask, rng,
                             cfg_weight, temperature):
        """Speculative-Jacobi CFG decode: verify W drafted tokens per model
        call with spec-sampling acceptance; rows advance by their accepted
        counts (per-row cache offsets). Output distribution == sequential
        sampling (acceptance/residual-resampling identity)."""
        cfg = self.model.cfg
        two_b, t_prompt = tokens.shape
        b = two_b // 2
        n_img = self.image_token_num
        W = self.speculative
        s_max = t_prompt + n_img + W          # drafts may overhang the end
        s_max = ((s_max + 127) // 128) * 128 if self.decode_kernel else s_max

        inputs_embeds = janus_lib.embed_text(params, tokens)
        positions = llama.positions_from_mask(attn_mask)
        kv = llama.init_kv_cache(cfg.language, two_b, s_max,
                                 quantized=self.kv_quant,
                                 layout=self.kv_layout)
        hidden, kv = janus_lib.language_forward(
            params, cfg, inputs_embeds, attn_mask, positions,
            kv_cache=kv, self_attn=True,
            cache_layout=self.kv_layout,
        )
        prompt_len = jnp.sum(attn_mask, axis=-1)              # [2B] rotary base
        base_mask = jnp.concatenate(
            [attn_mask, jnp.zeros((two_b, s_max - t_prompt), attn_mask.dtype)],
            axis=-1,
        )
        s_idx = jnp.arange(s_max)[None, :]

        def fused_probs(hidden_w):
            logits = janus_lib.gen_logits(params, hidden_w)    # [2B, W, V]
            cond, uncond = logits[:b], logits[b:]
            fused = uncond + cfg_weight * (cond - uncond)
            return jax.nn.softmax(fused / jnp.maximum(temperature, 1e-6), -1)

        # ---- bootstrap: one sequential token + W initial drafts ----
        rng, k0, k1 = jax.random.split(rng, 3)
        p0 = fused_probs(hidden[:, -1:, :])[:, 0]              # [B, V]
        tok0 = jax.random.categorical(k0, jnp.log(p0 + 1e-30))
        out = jnp.full((b, n_img), 0, jnp.int32).at[:, 0].set(tok0)
        drafts = jax.random.categorical(
            k1, jnp.log(p0 + 1e-30)[:, None, :], shape=(b, W))  # iid from p0
        q_probs = jnp.broadcast_to(p0[:, None, :], (b, W, p0.shape[-1]))

        state = dict(
            cache=kv,
            n_gen=jnp.ones((b,), jnp.int32),                   # tok0 committed
            last_tok=tok0,
            drafts=drafts,
            q_probs=q_probs,
            out=out,
            rng=rng,
            iters=jnp.zeros((), jnp.int32),
        )

        def cond_fn(st):
            return jnp.min(st["n_gen"]) < n_img

        def body_fn(st):
            rng, k_acc, k_res, k_draft = jax.random.split(st["rng"], 4)
            n_gen = st["n_gen"]
            # the window's FIRST query is last_tok = out[n_gen-1], whose
            # cache row is t_prompt + n_gen - 1 and whose rotary position
            # continues the prompt at prompt_len + n_gen - 1 (off by one
            # either way leaves row t_prompt a never-written all-zero
            # phantom that every later softmax attends: measured 2.2e-5
            # max|Δp| vs sequential on the tiny model — aligned, 3.7e-9)
            row_b = t_prompt + n_gen - 1                       # absolute rows
            row2b = jnp.concatenate([row_b, row_b])

            inputs = jnp.concatenate(
                [st["last_tok"][:, None], st["drafts"][:, : W - 1]], axis=1)
            inputs2b = jnp.concatenate([inputs, inputs], axis=0)
            embeds = janus_lib.prepare_gen_img_embeds(params, cfg, inputs2b)
            pos = (prompt_len + jnp.concatenate([n_gen, n_gen]) - 1)[:, None] \
                + jnp.arange(W)[None, :]
            mask = base_mask | (
                (s_idx >= t_prompt) & (s_idx < (row2b + W)[:, None])
            ).astype(base_mask.dtype)

            hidden, cache = janus_lib.language_forward(
                params, cfg, embeds, mask, pos, kv_cache=st["cache"],
                cache_positions=row2b,
                cache_layout=self.kv_layout,
            )
            p = fused_probs(hidden)                            # [B, W, V]

            d = st["drafts"]
            q = st["q_probs"]
            p_d = jnp.take_along_axis(p, d[..., None], axis=-1)[..., 0]
            q_d = jnp.take_along_axis(q, d[..., None], axis=-1)[..., 0]
            ratio = p_d / jnp.maximum(q_d, 1e-30)
            u = jax.random.uniform(k_acc, (b, W))
            acc = (u < ratio).astype(jnp.int32)
            prefix = jnp.cumprod(acc, axis=1)
            n_acc = jnp.sum(prefix, axis=1)                    # [B] 0..W

            # residual resample at the first rejected slot
            j = jnp.minimum(n_acc, W - 1)
            p_j = jax.vmap(lambda pp, jj: pp[jj])(p, j)
            q_j = jax.vmap(lambda qq, jj: qq[jj])(q, j)
            resid = jnp.maximum(p_j - q_j, 0.0)
            resid_ok = jnp.sum(resid, axis=-1, keepdims=True) > 1e-20
            resid = jnp.where(resid_ok, resid, p_j)
            t_res = jax.random.categorical(k_res, jnp.log(resid + 1e-30))

            c = jnp.where(n_acc < W, n_acc + 1, W)             # committed count
            c = jnp.where(n_gen >= n_img, 0, c)                # freeze done rows
            wi = jnp.arange(W)[None, :]
            committed = jnp.where(
                wi < n_acc[:, None], d,
                jnp.where(wi == n_acc[:, None], t_res[:, None], 0),
            )
            # scatter into out (OOB → drop)
            write_idx = jnp.where(
                (wi < c[:, None]) & ((n_gen[:, None] + wi) < n_img),
                n_gen[:, None] + wi, n_img,
            )
            out = st["out"].at[jnp.arange(b)[:, None], write_idx].set(
                committed, mode="drop")
            last = jnp.take_along_axis(
                committed, jnp.maximum(c - 1, 0)[:, None], axis=1)[:, 0]
            last = jnp.where(c > 0, last, st["last_tok"])

            # next Jacobi drafts: sample each slot INDEPENDENTLY from this
            # round's distribution shifted by c (clamped to the last
            # available window slot).  Independent per-slot draws — not a
            # gather of one shared sample vector — keep q_probs the true
            # proposal even when the clamp maps several slots to p[:,W-1]
            # (a shared draw there is a point-mass proposal, which breaks
            # the acceptance/residual identity)
            src = jnp.minimum(c[:, None] + wi, W - 1)
            q_new = jax.vmap(lambda pp, ss: pp[ss])(p, src)     # [B, W, V]
            drafts_new = jax.random.categorical(
                k_draft, jnp.log(q_new + 1e-30))                # [B, W]

            # clamp: a row that overshoots past n_img must freeze AT n_img,
            # or later rounds scatter its draft K/V past s_max-1 (OOB
            # writes are dropped today, but that behavior is undefined)
            return dict(cache=cache, n_gen=jnp.minimum(n_gen + c, n_img),
                        last_tok=last,
                        drafts=drafts_new, q_probs=q_new, out=out, rng=rng,
                        iters=st["iters"] + 1)

        state = jax.lax.while_loop(cond_fn, body_fn, state)
        return state["out"], state["iters"]

    def _decode_tokens(self, params, gen_tokens):
        latent = self.img_size // self.patch_size
        pixels = vqgan.decode_code(
            params["gen_vision_model"], self.model.cfg.vq, gen_tokens,
            latent_hw=(latent, latent),
        )
        # uint8 conversion ON DEVICE (the reference's
        # np.clip((dec+1)/2*255, 0, 255), image_generation.py:177): the
        # host fetch then moves 1 byte/px instead of 4 — a 4× cut in
        # device→host traffic, which matters through a tunneled chip
        return jnp.clip((pixels.astype(jnp.float32) + 1.0) * 127.5,
                        0, 255).astype(jnp.uint8)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def prewarm(self, signatures, max_workers: int = 2) -> int:
        """AOT-compile the decode program for (2B, T_bucket) signatures
        ahead of the data loop (mirrors TextGenEngine.prewarm; combined
        with the persistent compilation cache, repeat invocations of
        step 3 skip the cold compile entirely).  ``signatures``:
        iterable of (batch_pairs, prompt_bucket)."""
        import concurrent.futures

        sigs = sorted({(int(b), int(t)) for b, t in signatures})

        def compile_one(sig):
            from ospo_tpu.parallel import mesh as mesh_lib

            b, t = sig
            toks = jnp.zeros((2 * b, t), jnp.int32)
            mask = jnp.ones((2 * b, t), jnp.int32)
            rng = jax.random.PRNGKey(0)
            if self.mesh is not None:
                # match generate_tokens' input shardings (an unsharded
                # lowering is a different executable — wasted compile)
                toks = mesh_lib.shard_on_axis(toks, self.mesh)
                mask = mesh_lib.shard_on_axis(mask, self.mesh)
                rng = mesh_lib.replicate(rng, self.mesh)
            fn = (type(self)._generate_tokens_sjd if self.speculative
                  else type(self)._generate_tokens)
            fn.lower(
                self, self.model.params, toks, mask, rng,
                jnp.float32(self.cfg_weight), jnp.float32(self.temperature),
            ).compile()

        if not sigs:
            return 0
        import time as _time

        t0 = _time.time()
        with concurrent.futures.ThreadPoolExecutor(
                min(max_workers, len(sigs))) as ex:
            list(ex.map(compile_one, sigs))
        self.dispatch_stats.add_prewarm(_time.time() - t0)
        return len(sigs)

    def _batch_bucket(self, b_real: int) -> int:
        """CFG-pair batch bucket: powers of two (no ragged-tail retraces),
        capped at the HBM-tuned serving batch, then rounded up to a
        multiple of the mesh's data-axis size (cond/uncond halves must
        stay shard-aligned).  ONE formula for both the compile-signature
        predictor (:meth:`signature_for`/:meth:`prewarm`) and the actual
        dispatch — if they ever diverged, step 3 would silently pay a
        cold mid-serve compile while the prewarmed executable goes
        unused."""
        from ospo_tpu.parallel import mesh as mesh_lib

        b = 1 << (b_real - 1).bit_length() if self.batch_bucketing else b_real
        if self.batch_cap:
            b = min(b, max(self.batch_cap, b_real))
        dp = mesh_lib.data_parallel_size(self.mesh)
        return ((b + dp - 1) // dp) * dp

    def signature_for(self, prompts: Sequence[str]) -> tuple:
        """(batch_pairs_bucket, prompt_bucket) this prompt list will
        compile as — feed to :meth:`prewarm`."""
        tok = self.processor.tokenizer
        t_max = _bucket(max(len(tok.encode(p)) for p in prompts))
        return self._batch_bucket(len(prompts)), t_max

    def generate_tokens(self, prompts: Sequence[str], seed: int = 0) -> np.ndarray:
        out, b_real = self._generate_tokens_device_batch(prompts, seed)
        return np.asarray(out)[:b_real]

    def _generate_tokens_device_batch(self, prompts: Sequence[str],
                                      seed: int = 0):
        """Bucketed token generation, result left ON DEVICE (sharded
        under a mesh).  Returns (tokens [b_bucket, T], b_real) — rows
        past b_real are padding duplicates."""
        from ospo_tpu.parallel import mesh as mesh_lib

        b_real = len(prompts)
        b_bucket = self._batch_bucket(b_real)
        prompts = list(prompts) + [prompts[-1]] * (b_bucket - b_real)
        tokens, mask = self.build_cfg_batch(prompts)
        rng = jax.random.PRNGKey(seed)
        if self.mesh is not None:
            tokens = mesh_lib.shard_on_axis(jnp.asarray(tokens), self.mesh)
            mask = mesh_lib.shard_on_axis(jnp.asarray(mask), self.mesh)
            rng = mesh_lib.replicate(rng, self.mesh)
        args = (
            self.model.params, jnp.asarray(tokens), jnp.asarray(mask),
            rng,
            jnp.float32(self.cfg_weight), jnp.float32(self.temperature),
        )
        # dispatch is async — the timed block captures trace+compile on a
        # signature's FIRST call (jit blocks there) and ~0 afterwards, so
        # DispatchStats reads almost pure compile for this engine
        sig = ("decode", tokens.shape[0], tokens.shape[1])
        with self.dispatch_stats.timed(sig):
            if self.speculative > 0:
                out, iters = self._generate_tokens_sjd(*args)
                # keep the device scalar — int(iters) here would block
                # until the whole generation finishes, re-serializing the
                # writer overlap generate_images_device promises
                self._last_sjd_iters_dev = iters
            else:
                out = self._generate_tokens(*args)
        return out, b_real

    @property
    def last_sjd_iters(self):
        """Jacobi iterations of the last SJD call (host sync on READ, not
        inside the dispatch path)."""
        return int(self._last_sjd_iters_dev)

    def generate_images_device(self, prompts: Sequence[str],
                               seed: int = 0) -> jax.Array:
        """prompts (already T2I-formatted) → uint8 device array
        [b_bucket, H, W, 3] with NO host sync — the token array stays on
        device (sharded under a mesh) straight into the VQ decode, and
        callers pipeline the fetch (np.asarray) against the next batch's
        decode (step3's double-buffered writer).  Rows past
        ``len(prompts)`` are padding — trim at fetch (``[:n]``)."""
        toks, _ = self._generate_tokens_device_batch(prompts, seed=seed)
        return self._decode_fn(self.model.params, toks)

    def generate_images(self, prompts: Sequence[str], seed: int = 0) -> np.ndarray:
        """prompts (already T2I-formatted) → uint8 images [B, H, W, 3]."""
        imgs = np.asarray(self.generate_images_device(prompts, seed=seed))
        return imgs[: len(prompts)]

    def generate_from_raw_prompts(self, raw_prompts: Sequence[str],
                                  seed: int = 0) -> np.ndarray:
        return self.generate_images(
            [t2i_prompt(self.processor, p) for p in raw_prompts], seed=seed
        )
