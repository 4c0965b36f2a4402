"""Self-VQA scoring engine (step 4b understanding path).

One jitted multimodal forward: image + per-question conversations →
last-position vocabulary distribution, from which p(yes)/p(no) gaps are
computed exactly like ``JanusProScoreWrapper``
(``ospo/wrapper/vqa.py:161-225``): softmax at the final position, p_yes =
max over {"yes","Yes"} last-token ids, p_no likewise, local score = mean
gap over non-global questions, global score = last question's gap.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ospo_tpu.models import janus as janus_lib
from ospo_tpu.models import llama
from ospo_tpu.ops import pixels as pixels_ops
from ospo_tpu.processing import Processor


def _bucket(n: int, step: int = 64) -> int:
    return max(step, ((n + step - 1) // step) * step)


class _SharedPrep(NamedTuple):
    """Host-prepared operand package for one shared-prefix scoring call
    (``ScoringEngine.prepare_shared_multi`` → ``_execute_shared_multi``).
    ``pre`` carries the batch-shared PRE-IMAGE segment operands
    ``[pre_ids, pre_mask]`` (each ``[1, C]``) when the pre-image split is
    active, else ``None`` (single-segment program).  ``row_tokens`` is the
    per-image KV-cache length (prefix bucket + suffix bucket) — the HBM
    cost driver the execute half budgets against (see
    ``ScoringEngine.row_token_budget``)."""
    operands: List[np.ndarray]
    q_counts: List[int]
    n_real: int
    pre: Optional[List[np.ndarray]] = None
    row_tokens: int = 0


class ScoringEngine:
    def __init__(self, model: janus_lib.JanusModel, processor: Processor,
                 mesh=None, kv_quant: bool = False,
                 pre_image_prefix: Optional[bool] = None):
        self.model = model
        self.processor = processor
        # pre-image shared segment: the chat header + system prompt tokens
        # BEFORE the image span are identical across every image in the
        # batch (pure text — no spliced embeddings), so they prefill once
        # at B=1 and ride ``prefix_kv`` instead of being stored N times in
        # the per-image cache (BENCH_NOTES "Known unexploited lever").
        # Default on; OSPO_SCORE_PREIMG=0 is the A/B kill-switch, mirroring
        # the text engine's OSPO_SHARED_PREFIX convention.
        if pre_image_prefix is None:
            pre_image_prefix = os.environ.get("OSPO_SCORE_PREIMG", "1") != "0"
        self.pre_image_prefix = bool(pre_image_prefix)
        # multi-device serving mesh (params sharded by the caller via
        # parallel.mesh.shard_janus_params); the image batch shards on
        # 'data', the trunk TP layouts propagate through the prefix cache
        self.mesh = mesh
        # int8 prefix KV cache: halves the dominant suffix-phase HBM
        # stream and the cache footprint, enabling larger cross-item
        # image batches on a 16 GB chip (quality bound: test_kv_quant.py).
        # Spellings validate loudly (parse_kv_quant convention)
        from ospo_tpu.ops.quant import parse_kv_quant

        self.kv_quant = parse_kv_quant(kv_quant)
        assert self.kv_quant != "int4", \
            "scoring supports bf16 or int8 prefix caches (int4 KV is a " \
            "decode-engine option)"
        self._shared_oom = False  # sticky fallback (see score_images)
        # HBM envelope for one shared-prefix program call, in ROW-TOKENS
        # (images × per-image cache length).  Calibrated on the measured
        # rows=16 Q-uniform optimum — p_b=704 + t_b=64 = 768 row-tokens ×
        # 16 = 12288 fits, rows=20 (15360) OOMs (BENCH_NOTES r4 grid).
        # The r4 timed round's complex-category chunks (t_b≈176, Q up to
        # 13) hit 16×880 = 14080 and RESOURCE_EXHAUSTED into a poisoned
        # heap (VERDICT r4 weak #2); the execute half now slices any
        # prepared chunk into sub-batches that fit this budget, and the
        # OOM handler halves it (sticky) instead of abandoning the shared
        # path for the heavier unshared fallback.
        # precision-mixed readout (VERDICT r4 #6): under a w8a8 trunk the
        # SUFFIX passes (the per-question forwards whose final position
        # feeds the yes/no readout) run W8A16 — same int8 payload, no
        # dynamic activation quantization — while the big prefill keeps
        # the 2× int8 MXU rate.  The suffix is ~10–20% of the FLOPs, so
        # the cost is small; the r4 gate measured full-w8a8 scoring
        # noticeably noisier on near-tie readouts (86.1% vs 97.2% answer
        # agreement).  Enable with OSPO_SCORE_READOUT=w8a16 (or the
        # constructor flag); no-op for non-w8a8 trunks.
        self.readout_w8a16 = (
            os.environ.get("OSPO_SCORE_READOUT", "") == "w8a16")
        # the 12288 calibration is for the int8 prefix cache the grid ran
        # with; a bf16 cache doubles bytes per row-token, so its default
        # halves.  OSPO_SCORE_ROW_TOKENS overrides either.
        default_budget = 12288 if self.kv_quant == "int8" else 6144
        self.row_token_budget = int(
            os.environ.get("OSPO_SCORE_ROW_TOKENS", str(default_budget)))
        # per-signature dispatch timing → stage compile/steady split
        from ospo_tpu.utils.profiling import DispatchStats

        self.dispatch_stats = DispatchStats()
        tok = processor.tokenizer
        self.yes_ids = [tok("yes", add_special_tokens=False).input_ids[-1],
                        tok("Yes", add_special_tokens=False).input_ids[-1]]
        self.no_ids = [tok("no", add_special_tokens=False).input_ids[-1],
                       tok("No", add_special_tokens=False).input_ids[-1]]

    def _readout_precision(self):
        """Context for the suffix/readout phase: W8A16 override when the
        precision-mixed readout is on (read at TRACE time inside the
        shared-prefix jits — the branch is baked into the program)."""
        import contextlib

        from ospo_tpu.ops import quant as quant_lib

        return (quant_lib.w8a16_override() if self.readout_w8a16
                else contextlib.nullcontext())

    def _yes_no(self, logits: jax.Array) -> jax.Array:
        """[B, V] last-position logits → [B, 2] (p_yes, p_no) ON DEVICE:
        p_yes = max softmax prob over {"yes","Yes"} last-token ids, p_no
        likewise (vqa.py:121-124, 171-179) — the host fetch then moves 4
        floats/row instead of the 102400-wide distribution."""
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        sel = probs[:, jnp.asarray(self.yes_ids + self.no_ids)]   # [B, 4]
        n_yes = len(self.yes_ids)
        return jnp.stack([jnp.max(sel[:, :n_yes], axis=-1),
                          jnp.max(sel[:, n_yes:], axis=-1)], axis=-1)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _last_probs(self, params, input_ids, attn_mask, pixel_values,
                    seq_mask, emb_mask):
        cfg = self.model.cfg
        embeds = janus_lib.prepare_inputs_embeds(
            params, cfg, input_ids, pixel_values, seq_mask, emb_mask
        )
        positions = llama.positions_from_mask(attn_mask)
        hidden, _ = janus_lib.language_forward(
            params, cfg, embeds, attn_mask, positions
        )
        logits = janus_lib.lm_logits(params, hidden[:, -1:, :])[:, 0]
        return self._yes_no(logits)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _encode_images(self, params, pixel_values):
        """[N, H, W, 3] → aligned image embeddings [N, T2, D].  A separate
        program from the trunk prefill so the ViT activations and the
        trunk weights + KV cache never share one program's HBM peak
        (combined they OOMed a 16 GB chip at 7B, N=6).  Shared-path
        chunks arrive uint8 (normalize fuses into the first ViT conv);
        the per-image fallback still ships host-normalized float."""
        pixel_values = pixels_ops.normalize_pixels(
            pixel_values, self.processor.image_processor)
        return janus_lib.encode_images(params, self.model.cfg, pixel_values)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _shared_prefix_probs(self, params, input_ids, attn_mask, img_embeds,
                             seq_mask, emb_mask, suffix_ids, suffix_mask):
        """One program: trunk prefill over the shared (template + image)
        token prefix into a KV cache, then every question's (left-padded)
        suffix forwarded against that cache in a static unroll — the cache
        never crosses a jit or loop boundary (as a program argument or a
        lax.map carry XLA inserted ~4 GB of layout copies of K/V at 7B,
        which OOMed the chip).
        suffix_ids/mask: [Q, B, T_b] → [Q, B, 2] (p_yes, p_no)."""
        cfg = self.model.cfg
        b, p = input_ids.shape
        embeds = janus_lib.prepare_inputs_embeds(
            params, cfg, input_ids, None, seq_mask, emb_mask,
            img_embeds=img_embeds,
        )
        positions = llama.positions_from_mask(attn_mask)
        # batch-minor cache: matches the layout XLA picks for the suffix
        # attention reads — position-major forced ~4 GB of in-program
        # layout copies of K/V at 7B (same phenomenon as the image
        # engine's large-batch decode; see llama.init_kv_cache)
        kv = llama.init_kv_cache(cfg.language, b, p + suffix_ids.shape[-1],
                                 layout="shbd", quantized=self.kv_quant)
        _, kv = janus_lib.language_forward(
            params, cfg, embeds, attn_mask, positions,
            kv_cache=kv, self_attn=True, cache_layout="shbd",
        )
        prefix_len = jnp.sum(attn_mask, axis=-1, keepdims=True)    # [B, 1]

        def per_question(sfx_ids, sfx_mask):
            with self._readout_precision():
                s_embeds = janus_lib.embed_text(
                    params, jnp.maximum(sfx_ids, 0))
                # rotary positions continue the prefix's valid count
                pos = prefix_len - 1 + jnp.maximum(
                    jnp.cumsum(sfx_mask.astype(jnp.int32), axis=-1), 1)
                window = jnp.concatenate(
                    [attn_mask, sfx_mask], axis=-1).astype(jnp.int32)
                hidden, _ = janus_lib.language_forward(
                    params, cfg, s_embeds, window, pos, kv_cache=kv,
                    cache_layout="shbd",
                )
                logits = janus_lib.lm_logits(params, hidden[:, -1:, :])[:, 0]
            return self._yes_no(logits)

        # static python unroll over questions: a lax.map loop boundary made
        # XLA copy (and remat-compress) the whole cache per iteration
        # (~4 GB of copies at 7B); unrolled, layout assignment unifies the
        # cache across all readers and the copies disappear
        return jnp.stack([
            per_question(suffix_ids[i], suffix_mask[i])
            for i in range(suffix_ids.shape[0])
        ])

    @functools.partial(jax.jit, static_argnums=(0,))
    def _shared_prefix_probs_preimg(self, params, pre_ids, pre_mask,
                                    input_ids, attn_mask, img_embeds,
                                    seq_mask, emb_mask, suffix_ids,
                                    suffix_mask):
        """Pre-image-split variant of :meth:`_shared_prefix_probs`: the
        batch-identical PRE-IMAGE token segment (chat header + system
        prompt — pure text, so its embeddings don't depend on the image)
        prefills ONCE at B=1 into a bf16 cache and every later phase reads
        it as a batch-shared ``prefix_kv`` segment; only the per-image
        remainder (image span + post-image text) occupies the N-row cache.
        Rotary positions of the remainder continue after the pre segment,
        so the absolute positions — and the joint softmax — are
        token-for-token identical to the single-segment program (pinned
        by test_scoring.py; generality by
        test_prefix_kv_layout_window_matrix)."""
        cfg = self.model.cfg
        b, p = input_ids.shape

        # 1. B=1 pre-image prefill (bf16 regardless of kv_quant: stored
        #    once, the halving is irrelevant and the earliest context
        #    keeps full precision — text-engine convention)
        pkv = llama.init_kv_cache(cfg.language, 1, pre_ids.shape[1])
        p_embeds = janus_lib.embed_text(params, pre_ids)
        _, pkv = janus_lib.language_forward(
            params, cfg, p_embeds, pre_mask,
            llama.positions_from_mask(pre_mask),
            kv_cache=pkv, self_attn=True,
        )
        prefix = {"k": pkv["k"][:, 0], "v": pkv["v"][:, 0],
                  "mask": pre_mask}
        pre_len = jnp.sum(pre_mask)

        # 2. per-image remainder prefill against the shared segment
        embeds = janus_lib.prepare_inputs_embeds(
            params, cfg, input_ids, None, seq_mask, emb_mask,
            img_embeds=img_embeds,
        )
        positions = pre_len + llama.positions_from_mask(attn_mask)
        kv = llama.init_kv_cache(cfg.language, b, p + suffix_ids.shape[-1],
                                 layout="shbd", quantized=self.kv_quant)
        _, kv = janus_lib.language_forward(
            params, cfg, embeds, attn_mask, positions,
            kv_cache=kv, self_attn=True, cache_layout="shbd",
            prefix_kv=prefix,
        )
        prefix_len = pre_len + jnp.sum(attn_mask, axis=-1, keepdims=True)

        def per_question(sfx_ids, sfx_mask):
            with self._readout_precision():
                s_embeds = janus_lib.embed_text(
                    params, jnp.maximum(sfx_ids, 0))
                pos = prefix_len - 1 + jnp.maximum(
                    jnp.cumsum(sfx_mask.astype(jnp.int32), axis=-1), 1)
                window = jnp.concatenate(
                    [attn_mask, sfx_mask], axis=-1).astype(jnp.int32)
                hidden, _ = janus_lib.language_forward(
                    params, cfg, s_embeds, window, pos, kv_cache=kv,
                    cache_layout="shbd", prefix_kv=prefix,
                )
                logits = janus_lib.lm_logits(params, hidden[:, -1:, :])[:, 0]
            return self._yes_no(logits)

        return jnp.stack([
            per_question(suffix_ids[i], suffix_mask[i])
            for i in range(suffix_ids.shape[0])
        ])

    def question_conversations(self, image, questions: Sequence[str]):
        """Per-question single-image yes/no conversations
        (``build_conversation``, ospo/wrapper/vqa.py:149-158)."""
        convs = []
        for q in questions:
            convs.append([
                {"role": "<|User|>",
                 "content": f"<image_placeholder>\n{q} Please answer 'yes' or 'no' without explanation.",
                 "images": [image]},
                {"role": "<|Assistant|>", "content": ""},
            ])
        return convs

    def score_images(self, images: Sequence, questions: Sequence[str],
                     share_prefix: bool = True) -> List[Dict]:
        """N images × Q questions.  Default path: the (template + image)
        token prefix — identical for every question by construction — is
        prefilled ONCE per image into a KV cache, then each question's
        token suffix runs against it.  The common prefix is computed on
        the TOKENIZED sequences, so the math is token-for-token identical
        to the unshared forward (verified in tests/test_scoring.py);
        it just skips Q−1 redundant ViT encodes and trunk prefix passes
        (the reference recomputes everything per image AND per batch —
        vqa.py:161-204).  ``share_prefix=False`` falls back to the
        single-forward N·Q-row path."""
        return self.score_images_multi(
            images, [list(questions)] * len(images),
            share_prefix=share_prefix)

    def score_images_multi(self, images: Sequence,
                           questions_per_image: Sequence[Sequence[str]],
                           share_prefix: bool = True,
                           prep: "_SharedPrep" = None) -> List[Dict]:
        """N images, each with its OWN question list — cross-item batching
        for step 4b (images from MULTIPLE items share one program; the
        common token prefix always contains the template + 576-token image
        span, since per-item text only begins at the question).  Padded
        question slots (items with fewer questions than the batch max)
        repeat the image's last suffix and are dropped before scoring.
        ``prep`` supplies a host-prepared operand package (from
        :meth:`prepare_shared_multi`, typically built on a prefetch
        thread) so the shared path skips straight to device work."""
        assert len(images) == len(questions_per_image)
        if not images:
            return []
        # items with EMPTY question lists can't ride the shared-prefix
        # program (no suffix rows to build); the batched fallback scores
        # them as zero-question results, same as the reference's loop
        if (share_prefix and not self._shared_oom
                and all(qs for qs in questions_per_image)):
            if prep is None:
                prep = self.prepare_shared_multi(images, questions_per_image)
            # de-escalate WITHIN the shared path: on an OOM / helper
            # crash, halve the row-token budget (sticky — later chunks
            # pre-slice) and retry — a smaller shared slice is strictly
            # lighter than the unshared fallback, whose N·Q-row full
            # prefill re-OOMed and poisoned the heap in the r4 round
            # (VERDICT r4 weak #2).  Only when even dp-image slices fail
            # does the engine abandon the shared path for good.
            from ospo_tpu.parallel import mesh as mesh_lib

            dp = mesh_lib.data_parallel_size(self.mesh)
            while True:
                failure = None
                try:
                    return self._execute_shared_multi(prep)
                except jax.errors.JaxRuntimeError as e:
                    import sys
                    import traceback

                    from ospo_tpu.engine.text_engine import (
                        _compile_helper_crash,
                    )

                    # two retry-worthy failure classes, both shape-caused:
                    # genuine allocator OOMs (RESOURCE_EXHAUSTED) and the
                    # tunneled remote-compile helper's deterministic
                    # per-shape crash (HTTP 500).  Anything else is loud.
                    if ("RESOURCE_EXHAUSTED" not in str(e)
                            and not _compile_helper_crash(e)):
                        raise
                    traceback.print_exc(file=sys.stderr)
                    failure = ("helper crash" if _compile_helper_crash(e)
                               else "RESOURCE_EXHAUSTED")
                # retry OUTSIDE the except scope: the exception's
                # traceback pins the failed slice's device operands —
                # freeing them BEFORE the retry matters on a chip that
                # ignores donation
                import gc
                import sys

                gc.collect()
                # halve the slice size that actually FAILED (not the
                # abstract budget — with a large budget that would burn
                # several OOM retries before the slice shrank at all,
                # and every failed execution risks leaking HBM on this
                # chip)
                n_failed = min(prep.operands[0].shape[0],
                               self._fit_images(prep.row_tokens, dp))
                if n_failed > dp:
                    n_half = max(dp, (n_failed // 2) // dp * dp)
                    self.row_token_budget = min(
                        self.row_token_budget,
                        n_half * prep.row_tokens)
                    print(f"# scoring: shared-prefix slice of {n_failed} "
                          f"images failed ({failure}) — retrying the "
                          f"shared path at {n_half} images "
                          f"(row-token budget {self.row_token_budget}, "
                          f"sticky)", file=sys.stderr)
                    continue
                print("# scoring: shared-prefix path failed at the "
                      "minimum slice size — falling back to the "
                      "single-forward path", file=sys.stderr)
                self._shared_oom = True  # sticky: don't retry every item
                break
        # batched fallback: pack whole images into ≤32-row forwards (one
        # row per (image, question)).  The fallback serves bf16 trunks on
        # 16 GB chips where the shared-prefix cache OOMs but a plain
        # N·Q-row prefill fits — one forward per image would cost ~batch×
        # the wall-clock for the rest of the run once the sticky flag is
        # set.  Q-sorted step-4 chunks keep the (rows, T) signatures few.
        out: List[Dict] = []
        group: List = []
        gqs: List[List[str]] = []
        rows = 0
        for img, qs in zip(images, questions_per_image):
            if rows and rows + len(qs) > 32:
                out.extend(self._score_images_full(group, gqs))
                group, gqs, rows = [], [], 0
            group.append(img)
            gqs.append(list(qs))
            rows += len(qs)
        if group:
            out.extend(self._score_images_full(group, gqs))
        return out

    def _score_shared_multi(self, images: Sequence,
                            questions_per_image) -> List[Dict]:
        return self._execute_shared_multi(
            self.prepare_shared_multi(images, questions_per_image))

    def prepare_shared_multi(self, images: Sequence,
                             questions_per_image) -> "_SharedPrep":
        """HOST half of the shared-prefix scorer: decoded PIL images +
        per-image question lists → numpy operand package.  Pure host work
        (tokenize, common-prefix split, image preprocessing, padding) —
        safe to run on a prefetch thread while the chip executes the
        previous chunk (``step4.run_scoring`` overlaps them)."""
        from ospo_tpu.parallel import mesh as mesh_lib

        if not images or any(not qs for qs in questions_per_image):
            # fail HERE (prefetch threads catch and fall back) rather
            # than as an IndexError deep in the suffix packing
            raise ValueError(
                "shared-prefix scoring needs ≥1 image and ≥1 question "
                "per image; use the unshared path for empty items")
        n_real = len(images)
        # image batch must divide across the data axis — pad with repeats
        # of the last image and trim the scores afterwards
        dp = mesh_lib.data_parallel_size(self.mesh)
        pad_n = (-n_real) % dp
        images = list(images) + [images[-1]] * pad_n
        questions_per_image = (list(questions_per_image)
                               + [questions_per_image[-1]] * pad_n)
        n = len(images)
        # tokenize each image's Q conversations once — ids are
        # image-independent, so a 1×1 stub avoids re-running image
        # preprocessing per question
        from PIL import Image as PILImage

        stub = PILImage.new("RGB", (1, 1))
        ids_per_img: List[List[np.ndarray]] = []
        for qs in questions_per_image:
            prepares = [
                self.processor.process_one(conversations=c, images=[stub])
                for c in self.question_conversations(stub, qs)
            ]
            ids_per_img.append(
                [np.asarray(p.input_ids, np.int32) for p in prepares])

        # common token prefix across EVERY (image, question) sequence
        all_ids = [a for ids in ids_per_img for a in ids]
        minlen = min(len(a) for a in all_ids)
        stacked = np.stack([a[:minlen] for a in all_ids])
        neq = (stacked != stacked[0]).any(axis=0)
        common = minlen if not neq.any() else int(np.argmax(neq))
        common = min(common, minlen - 1)  # ≥1 suffix token (Q=1 / dup qs)
        # the image span from the expanded ids (inside the shared prefix)
        seq_mask_full = np.asarray(all_ids[0]) == self.processor.image_id
        assert not seq_mask_full[common:].any(), \
            "image span must sit inside the shared prefix"

        # pre-image split: the tokens BEFORE the image span are identical
        # across images AND questions (chat header + system prompt — and
        # pure text, so their embeddings don't depend on the image); store
        # their KV once at B=1 instead of N times in the per-image cache
        pre = None
        pre_n = 0
        if self.pre_image_prefix and seq_mask_full[:common].any():
            img_start = int(np.argmax(seq_mask_full[:common]))
            if img_start >= 8:  # too-short segments aren't worth a 2nd phase
                pre_n = img_start
                c_pre = _bucket(pre_n, step=16)
                pre_ids = np.full((1, c_pre), self.processor.pad_id, np.int32)
                pre_mask = np.zeros((1, c_pre), np.int32)
                pre_ids[0, c_pre - pre_n:] = all_ids[0][:pre_n]
                pre_mask[0, c_pre - pre_n:] = 1
                pre = [pre_ids, pre_mask]

        # per-image prefix batch (minus any pre-image segment), left-padded
        # to a bucket
        rest = common - pre_n
        p_b = _bucket(rest)
        lpad = p_b - rest
        prefix_ids = np.pad(all_ids[0][pre_n:common], (lpad, 0),
                            constant_values=self.processor.pad_id)
        prefix_mask = np.pad(np.ones(rest, np.int32), (lpad, 0))
        prefix_seq_mask = np.pad(seq_mask_full[pre_n:common], (lpad, 0))
        pixel_values = np.stack([
            self.processor.image_processor.process_one_transfer(img)
            for img in images
        ])                  # [N, H, W, 3] uint8 — normalized on device in
        #                     _encode_images; 4x fewer transfer bytes/chunk
        #                     (OSPO_U8_PIXELS=0 restores host float32)
        t2 = self.processor.num_image_tokens
        emb_mask = np.ones((n, 1, t2), bool)

        # per-image suffix stacks, Q padded to the batch max (padded slots
        # repeat the image's last suffix — an even bucket wasted 33% of
        # the suffix work at the common 3-question count; distinct maxes
        # span a handful of values, so signatures stay bounded);
        # T to a 16-step bucket
        q_counts = [len(ids) for ids in ids_per_img]
        q_b = max(q_counts)
        t_b = _bucket(max(len(a) - common for a in all_ids), step=16)
        sfx_ids = np.full((q_b, n, t_b), self.processor.pad_id, np.int32)
        sfx_mask = np.zeros((q_b, n, t_b), np.int32)
        for i, ids in enumerate(ids_per_img):
            for qi in range(q_b):
                s = ids[min(qi, len(ids) - 1)][common:]
                sfx_ids[qi, i, t_b - len(s):] = s
                sfx_mask[qi, i, t_b - len(s):] = 1

        operands = [
            np.tile(prefix_ids, (n, 1)),
            np.tile(prefix_mask, (n, 1)),
            pixel_values,
            np.tile(prefix_seq_mask, (n, 1)),
            emb_mask,
            sfx_ids,
            sfx_mask,
        ]
        return _SharedPrep(operands, q_counts, n_real, pre,
                           row_tokens=p_b + t_b)

    def _fit_images(self, row_tokens: int, dp: int) -> int:
        """Images per shared-program call under the row-token budget —
        at least one per data shard (the program can't go below dp)."""
        if row_tokens <= 0:
            return 10 ** 9
        fit = (self.row_token_budget // row_tokens) // dp * dp
        return max(dp, fit)

    def _execute_shared_multi(self, prep: "_SharedPrep") -> List[Dict]:
        """DEVICE half: slice the prepared chunk into sub-batches that fit
        the row-token budget (a complex-category chunk's longer suffixes
        would otherwise push the rows=16 program past the chip's HBM —
        VERDICT r4 weak #2), execute each slice, and trim to the real
        image count."""
        from ospo_tpu.parallel import mesh as mesh_lib

        ops, q_counts = prep.operands, prep.q_counts
        n = ops[0].shape[0]
        dp = mesh_lib.data_parallel_size(self.mesh)
        n_fit = self._fit_images(prep.row_tokens, dp)
        if n <= n_fit:
            return self._execute_shared_slice(
                ops, prep.pre, q_counts)[:prep.n_real]
        # balanced slices (16 over fit-13 → 2×8, not 13+3): every slice
        # shares ONE signature — the ragged final pads by repeating its
        # last image, and q_counts padding drops the extra scores
        n_slices = -(-n // n_fit)
        per = -(-(-(-n // n_slices)) // dp) * dp
        out: List[Dict] = []
        for s0 in range(0, n, per):
            sl = ([o[s0:s0 + per] for o in ops[:5]]
                  + [o[:, s0:s0 + per] for o in ops[5:]])
            qc = list(q_counts[s0:s0 + per])
            k = sl[0].shape[0]
            if k < per:
                reps = per - k
                sl = ([np.concatenate([o, np.repeat(o[-1:], reps, 0)])
                       for o in sl[:5]]
                      + [np.concatenate([o, np.repeat(o[:, -1:], reps, 1)],
                                        axis=1) for o in sl[5:]])
                qc += [qc[-1]] * reps
            res = self._execute_shared_slice(sl, prep.pre, qc)
            out.extend(res[:k])
        return out[:prep.n_real]

    def _execute_shared_slice(self, operands, pre,
                              q_counts: List[int]) -> List[Dict]:
        """Transfer/shard one slice's operands, run the encode +
        shared-prefix programs, collect per-image scores (all rows —
        callers trim padding)."""
        from ospo_tpu.parallel import mesh as mesh_lib

        sig = ("shared", operands[0].shape[0], operands[0].shape[1],
               operands[5].shape[0], operands[5].shape[2])
        operands = [jnp.asarray(x) for x in operands]
        pre = None if pre is None else [jnp.asarray(x) for x in pre]
        if self.mesh is not None:
            # image batch on 'data': axis 0 everywhere except the [Q, N, T]
            # suffix operands, whose batch sits on axis 1; the B=1
            # pre-image segment replicates (every data shard reads it)
            operands = [
                mesh_lib.shard_on_axis(x, self.mesh, axis=1 if i >= 5 else 0)
                for i, x in enumerate(operands)
            ]
            if pre is not None:
                pre = [mesh_lib.replicate(x, self.mesh) for x in pre]
        with self.dispatch_stats.timed(sig):
            img_embeds = self._encode_images(self.model.params, operands[2])
            if pre is not None:
                yn_qn = np.asarray(self._shared_prefix_probs_preimg(
                    self.model.params, pre[0], pre[1],
                    operands[0], operands[1], img_embeds,
                    operands[3], operands[4], operands[5], operands[6],
                ))                                       # [Q_b, N, 2]
            else:
                yn_qn = np.asarray(self._shared_prefix_probs(
                    self.model.params,
                    operands[0], operands[1], img_embeds,
                    operands[3], operands[4], operands[5], operands[6],
                ))                                       # [Q_b, N, 2]
        return [
            self._collect_scores(
                np.ascontiguousarray(yn_qn[:q_counts[i], i]),
                1, q_counts[i])[0]
            for i in range(len(q_counts))
        ]

    def _score_images_full(self, images: Sequence,
                           questions_per_image) -> List[Dict]:
        """N images, each with its OWN (possibly ragged) question list, in
        one N·ΣQ-row forward; rows stay image-major."""
        prepares = []
        for image, qs in zip(images, questions_per_image):
            for c in self.question_conversations(image, qs):
                prepares.append(
                    self.processor.process_one(conversations=c, images=[image])
                )
        batch = self.processor.batchify(prepares)

        # pad sequence dim to a bucket (left pad) to bound recompiles
        t = batch.input_ids.shape[1]
        pad = _bucket(t) - t
        input_ids = np.pad(batch.input_ids, ((0, 0), (pad, 0)),
                           constant_values=self.processor.pad_id)
        attn = np.pad(batch.attention_mask, ((0, 0), (pad, 0)))
        seq_mask = np.pad(batch.images_seq_mask, ((0, 0), (pad, 0)))

        yn = np.asarray(self._last_probs(
            self.model.params,
            jnp.asarray(input_ids), jnp.asarray(attn),
            jnp.asarray(batch.pixel_values),
            jnp.asarray(seq_mask), jnp.asarray(batch.images_emb_mask),
        ))

        results: List[Dict] = []
        off = 0
        for qs in questions_per_image:
            results.extend(self._collect_scores(yn[off:off + len(qs)],
                                                1, len(qs)))
            off += len(qs)
        return results

    def _collect_scores(self, yn: np.ndarray, n_images: int,
                        q_count: int) -> List[Dict]:
        """[N·Q, 2] (p_yes, p_no) rows (image-major row order) →
        per-image local/global scores (vqa.py:161-225 semantics)."""
        results: List[Dict] = []
        for img_idx in range(n_images):
            score_sum = 0.0
            global_score = 0.0
            answer_metadata: List[dict] = []
            for q_idx in range(q_count):
                row = img_idx * q_count + q_idx
                p_yes = float(yn[row, 0])
                p_no = float(yn[row, 1])
                answer_metadata.append({
                    "p_yes": p_yes,
                    "p_no": p_no,
                    "answer": ("yes" if p_yes > p_no
                               else ("no" if p_no > p_yes else "tie")),
                })
                if q_idx == q_count - 1:
                    global_score = p_yes - p_no
                else:
                    score_sum += p_yes - p_no
            results.append({
                "local_score": float(score_sum / max(q_count - 1, 1)),
                "global_score": float(global_score),
                "answer_metadata": answer_metadata,
            })
        return results

    def score_image(self, image, questions: Sequence[str]) -> Dict:
        """Single-image convenience wrapper around :meth:`score_images`."""
        return self.score_images([image], questions)[0]


def compute_preference_strength(base_img_dict: Dict, negative_img_dict: Dict):
    """Pair selection — a verbatim port of the algorithm core
    (``ospo/wrapper/vqa.py:228-280``): keep (base_i, negative_i) pairs with
    non-negative local & global gaps, normalise by max |gap|, strength =
    norm_local / (norm_global + 1e-8), pick argmax."""
    bases = [base_img_dict.get(f"base_{i}") for i in range(3)]
    negatives = [negative_img_dict.get(f"negative_{i}") for i in range(3)]
    if not any(b is not None for b in bases) or not any(
        n is not None for n in negatives
    ):
        return None

    pairs = []
    for idx in range(3):
        base, neg = bases[idx], negatives[idx]
        if base is None or neg is None:
            continue
        local_gap = base["local_score"] - neg["local_score"]
        global_gap = base["global_score"] - neg["global_score"]
        if local_gap >= 0 and global_gap >= 0:
            pairs.append({"pair_idx": idx, "local_gap": local_gap,
                          "global_gap": global_gap})
    if not pairs:
        return None

    max_local = max(abs(p["local_gap"]) for p in pairs)
    max_global = max(abs(p["global_gap"]) for p in pairs)
    best_score, best_pair = -np.inf, None
    for pair in pairs:
        norm_local = abs(pair["local_gap"]) / (max_local + 1e-8)
        norm_global = abs(pair["global_gap"]) / (max_global + 1e-8)
        strength = norm_local / (norm_global + 1e-8)
        if strength > best_score:
            best_score, best_pair = strength, pair
    if best_pair is None:
        return None

    chosen = base_img_dict[f"base_{best_pair['pair_idx']}"]["path"]
    rejected = negative_img_dict[f"negative_{best_pair['pair_idx']}"]["path"]
    return chosen, rejected, {
        "local_gap": best_pair["local_gap"],
        "global_gap": best_pair["global_gap"],
        "preference_strength": best_score,
    }
