"""Headline benchmark: Janus-Pro-7B CFG image-token decode throughput.

Measures img-tokens/sec/chip for the step-3 hot path — prompt prefill +
576-token autoregressive decode with classifier-free guidance (fused 2B
cond/uncond batch, KV cache, in-graph sampling) — on the available
accelerator with random-init bf16 weights (throughput is
weight-value-independent).

Prints ONE JSON line:
  {"metric": "img-tokens/sec/chip", "value": N, "unit": "tok/s",
   "vs_baseline": N, "ref_est_toks": N, "step_ms": N, "hbm_bw_pct": N}

``vs_baseline`` divides by a BATCH-MATCHED model of the reference's
eager-torch decode loop on an A100-80G (bandwidth + fixed eager
overhead; constants and derivation below and in BENCH_NOTES.md — the
reference publishes no numbers, see BASELINE.md).  ``hbm_bw_pct`` is the
fraction of v5e HBM bandwidth this run achieves given its actual
weight/KV footprint.  North-star target: vs_baseline ≥ 2.

Env knobs: OSPO_BENCH_PRESET (7b|1b|tiny), OSPO_BENCH_BATCH (auto-tuned
downward on OOM), OSPO_BENCH_TOKENS (default 576), OSPO_BENCH_PROMPT_LEN.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# --- Baseline model (batch-matched; full derivation in BENCH_NOTES.md) ---
# The reference publishes no numbers (BASELINE.md), so the denominator is a
# modeled estimate of ITS eager-torch decode loop
# (ospo/wrapper/image_generation.py:149-171) on an A100-80G at the SAME
# batch as this bench, decomposed as bandwidth + fixed eager overhead:
#   step_ms(B) = bytes_per_step(B) / 2039 GB/s + OVERHEAD_MS
# bytes_per_step = 13.2 GB bf16 trunk weights + bf16 KV for 2B CFG rows at
# the mean populated length.  OVERHEAD_MS = 35 ms is calibrated so B=1
# reproduces the ~24 img-tok/s (~24 s/image) figure assumed for the
# reference in round 1 — eager per-token dispatch is launch-bound, so the
# overhead is modeled batch-independent.  At B=24 this gives ~527 tok/s
# (the pure A100 roofline with zero overhead would be ~2286 tok/s — an
# eager HF-style loop does not approach it).  vs_baseline divides by the
# batch-matched estimate; target is >= 2x (BASELINE.md north star).
A100_BW_GBPS = 2039.0
A100_OVERHEAD_MS = 35.0
TARGET_MULTIPLE = 2.0
# v5e HBM bandwidth for the utilisation figure reported alongside tok/s
V5E_BW_GBPS = 819.0


def ref_weight_gb(cfg) -> float:
    """bf16 bytes of the reference's streamed decode weights for this
    language config (trunk + embed; 13.2 GB at 7B) — keeps vs_baseline
    honest for the 1b/tiny presets too."""
    d, i, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    h, kvh, dh = cfg.num_heads, cfg.kv_heads, cfg.dim_head
    per_layer = (h + kvh) * dh * d + h * dh * d + kvh * dh * d \
        + 3 * d * i + 2 * d
    return (v * d + cfg.num_layers * per_layer + d) * 2 / 1e9


def modeled_ref_toks(batch: int, prompt_len: int, n_tokens: int,
                     cfg) -> float:
    """Reference throughput estimate at the same (batch, seq) point."""
    rows = 2 * batch  # cond + uncond CFG rows
    s_avg = prompt_len + n_tokens / 2
    kv_gb = (2 * cfg.num_layers * rows * s_avg * cfg.kv_heads
             * cfg.dim_head * 2) / 1e9
    step_ms = (ref_weight_gb(cfg) + kv_gb) / A100_BW_GBPS * 1e3 \
        + A100_OVERHEAD_MS
    return batch / step_ms * 1e3


def build_bench_model(preset: str):
    from ospo_tpu.models import janus as janus_lib
    from ospo_tpu.models import llama as llama_lib
    from ospo_tpu.models import projector

    if preset == "7b":
        cfg = janus_lib.JANUS_PRO_7B
    elif preset == "1b":
        cfg = janus_lib.JANUS_PRO_1B
    else:
        cfg = janus_lib.tiny_janus_config()

    quant_mode = os.environ.get("OSPO_BENCH_QUANT")
    quant_mode = quant_mode if quant_mode in (
        "int8", "w8a8", "int4", "int4g", "int4n") else None

    def init(key):
        k_lm, k_gal, k_gh, k_ge = jax.random.split(key, 4)
        lm = llama_lib.init_params(cfg.language, k_lm)
        if os.environ.get("OSPO_BENCH_MODE") != "text":
            # lm_head is unused on the image-decode path — stub it
            # (~0.8GB HBM); text decode samples from it, keep it there
            lm["lm_head"] = jnp.zeros((1, 1), cfg.language.dtype)
        if quant_mode:
            # fused init+quantize: the bf16 stacks never co-reside with the
            # quantized output (XLA frees each as it is consumed)
            from ospo_tpu.ops import quant

            lm = quant.quantize_llama_params(lm, mode=quant_mode)
        return {
            "language_model": lm,
            "gen_aligner": projector.init_mlp_projector(
                k_gal, cfg.gen_embed_dim, cfg.n_embed, cfg.gen_aligner_depth,
                cfg.dtype,
            ),
            "gen_head": projector.init_vision_head(
                k_gh, cfg.n_embed, cfg.n_embed, cfg.image_token_size, cfg.dtype
            ),
            "gen_embed": (
                jax.random.normal(
                    k_ge, (cfg.image_token_size, cfg.gen_embed_dim), jnp.float32
                ) * 0.02
            ).astype(cfg.dtype),
        }

    params = jax.jit(init)(jax.random.PRNGKey(0))
    if quant_mode:
        print(f"# {quant_mode} weight quantization enabled", file=sys.stderr)
    sharpen = float(os.environ.get("OSPO_BENCH_SHARPEN", "0") or 0)
    if sharpen:
        # scale the gen-head output layer: random-init logits are
        # near-uniform (SJD acceptance floor ~1.04 tok/iter — drafts from
        # flat distributions almost never re-sample consistently), so a
        # sharpened head gives an honest acceptance-vs-output-entropy
        # characterization of the SJD machinery without trained weights
        gh = dict(params["gen_head"])
        gh["head"] = {k: (v * sharpen if k == "w" else v)
                      for k, v in gh["head"].items()}
        params = {**params, "gen_head": gh}
        print(f"# gen_head sharpened x{sharpen} (SJD acceptance probe)",
              file=sys.stderr)
    return janus_lib.JanusModel(cfg, params)


def bench_train(preset: str) -> None:
    """Secondary mode (OSPO_BENCH_MODE=train): SimPO samples/sec/chip —
    the full jitted train step (VQ encode → 2B remat forward → SimPO →
    LoRA AdamW) on synthetic 384px pairs."""
    import dataclasses

    import numpy as np

    from ospo_tpu.config import Config
    from ospo_tpu.image_processing import ImageProcessor
    from ospo_tpu.models import janus as janus_lib
    from ospo_tpu.processing import Processor
    from ospo_tpu.tokenizer import ByteTokenizer
    from ospo_tpu.train.trainer import SimPOTrainer

    if preset == "7b":
        cfg = janus_lib.JANUS_PRO_7B
    elif preset == "1b":
        cfg = janus_lib.JANUS_PRO_1B
    else:
        cfg = janus_lib.tiny_janus_config()
    # the SimPO step never touches the understanding tower or lm_head —
    # shrink them to reclaim HBM for the train batch
    cfg = dataclasses.replace(
        cfg, vision=dataclasses.replace(cfg.vision, layers=1, width=128)
    )
    qb_env = os.environ.get("OSPO_BENCH_QUANT")
    quant_base = qb_env if qb_env in ("int8", "w8a8") else False
    model = janus_lib.JanusModel.init(cfg, seed=0, quantize=quant_base)
    model.params["language_model"]["lm_head"] = jnp.zeros((1, 1), cfg.dtype)
    if quant_base:
        print(f"# QLoRA: {quant_base} frozen trunk", file=sys.stderr)

    tok = ByteTokenizer(vocab_size=min(512, cfg.language.vocab_size))
    proc = Processor(tok, ImageProcessor(image_size=cfg.gen_image_size),
                     num_image_tokens=cfg.num_image_tokens)
    config = Config.from_nested({
        "base": {"save_path": "/tmp/ospo_bench_train", "exp_name": "bench"},
        "use_peft": True,
        "lora": {"lora_rank": 32, "lora_alpha": 64, "lora_dropout": 0.05},
        "optimizer": {"init_lr": 4e-5, "scheduler_type": "constant"},
        "experiment": {"seed": 0, "max_training_steps": 10,
                       "gradient_checkpointing": True, "log_steps": 100,
                       # QLoRA-style int8/w8a8 frozen trunk
                       # (OSPO_BENCH_QUANT; the init above already
                       # quantized, so this only records intent)
                       "quantize_base": quant_base},
        "algo": {"beta": 10, "gamma_beta_ratio": 0.5, "loss_type": "sigmoid"},
    })
    trainer = SimPOTrainer(config, model, proc)

    batch_env = os.environ.get("OSPO_BENCH_BATCH")
    batches = [int(batch_env)] if batch_env else [2, 1]
    s = cfg.gen_image_size
    # text bucket per sample; the 2.04-samples/s POINT is text_len=32
    # (608-token rows). Integrated rounds pin the bucket to the run's
    # longest prompt (trainer.fit), so reconciliation A/Bs raise this.
    text_len = int(os.environ.get("OSPO_BENCH_TRAIN_TEXT", "32"))
    key = jax.random.PRNGKey(5)
    for b in batches:
        try:
            def make_batch(i):
                # fresh random pixels per step: identical inputs can be
                # memoized by remote executors and report fake timings
                k = jax.random.fold_in(key, i)
                return {
                    "text_ids": jnp.ones((b, text_len), jnp.int32),
                    "text_mask": jnp.ones((b, text_len), jnp.float32),
                    "chosen_pixels": jax.random.uniform(k, (b, s, s, 3)) * 2 - 1,
                    "rejected_pixels": jax.random.uniform(
                        jax.random.fold_in(k, 1), (b, s, s, 3)) * 2 - 1,
                }

            t0 = time.time()
            tr, opt, m = trainer._step(trainer.trainable, trainer.opt_state,
                                       **make_batch(0), rng=key)
            jax.block_until_ready(tr)
            compile_s = time.time() - t0
            times = []
            for i in range(1, 4):
                t0 = time.time()
                tr, opt, m = trainer._step(tr, opt, **make_batch(i),
                                           rng=jax.random.fold_in(key, i))
                float(m["loss"])  # full sync
                times.append(time.time() - t0)
            dt = min(times)
            print(f"# train preset={preset} batch={b} text_len={text_len} "
                  f"compile={compile_s:.1f}s "
                  f"step={dt:.2f}s loss={float(m['loss']):.4f}",
                  file=sys.stderr)
            print(json.dumps({
                "metric": "simpo-samples/sec/chip",
                "value": round(b / dt, 3),
                "unit": "samples/s",
                "vs_baseline": 0.0,  # no reference number exists (BASELINE.md)
                "batch": b,
                "text_len": text_len,
                "preset": preset,
            }))
            return
        except Exception as e:
            print(f"# train batch {b} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    print(json.dumps({"metric": "simpo-samples/sec/chip", "value": 0.0,
                      "unit": "samples/s", "vs_baseline": 0.0,
                      "error": "all batch sizes failed"}))


def bench_text(preset: str) -> None:
    """Secondary mode (OSPO_BENCH_MODE=text): steps 1/2/4a text decode
    throughput — new tokens/sec/chip for the jitted prefill +
    while-loop decode engine (vs HF ``generate`` at
    ospo/wrapper/text_generation.py:63-81).  With random-init weights the
    all-rows-EOS early exit fires with probability ~0, so every row
    decodes the full budget — the worst case; real runs exit early."""
    # production serving defaults, like the image mode (bf16 7B + large
    # batches OOMs the 16GB chip hard enough to crash the worker)
    os.environ.setdefault("OSPO_BENCH_QUANT", "int8")
    os.environ.setdefault("OSPO_BENCH_KV", "int8")
    model = build_bench_model(preset)
    from ospo_tpu.engine.text_engine import TextGenEngine
    from ospo_tpu.image_processing import ImageProcessor
    from ospo_tpu.processing import Processor
    from ospo_tpu.tokenizer import ByteTokenizer

    tok = ByteTokenizer(vocab_size=min(512, model.cfg.language.vocab_size))
    proc = Processor(tok, ImageProcessor(image_size=model.cfg.gen_image_size),
                     num_image_tokens=model.cfg.num_image_tokens)
    max_new = int(os.environ.get("OSPO_BENCH_TOKENS", "256"))
    batch_env = os.environ.get("OSPO_BENCH_BATCH")
    batches = [int(batch_env)] if batch_env else [64, 48, 32, 16]  # 80 OOMs
    prompt = "A" * int(os.environ.get("OSPO_BENCH_PROMPT_LEN", "120"))
    # step-2-shaped batches: a shared template prefix (PROMPT_LEN) plus a
    # DISTINCT per-row tail of TAIL_LEN tokens (default 0 → identical rows,
    # the step-1 shape). Tails break the common prefix exactly where the
    # per-item text starts, so the shared-prefix program splits there.
    tail_len = int(os.environ.get("OSPO_BENCH_TAIL_LEN", "0"))
    # production sampler knob (round 5): configs/step2.yaml samples with
    # top_p=0.5 — the r4 stage POINTs ran top_p=None, and the integrated
    # round exposed a ~4x gap from the full-vocab nucleus sort
    # (ROUND_r05.json step2).  OSPO_BENCH_TOP_P measures the real regime.
    top_p_env = os.environ.get("OSPO_BENCH_TOP_P")
    engine = TextGenEngine(model, proc, max_new_tokens=max_new,
                           temperature=1.0, do_sample=True,
                           top_p=float(top_p_env) if top_p_env else None,
                           kv_quant=os.environ.get("OSPO_BENCH_KV") or False)
    for b in batches:
        try:
            prompts = [prompt + ("%04d" % i) * max(0, (tail_len + 3) // 4)
                       for i in range(b)] if tail_len else [prompt] * b
            # which program this batch dispatches to ("shared" = the
            # template-prefix KV is stored once; OSPO_SHARED_PREFIX=0
            # reverts to the per-row plain path for A/B runs)
            kind = engine.signature_for(prompts)[0]
            t0 = time.time()
            engine.generate_ids(prompts, seed=0)
            compile_s = time.time() - t0
            times = []
            for it in range(3):
                t0 = time.time()
                out = engine.generate_ids(prompts, seed=it + 1)
                times.append(time.time() - t0)
            dt = min(times)
            assert out.shape == (b, max_new)
            print(f"# text preset={preset} batch={b} max_new={max_new} "
                  f"path={kind} compile={compile_s:.1f}s decode={dt:.2f}s",
                  file=sys.stderr)
            print(json.dumps({
                "metric": "text-tokens/sec/chip",
                "value": round(b * max_new / dt, 1),
                "unit": "tok/s",
                "vs_baseline": 0.0,  # no reference number exists
                "batch": b,
                "preset": preset,
            }))
            return
        except Exception as e:
            print(f"# text batch {b} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    print(json.dumps({"metric": "text-tokens/sec/chip", "value": 0.0,
                      "unit": "tok/s", "vs_baseline": 0.0,
                      "error": "all batch sizes failed"}))


def bench_score(preset: str) -> None:
    """Secondary mode (OSPO_BENCH_MODE=score): step-4b self-VQA scoring
    throughput — multimodal forwards (SigLIP + splice + trunk) per second,
    from which preference pairs/hour follows (6 images × ~Q questions per
    pair)."""
    import dataclasses

    import numpy as np
    from PIL import Image

    from ospo_tpu.engine.scoring import ScoringEngine
    from ospo_tpu.image_processing import ImageProcessor
    from ospo_tpu.models import janus as janus_lib
    from ospo_tpu.processing import Processor
    from ospo_tpu.tokenizer import ByteTokenizer

    if preset == "7b":
        cfg = janus_lib.JANUS_PRO_7B
    elif preset == "1b":
        cfg = janus_lib.JANUS_PRO_1B
    else:
        cfg = janus_lib.tiny_janus_config()
    # production serving defaults (configs/step4.yaml: quantize int8 +
    # int8 prefix KV — the measured 3853.5 pairs/h rows=16 point); a bf16
    # 7B trunk at the default rows OOMs the 16 GB chip by ~10 GB.  Explicit
    # OSPO_BENCH_QUANT= (empty) selects bf16, OSPO_BENCH_SCORE_KV=bf16
    # a full-precision prefix cache.
    os.environ.setdefault("OSPO_BENCH_QUANT", "int8")
    os.environ.setdefault("OSPO_BENCH_SCORE_KV", "int8")
    # W8A16 trunk fused into the init program (matmuls consume {"q","s"}
    # dicts transparently); the ViT/aligner stay bf16
    quant_mode = os.environ.get("OSPO_BENCH_QUANT")
    quant_mode = (quant_mode
                  if quant_mode in ("int8", "w8a8", "int4", "int4g", "int4n")
                  else False)
    model = janus_lib.JanusModel.init(cfg, seed=0, quantize=quant_mode)
    if quant_mode:
        print(f"# {quant_mode} weight quantization enabled",
              file=sys.stderr)

    tok = ByteTokenizer(vocab_size=min(512, cfg.language.vocab_size))
    proc = Processor(tok, ImageProcessor(image_size=cfg.vision.image_size),
                     num_image_tokens=cfg.num_image_tokens)
    engine = ScoringEngine(
        model, proc,
        kv_quant=os.environ.get("OSPO_BENCH_SCORE_KV") == "int8")
    side = cfg.vision.image_size
    rng = np.random.default_rng(0)
    # cross-item chunks (round 3): images from DIFFERENT items share one
    # shared-prefix program; question lists vary per item like production
    qsets = [
        ["Is there a black umbrella?", "Is the umbrella open?",
         "Does this image accurately represent the prompt?"],
        ["Is there a red car?", "Is it parked?", "Is it daytime?",
         "Does this image accurately represent the prompt?"],
        ["Is there a dog?",
         "Does this image accurately represent the prompt?"],
    ]
    group = int(os.environ.get("OSPO_BENCH_SCORE_ROWS", "16"))

    def img(i):
        return Image.fromarray(
            (rng.random((side, side, 3)) * 255).astype(np.uint8))

    uniform = os.environ.get("OSPO_BENCH_SCORE_UNIFORM") == "1"

    def chunk(base):
        imgs = [img(base + j) for j in range(group)]
        if uniform:
            # step 4 sorts jobs by question count before chunking, so
            # production chunks are Q-uniform — no padded suffix slots.
            # One fixed 3-question set: same mean suffix work as the
            # mixed variant (Q = 3 vs mean 3), steady-state signature
            qs = [qsets[0]] * group
        else:
            # 6 consecutive images (one item) share a question list
            qs = [qsets[(base + j) // 6 % len(qsets)] for j in range(group)]
        return imgs, qs

    t0 = time.time()
    engine.score_images_multi(*chunk(0))  # compile
    compile_s = time.time() - t0
    # steady-state per-chunk wall clock over 3 chunks.  Default mirrors
    # step4.run_scoring: the next chunk's host prep (image synth +
    # tokenize + preprocess) runs on a prefetch thread under the current
    # chunk's device call.  OSPO_BENCH_SCORE_PREFETCH=0 = serial.
    prefetch = os.environ.get("OSPO_BENCH_SCORE_PREFETCH", "1") == "1"

    def prep_c(base):
        imgs, qs = chunk(base)
        return imgs, qs, engine.prepare_shared_multi(imgs, qs)

    # per-iteration wall clock (prep-wait + device), warmup iteration
    # excluded, min-of-3 (tunnel RTT hiccups ride on every chunk —
    # BENCH_NOTES measurement pitfalls)
    n_meas = 3
    times = []
    if prefetch:
        from ospo_tpu.utils.prefetch import prefetch_iter

        last = None
        for _, (imgs, qs, prep) in prefetch_iter(
                [k * group for k in range(1, n_meas + 2)], prep_c):
            engine.score_images_multi(imgs, qs, prep=prep)
            now = time.time()
            if last is not None:  # 1st iteration's prep had nothing to hide under
                times.append(now - last)
            last = now
    else:
        for i in range(1, n_meas + 2):
            t0 = time.time()
            engine.score_images_multi(*chunk(i * group))
            if i > 1:
                times.append(time.time() - t0)
    dt = min(times)
    imgs_per_sec = group / dt
    pairs_per_hour = imgs_per_sec / 6 * 3600  # 6 images per item/pair
    print(f"# score preset={preset} compile={compile_s:.1f}s img={dt:.2f}s "
          f"preimg={'1' if engine.pre_image_prefix else '0'} rows={group}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "pref-pairs/hour/chip",
        "value": round(pairs_per_hour, 1),
        "unit": "pairs/h",
        "vs_baseline": 0.0,  # no reference number exists (BASELINE.md)
        "images_per_sec": round(imgs_per_sec, 3),
        "prefetch": prefetch,
        "preset": preset,
    }))


def _require_live_backend(timeout_s: int = 900) -> None:
    """Fail fast (exit 2, no JSON on stdout) if the backend is
    unreachable — see ``platform.require_live_backend``.
    ``OSPO_BENCH_PROBE_S`` overrides the 15-min default; 0 disables."""
    from ospo_tpu.platform import require_live_backend

    require_live_backend(int(os.environ.get("OSPO_BENCH_PROBE_S",
                                            timeout_s)))


def main() -> None:
    from ospo_tpu.platform import apply_platform_env

    # persistent compile cache (repeat bench invocations skip the
    # 160-600 s remote cold compiles; OSPO_COMPILE_CACHE=off disables)
    # + the OSPO_PLATFORM override, applied BEFORE the liveness probe so
    # `OSPO_PLATFORM=cpu python bench.py` checks plumbing without ever
    # touching the (possibly dead) tunneled backend
    apply_platform_env()
    _require_live_backend()
    preset = os.environ.get("OSPO_BENCH_PRESET", "7b")
    mode = os.environ.get("OSPO_BENCH_MODE")
    if mode == "train":
        bench_train(preset)
        return
    if mode == "score":
        bench_score(preset)
        return
    if mode == "text":
        bench_text(preset)
        return
    n_tokens = int(os.environ.get("OSPO_BENCH_TOKENS", "576"))
    prompt_len = int(os.environ.get("OSPO_BENCH_PROMPT_LEN", "64"))
    batch_env = os.environ.get("OSPO_BENCH_BATCH")
    # default = the production serving configuration: weight-only int8 +
    # int8 KV cache (set OSPO_BENCH_QUANT/OSPO_BENCH_KV=bf16 for full
    # precision; quality bounded by tests/test_quant.py / test_kv_quant.py)
    os.environ.setdefault("OSPO_BENCH_QUANT", "int8")
    os.environ.setdefault("OSPO_BENCH_KV", "int8")

    from ospo_tpu.engine.image_engine import ImageGenEngine
    from ospo_tpu.image_processing import ImageProcessor
    from ospo_tpu.processing import Processor
    from ospo_tpu.tokenizer import ByteTokenizer

    model = build_bench_model(preset)
    # byte ids (<512) are valid indices into any of the model vocab sizes
    tok = ByteTokenizer(vocab_size=min(512, model.cfg.language.vocab_size))
    proc = Processor(tok, ImageProcessor(image_size=model.cfg.gen_image_size),
                     num_image_tokens=model.cfg.num_image_tokens)
    engine = ImageGenEngine(
        model, proc, cfg_weight=5.0, temperature=1.0,
        image_token_num=n_tokens,
        img_size=model.cfg.gen_image_size,
        patch_size=model.cfg.vq.downsample_factor,
        batch_bucketing=False,  # measure the exact requested batch
        kv_quant=os.environ.get("OSPO_BENCH_KV") or False,
        decode_kernel=os.environ.get("OSPO_BENCH_DECODE_KERNEL") == "1",
        # growing-window segmented decode: +25% at B=24 shbd int8 (898 vs
        # 721 tok/s on v5e); no-op for the Pallas kernel (it streams the
        # populated prefix itself) and unsupported under SJD
        decode_segments=int(os.environ.get("OSPO_BENCH_SEGMENTS", "8")),
        speculative=int(os.environ.get("OSPO_BENCH_SJD", "0")),
        # batch-minor cache: avoids XLA's in-loop layout copies of the int8
        # cache at large batch (721.2 tok/s at B=24 vs 681.5 position-major).
        # Kernel/SJD runs need per-head/per-row layouts — let the engine pick.
        kv_layout=(
            os.environ.get("OSPO_BENCH_KV_LAYOUT", "shbd")
            if os.environ.get("OSPO_BENCH_DECODE_KERNEL") != "1"
            and not int(os.environ.get("OSPO_BENCH_SJD", "0"))
            else os.environ.get("OSPO_BENCH_KV_LAYOUT")
        ),
    )

    # 16GB v5e, 7B int8: weights ~6.6GB + int8 KV ~0.31GB/CFG pair.
    # With the batch-minor cache layout throughput peaks at B≈24
    # (position-major peaked at B=20: XLA made in-loop layout copies);
    # bf16 (OSPO_BENCH_QUANT=bf16): ~11.4GB + 1.26GB/pair → B=4 max
    qmode = os.environ.get("OSPO_BENCH_QUANT")
    quantized = qmode in ("int8", "w8a8", "int4", "int4g", "int4n")
    # int4 KV: half the int8 cache bytes -> larger serving batches fit
    # (absolute peak: B=44 -> 1071.9 tok/s, but the batch-matched ratio
    # drops to 1.19 -- the modeled A100's bandwidth edge grows with batch)
    if os.environ.get("OSPO_BENCH_KV") == "int4":
        default_batches = [44, 40, 36, 32, 28]  # 48 OOMs
    elif qmode in ("int4", "int4g", "int4n"):
        # int4 weights free ~3.3 GB vs int8 -> the measured peak moves to
        # B=32 (1062.4 tok/s with the qualified int8 KV, BENCH_NOTES)
        default_batches = [32, 28, 24, 20]
    else:
        # B=24 is the serving default: the absolute int8 peak (993.9
        # tok/s, 1.88x batch-matched).  The BATCH-MATCHED-ratio peak is
        # B=20 (923.0 = 2.066x, the BASELINE.md north star form) — it is
        # measured SECONDARILY below and reported as "ratio_point", so
        # the headline tracks round wall-clock while the 2x claim stays
        # auditable (round-4 re-anchoring; VERDICT r3 item 2).
        default_batches = [24, 20, 16, 8, 1] if quantized else [4, 2, 1]
    batches = [int(batch_env)] if batch_env else default_batches
    prompt = "A" * prompt_len  # byte tokenizer → prompt_len tokens

    def measure(b):
        """Compile + 3 timed decodes at batch b → (tok/s, step_ms)."""
        prompts = [prompt] * b
        t0 = time.time()
        engine.generate_tokens(prompts, seed=0)  # compile + warmup
        compile_s = time.time() - t0
        times = []
        for it in range(3):
            t0 = time.time()
            out = engine.generate_tokens(prompts, seed=it + 1)
            times.append(time.time() - t0)
        assert out.shape == (b, n_tokens)
        dt = min(times)
        print(
            f"# preset={preset} batch={b} prompt_len={prompt_len} "
            f"tokens={n_tokens} compile={compile_s:.1f}s decode={dt:.2f}s",
            file=sys.stderr,
        )
        return b * n_tokens / dt, dt / n_tokens * 1e3

    value = None
    used_batch = None
    step_ms = None
    for b in batches:
        try:
            value, step_ms = measure(b)
            used_batch = b
            break
        except Exception as e:  # OOM → retry smaller batch
            print(f"# batch {b} failed: {type(e).__name__}: {e}", file=sys.stderr)
            continue

    if value is None:
        print(json.dumps({"metric": "img-tokens/sec/chip", "value": 0.0,
                          "unit": "tok/s", "vs_baseline": 0.0,
                          "error": "all batch sizes failed"}))
        return

    # achieved HBM bandwidth fraction: weights actually resident (counts
    # the int8 payload+scales when quantized) + KV at mean populated length
    lcfg = model.cfg.language
    # 'embed' is excluded: the image-decode loop embeds via gen_embed /
    # gen_aligner and only gathers a few embed rows at prefill, so the
    # 0.84 GB bf16 table is not part of the per-step stream
    wbytes = sum(leaf.size * leaf.dtype.itemsize
                 for key, sub in model.params["language_model"].items()
                 if key != "embed"
                 for leaf in jax.tree.leaves(sub))
    wbytes += sum(leaf.size * leaf.dtype.itemsize
                  for leaf in jax.tree.leaves(
                      {k: model.params[k]
                       for k in ("gen_aligner", "gen_head", "gen_embed")}))
    kv_item = {"int8": 1, "int4": 0.5}.get(
        os.environ.get("OSPO_BENCH_KV"), 2)
    s_avg = prompt_len + n_tokens / 2
    kv_bytes = (2 * used_batch * 2 * lcfg.num_layers * s_avg
                * lcfg.kv_heads * lcfg.dim_head * kv_item)
    bw_pct = (wbytes + kv_bytes) / 1e9 / V5E_BW_GBPS / (step_ms / 1e3) * 100

    # secondary batch-matched-RATIO point (B=20): the modeled A100
    # denominator shrinks faster than the TPU numerator below the
    # absolute peak, so the best vs_baseline sits at a smaller batch
    # than the best tok/s.  Measured in the same run so the headline
    # (absolute, round-wall-clock-anchored) and the 2x claim can never
    # drift apart silently.  OSPO_BENCH_RATIO_POINT=0 skips it.
    RATIO_BATCH = 20
    ratio_point = None
    if (not batch_env and preset == "7b" and qmode == "int8"
            and used_batch is not None and used_batch != RATIO_BATCH
            and os.environ.get("OSPO_BENCH_RATIO_POINT", "1") == "1"):
        try:
            rv, _ = measure(RATIO_BATCH)
            rref = modeled_ref_toks(RATIO_BATCH, prompt_len, n_tokens,
                                    model.cfg.language)
            ratio_point = {"batch": RATIO_BATCH, "value": round(rv, 2),
                           "vs_baseline": round(rv / rref, 3)}
        except Exception as e:
            print(f"# ratio point failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    ref_toks = modeled_ref_toks(used_batch, prompt_len, n_tokens, lcfg)
    print(json.dumps({
        "metric": "img-tokens/sec/chip",
        "value": round(value, 2),
        "unit": "tok/s",
        # ratio to the batch-matched modeled A100 reference (see header);
        # BASELINE.md north star is vs_baseline >= 2.0
        "vs_baseline": round(value / ref_toks, 3),
        "ref_est_toks": round(ref_toks, 1),
        "step_ms": round(step_ms, 2),
        "hbm_bw_pct": round(bw_pct, 1),
        "batch": used_batch,
        "preset": preset,
        **({"ratio_point": ratio_point} if ratio_point else {}),
        # SJD runs: Jacobi iterations of the last call + accepted
        # tokens/iteration (the speedup driver; ~1.04 on flat random-init
        # logits, probe entropy dependence via OSPO_BENCH_SHARPEN)
        **({"sjd_iters": engine.last_sjd_iters,
            "tok_per_iter": round(n_tokens / engine.last_sjd_iters, 3)}
           if int(os.environ.get("OSPO_BENCH_SJD", "0")) else {}),
    }))


if __name__ == "__main__":
    main()
