"""Headline benchmark: Janus-Pro-7B CFG image-token decode throughput.

Measures img-tokens/sec/chip for the step-3 hot path — prompt prefill +
576-token autoregressive decode with classifier-free guidance (fused 2B
cond/uncond batch, KV cache, in-graph sampling) — on the available
accelerator with random-init bf16 weights (throughput is
weight-value-independent).

Prints ONE JSON line:
  {"metric": "img-tokens/sec/chip", "value": N, "unit": "tok/s",
   "vs_baseline": N}

``vs_baseline`` is measured against an A100 estimate for the reference's
eager-torch decode loop of the same model (~24 img-tokens/sec at B=1,
i.e. ~24s/image: 576-token HF loop with per-token python dispatch); the
north-star target is ≥2× that (BASELINE.md).

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

# A100 estimate for the reference implementation (see module docstring).
A100_REFERENCE_TOKS = 24.0
TARGET_MULTIPLE = 2.0


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

    def init(key):
        k_lm, k_gal, k_gh, k_ge = jax.random.split(key, 4)
        lm = llama_lib.init_params(cfg.language, k_lm)
        # lm_head is unused on the image-decode path — stub it (~0.8GB HBM)
        lm["lm_head"] = jnp.zeros((1, 1), cfg.language.dtype)
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
    return janus_lib.JanusModel(cfg, params)


def main() -> None:
    preset = os.environ.get("OSPO_BENCH_PRESET", "7b")
    n_tokens = int(os.environ.get("OSPO_BENCH_TOKENS", "576"))
    prompt_len = int(os.environ.get("OSPO_BENCH_PROMPT_LEN", "64"))
    batch_env = os.environ.get("OSPO_BENCH_BATCH")

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
    )

    # 7B on a 16GB v5e: params ~11.4GB + ~1.26GB KV per CFG pair → B=4 max
    batches = [int(batch_env)] if batch_env else [4, 2, 1]
    prompt = "A" * prompt_len  # byte tokenizer → prompt_len tokens

    value = None
    used_batch = None
    for b in batches:
        try:
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
            value = b * n_tokens / dt
            used_batch = b
            print(
                f"# preset={preset} batch={b} prompt_len={prompt_len} "
                f"tokens={n_tokens} compile={compile_s:.1f}s decode={dt:.2f}s",
                file=sys.stderr,
            )
            break
        except Exception as e:  # OOM → retry smaller batch
            print(f"# batch {b} failed: {type(e).__name__}: {e}", file=sys.stderr)
            continue

    if value is None:
        print(json.dumps({"metric": "img-tokens/sec/chip", "value": 0.0,
                          "unit": "tok/s", "vs_baseline": 0.0,
                          "error": "all batch sizes failed"}))
        return

    print(json.dumps({
        "metric": "img-tokens/sec/chip",
        "value": round(value, 2),
        "unit": "tok/s",
        "vs_baseline": round(value / (TARGET_MULTIPLE * A100_REFERENCE_TOKS), 3),
        "batch": used_batch,
        "preset": preset,
    }))


if __name__ == "__main__":
    main()
