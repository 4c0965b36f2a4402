"""Profile the 7B CFG decode hot loop on the real TPU.

Usage: python scripts/profile_decode.py [--batch 24] [--tokens 64] [--trace]

Runs the bench configuration (int8 W+KV, shbd cache) for a short decode,
optionally under jax.profiler.trace, and prints step timing + implied HBM
bandwidth so the roofline claim in BENCH_NOTES.md is measured, not guessed.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("OSPO_BENCH_QUANT", "int8")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--tokens", type=int, default=576)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--preset", default="7b")
    ap.add_argument("--kv-layout", default="shbd")
    ap.add_argument("--kv", default="int8")
    ap.add_argument("--segments", type=int, default=1)
    ap.add_argument("--decode-kernel", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as bench_mod
    from ospo_tpu.engine.image_engine import ImageGenEngine
    from ospo_tpu.image_processing import ImageProcessor
    from ospo_tpu.processing import Processor
    from ospo_tpu.tokenizer import ByteTokenizer

    model = bench_mod.build_bench_model(args.preset)
    tok = ByteTokenizer(vocab_size=min(512, model.cfg.language.vocab_size))
    proc = Processor(tok, ImageProcessor(image_size=model.cfg.gen_image_size),
                     num_image_tokens=model.cfg.num_image_tokens)
    engine = ImageGenEngine(
        model, proc, cfg_weight=5.0, temperature=1.0,
        image_token_num=args.tokens,
        img_size=model.cfg.gen_image_size,
        patch_size=model.cfg.vq.downsample_factor,
        batch_bucketing=False,
        kv_quant=args.kv if args.kv in ("int8", "int4") else False,
        kv_layout=args.kv_layout,
        decode_segments=args.segments,
        decode_kernel=args.decode_kernel,
    )
    b = args.batch
    prompts = ["A" * args.prompt_len] * b

    t0 = time.time()
    engine.generate_tokens(prompts, seed=0)
    print(f"compile+warmup: {time.time()-t0:.1f}s", file=sys.stderr)

    times = []
    for it in range(3):
        t0 = time.time()
        out = engine.generate_tokens(prompts, seed=it + 1)
        times.append(time.time() - t0)
    dt = min(times)
    tok_s = b * args.tokens / dt
    ms_step = 1000 * dt / args.tokens

    # roofline math (v5e: ~819 GB/s HBM)
    cfg = model.cfg.language
    n_rows = 2 * b
    wbytes = 0
    for leaf in jax.tree.leaves(model.params["language_model"]):
        wbytes += leaf.size * leaf.dtype.itemsize
    for leaf in jax.tree.leaves({k: model.params[k] for k in
                                 ("gen_aligner", "gen_head", "gen_embed")}):
        wbytes += leaf.size * leaf.dtype.itemsize
    kv_itemsize = {"int8": 1, "int4": 0.5}.get(args.kv, 2)
    s_avg = args.prompt_len + args.tokens / 2
    kv_bytes_avg = (2 * cfg.num_layers * n_rows * s_avg *
                    cfg.kv_heads * cfg.dim_head * kv_itemsize)
    bound_ms = (wbytes + kv_bytes_avg) / 819e9 * 1000
    print(f"batch={b} tokens={args.tokens} decode={dt:.2f}s "
          f"-> {tok_s:.1f} tok/s, {ms_step:.2f} ms/step")
    print(f"weights={wbytes/1e9:.2f} GB  avg-KV={kv_bytes_avg/1e9:.2f} GB "
          f"-> HBM bound ~{bound_ms:.1f} ms/step "
          f"({100*bound_ms/ms_step:.0f}% of roofline)")

    if args.trace:
        trace_dir = "/tmp/ospo_trace"
        with jax.profiler.trace(trace_dir):
            engine.generate_tokens(prompts, seed=99)
        print(f"trace written to {trace_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
