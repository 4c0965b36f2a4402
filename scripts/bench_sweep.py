"""Serving-point sweep for the CFG decode engine (round-3 VERDICT #2).

Runs several (batch, segments, kv_quant) points in ONE process — the 7B
model is built once and every engine shares its params — and prints a
JSON line per point with tok/s and the batch-matched reference estimate
(bench.py's model), so the recorded serving default can be chosen as the
max-throughput point with vs_baseline >= 2.0.

    OSPO_SWEEP="24:8:int8,22:8:int8,20:8:int8" python scripts/bench_sweep.py

Each point is B:segments:kv (kv in int8|int4|bf16). Points should be
ordered smallest-memory first: on the tunneled chip a failed allocation
can poison later ones, so OOM aborts the remaining sweep loudly.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from ospo_tpu.platform import enable_compilation_cache

    enable_compilation_cache()
    spec = os.environ.get("OSPO_SWEEP", "24:8:int8")
    points = []
    for part in spec.split(","):
        b, seg, kv = part.strip().split(":")
        points.append((int(b), int(seg), kv))

    import bench as bench_mod
    from ospo_tpu.engine.image_engine import ImageGenEngine
    from ospo_tpu.image_processing import ImageProcessor
    from ospo_tpu.processing import Processor
    from ospo_tpu.tokenizer import ByteTokenizer

    preset = os.environ.get("OSPO_BENCH_PRESET", "7b")
    n_tokens = int(os.environ.get("OSPO_BENCH_TOKENS", "576"))
    prompt_len = int(os.environ.get("OSPO_BENCH_PROMPT_LEN", "64"))
    os.environ.setdefault("OSPO_BENCH_QUANT", "int8")

    model = bench_mod.build_bench_model(preset)
    tok = ByteTokenizer(vocab_size=min(512, model.cfg.language.vocab_size))
    proc = Processor(tok, ImageProcessor(image_size=model.cfg.gen_image_size),
                     num_image_tokens=model.cfg.num_image_tokens)
    prompt = "A" * prompt_len

    results = []
    for b, seg, kv in points:
        engine = ImageGenEngine(
            model, proc, cfg_weight=5.0, temperature=1.0,
            image_token_num=n_tokens,
            img_size=model.cfg.gen_image_size,
            patch_size=model.cfg.vq.downsample_factor,
            batch_bucketing=False,
            kv_quant=kv if kv in ("int8", "int4") else False,
            decode_segments=seg, kv_layout="shbd",
        )
        prompts = [prompt] * b
        try:
            t0 = time.time()
            engine.generate_tokens(prompts, seed=0)      # compile + warmup
            compile_s = time.time() - t0
            times = []
            for it in range(3):
                t0 = time.time()
                out = engine.generate_tokens(prompts, seed=it + 1)
                times.append(time.time() - t0)
            assert out.shape == (b, n_tokens)
            dt = min(times)
            toks = b * n_tokens / dt
            ref = bench_mod.modeled_ref_toks(b, prompt_len, n_tokens,
                                             model.cfg.language)
            rec = {"batch": b, "segments": seg, "kv": kv,
                   "tok_s": round(toks, 1),
                   "step_ms": round(dt / n_tokens * 1e3, 2),
                   "ref_est": round(ref, 1),
                   "vs_baseline": round(toks / ref, 3),
                   "compile_s": round(compile_s, 1)}
            results.append(rec)
            print(json.dumps(rec), flush=True)
        except Exception as e:
            print(json.dumps({"batch": b, "segments": seg, "kv": kv,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            print("# aborting remaining sweep (failed allocations can "
                  "poison later points on this backend)", file=sys.stderr)
            break

    if results:
        best = max((r for r in results if r["vs_baseline"] >= 2.0),
                   key=lambda r: r["tok_s"], default=None)
        peak = max(results, key=lambda r: r["tok_s"])
        print(json.dumps({"peak": peak, "best_2x": best}), flush=True)


if __name__ == "__main__":
    main()
