"""Inference CLI — T2I generation from a (possibly LoRA-trained) checkpoint
on arbitrary prompt lists.

Equivalent of ``ospo/inference.py``: reads a prompt list JSON, generates
one image per (prompt, seed) into ``{save_path}/{prompt}_{seed}.png``,
captures failed samples into ``error_sample.json``, and prints elapsed
minutes.  Config composes Hydra-style groups (model/peft/trainer/data) via
``compose_config``.
"""

from __future__ import annotations

import argparse
import os
import time
import traceback
from typing import List

from PIL import Image

from ospo_tpu.config import Config, build_config, compose_config
from ospo_tpu.engine.image_engine import ImageGenEngine
from ospo_tpu.io import read_json, save_json, shard_for_process
from ospo_tpu.ops.quant import parse_kv_quant
from ospo_tpu.pipeline.datasets import batched
from ospo_tpu.pipeline.model_factory import get_model


def generate_all(config, engine: ImageGenEngine, prompts: List[str]) -> None:
    os.makedirs(config.save_path, exist_ok=True)
    seeds = config.get("seed") or [0]
    if isinstance(seeds, int):
        seeds = [seeds]
    error_samples = []
    n_long = [0]  # running index for longprompt_* fallback names
    batch_size = int(config.get("batch_size") or 4)
    for seed in seeds:
        for batch in batched(prompts, batch_size):
            paths = []
            todo = []
            for p in batch:
                # reference naming: "{prompt}_{seed}.png" (inference.py:71,177)
                fname = f"{p}_{seed}.png".replace("/", "_")
                path = os.path.join(config.save_path, fname)
                if os.path.exists(path):
                    continue
                todo.append(p)
                paths.append(path)
            if not todo:
                continue
            try:
                images = engine.generate_from_raw_prompts(todo, seed=seed)
            except Exception as e:
                print(f"Error generating batch: {e}")
                traceback.print_exc()
                error_samples.extend(todo)
                continue
            # per-IMAGE saves: one overlong filename (OSError) must not
            # discard the rest of the batch's generated images or tag
            # already-saved prompts as errors; the reference saves such
            # images under a short alternative name (inference.py:177-182)
            for img, path, p in zip(images, paths, todo):
                try:
                    Image.fromarray(img).save(path)
                except OSError:
                    alt = os.path.join(
                        config.save_path,
                        f"longprompt_{seed}_{n_long[0]:04d}.png")
                    n_long[0] += 1
                    try:
                        Image.fromarray(img).save(alt)
                        print(f"# overlong prompt filename — saved {alt}")
                    except Exception as e:
                        print(f"Error saving {path}: {e}")
                        error_samples.append(p)
                except Exception as e:
                    print(f"Error saving {path}: {e}")
                    error_samples.append(p)
    if error_samples:
        save_json(config.save_path, "error_sample", error_samples)


def main(config) -> None:
    start = time.time()
    model, tokenizer, processor = get_model(config)
    gen_cfg = config.get("generation_config") or {}
    engine = ImageGenEngine(
        model, processor,
        cfg_weight=float(gen_cfg.get("cfg_weight", 5.0)),
        temperature=float(gen_cfg.get("temperature", 1.0)),
        image_token_num=model.cfg.num_gen_tokens,
        img_size=model.cfg.gen_image_size,
        patch_size=model.cfg.vq.downsample_factor,
        kv_quant=parse_kv_quant(config.get("kv_quant")),
        # 8 growing windows: +38% decode throughput at the 7B serving
        # point (BENCH_NOTES); no-op for kernel/SJD runs. 0/1 = off
        # (only unset falls back to the default of 8)
        decode_segments=(8 if config.get("decode_segments") is None
                         else int(config.get("decode_segments"))),
        speculative=int(config.get("speculative") or 0),
        decode_kernel=bool(config.get("decode_kernel")),
        kv_layout=config.get("kv_layout"),  # shbd = large-batch serving
        mesh=getattr(model, "mesh", None),
        batch_cap=int(config.batch_size or 0) or None,
    )
    prompts = shard_for_process(read_json(config.data_path))
    generate_all(config, engine, prompts)
    print(f"Elapsed: {(time.time() - start) / 60:.2f} minutes")


if __name__ == "__main__":
    from ospo_tpu.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_path", type=str, default=None)
    parser.add_argument("--config_dir", type=str, default="configs")
    parser.add_argument("--config_name", type=str, default="inference")
    args, _ = parser.parse_known_args()
    if args.cfg_path:
        cfg = build_config(cfg_path=args.cfg_path)
    else:
        cfg = compose_config(args.config_dir, args.config_name)
    main(cfg)
