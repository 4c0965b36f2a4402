"""Step 3 — image generation (the throughput-critical stage).

CLI/JSON/PNG-contract equivalent of ``ospo/step3.py`` +
``JanusProImageGenWrapper`` (``ospo/wrapper/image_generation.py``): for each
item, 3 base + 3 negative images (seed_list [0,1,2] per perturbation index),
saved as ``{save_path}/{base|negative}/{category}/{item_id}/{i:02d}.png``
with a ``metadata.json`` next to them; skip-if-exists restart idempotency.

The decode itself runs on the jitted CFG engine (one fused cond/uncond
batch, 576-token scan) — see ``ospo_tpu.engine.image_engine``.
"""

from __future__ import annotations

import argparse
import os
import traceback
from typing import List

from PIL import Image

from ospo_tpu.config import build_config
from ospo_tpu.engine.image_engine import ImageGenEngine
from ospo_tpu.io import save_json, shard_for_process
from ospo_tpu.ops.quant import parse_kv_quant
from ospo_tpu.pipeline.datasets import batched, load_base_dataset
from ospo_tpu.pipeline.model_factory import get_model
from ospo_tpu.processing import t2i_prompt


def save_images(images, paths: List[str]) -> None:
    for img, path in zip(images, paths):
        try:
            Image.fromarray(img).save(path)
        except OSError:  # over-long file name fallback (reference quirk)
            idx_in_path = os.path.basename(path)
            Image.fromarray(img).save(f"longprompt_{idx_in_path}")


def run_step3(config, engine: ImageGenEngine, processor, data: List[dict]) -> None:
    from concurrent.futures import ThreadPoolExecutor

    from ospo_tpu.utils.profiling import ThroughputMeter

    batch_size = int(config.batch_size or 4)
    seed_list = list(config.seed_list)
    done = 0
    failed_batches = 0
    n_batches = 0
    meter = ThroughputMeter()
    # AOT-compile the first batch's decode signature while the host is
    # still globbing/mkdir-ing (with the persistent compile cache this is
    # a no-op from the second invocation on)
    first_sig = None
    if data:
        first = [t2i_prompt(processor, p)
                 for s in data[:batch_size]
                 for p in (s.get("long_prompt") or [])[:1] if p]
        if first:
            try:
                first_sig = engine.signature_for(first)
                engine.prewarm([first_sig])
            except Exception as e:  # prewarm is best-effort
                print(f"# step3 prewarm skipped: {e}")
    # PNG encodes overlap the next batch's device decode
    png_pool = ThreadPoolExecutor(max_workers=2)
    pending = []
    # async device→host fetches raise IN THE WORKER (np.asarray surfaces
    # deferred XLA errors there) — count them here so the per-batch fault
    # tolerance and the all-failed guard still see them
    import threading

    # the REST of the run's signatures — resume-skipped groups and the
    # final partial batch land in smaller batch buckets than the steady
    # state — AOT-compile on a background thread while the serving loop
    # runs (mirrors steps 2/4a's all-signature prewarm; with the
    # persistent compile cache this only ever pays once per signature)
    def _prewarm_rest():
        try:
            sigs = set()
            for pbatch in batched(data, batch_size):
                lists = [[] for _ in range(6)]
                for sample in pbatch:
                    for ptype, prompts, offset in (
                            ("base", sample.get("long_prompt") or [], 0),
                            ("negative",
                             sample.get("negative_long_prompt") or [], 3)):
                        for i in range(min(3, len(prompts))):
                            if not prompts[i]:
                                continue
                            fp = os.path.join(
                                config.save_path, ptype, sample["category"],
                                sample["item_id"], f"{i:02d}.png")
                            if os.path.exists(fp):
                                continue
                            lists[i + offset].append(
                                t2i_prompt(processor, prompts[i]))
                for idx in range(6):
                    if lists[idx]:
                        sigs.add(engine.signature_for(lists[idx]))
            sigs.discard(first_sig)
            if sigs:
                n = engine.prewarm(sigs)
                print(f"# step3 background prewarm: {n} extra signatures")
        except Exception as e:  # best-effort, never blocks serving
            print(f"# step3 background prewarm skipped: {e}")

    if data:
        threading.Thread(target=_prewarm_rest, daemon=True).start()

    write_lock = threading.Lock()
    writer_stats = {"ok": 0, "failed": 0}
    for batch in batched(data, batch_size):
        n_batches += 1
        prompt_lists = [[] for _ in range(6)]
        path_lists = [[] for _ in range(6)]
        try:
            for sample in batch:
                item_id = sample["item_id"]
                category = sample["category"]
                groups = (("base", sample["long_prompt"], 0),
                          ("negative", sample["negative_long_prompt"], 3))
                for prompt_type, prompts, offset in groups:
                    save_dir = os.path.join(
                        config.save_path, prompt_type, category, item_id
                    )
                    os.makedirs(save_dir, exist_ok=True)
                    save_json(save_dir, "metadata", sample)
                    for i in range(3):
                        prompt = prompts[i]
                        if not prompt:
                            continue
                        final_path = os.path.join(save_dir, f"{i:02d}.png")
                        if os.path.exists(final_path):  # restart resume
                            continue
                        idx = i + offset
                        prompt_lists[idx].append(t2i_prompt(processor, prompt))
                        path_lists[idx].append(final_path)

            for idx in range(6):
                if not prompt_lists[idx]:
                    continue
                # device pixels, no host sync — the worker thread fetches
                # them while the device runs the NEXT group's decode
                # (double-buffered: device↔host copy + PNG encode overlap
                # device compute)
                device_images = engine.generate_images_device(
                    prompt_lists[idx], seed=seed_list[idx % 3]
                )
                n_real = len(path_lists[idx])

                def fetch_and_save(dev=device_images, paths=path_lists[idx],
                                   n=n_real):
                    import numpy as _np

                    try:
                        save_images(_np.asarray(dev)[:n], paths)
                        with write_lock:
                            writer_stats["ok"] += 1
                    except Exception as e:  # one group, not the stage
                        with write_lock:
                            writer_stats["failed"] += 1
                        print(f"Error in step3 fetch/save ({paths[0]}): {e}")
                        traceback.print_exc()

                pending.append(png_pool.submit(fetch_and_save))
                # BACKPRESSURE: each pending future pins its group's
                # device uint8 array (and its queued execution) — an
                # unbounded pending list accumulated ~3 GB of un-fetched
                # buffers over a 300-group run and tipped the B=24 decode
                # peak over 15.75 GB mid-stage (timed round r4).  Three
                # in flight keeps the fetch/PNG overlap (2 writer
                # workers) while bounding held device memory.
                if len(pending) >= 3:
                    pending[-3].result()
                meter.update(n_real * engine.image_token_num)
        except Exception as e:  # per-batch fault tolerance (reference parity)
            failed_batches += 1
            print(f"Error in step3 batch: {e}")
            traceback.print_exc()
        done += len(batch)
        print(f"[step3] {done}/{len(data)} items "
              f"({meter.rate:.1f} img-tok/s)")
    for fut in pending:  # join the writers (they trap their own errors)
        fut.result()
    png_pool.shutdown()
    # a bad sample must not kill a long run (reference parity), but a run
    # where EVERY batch failed is an environment problem (e.g. OOM) —
    # refusing to 'complete' it keeps degenerate output trees loud
    if n_batches and failed_batches == n_batches:
        raise RuntimeError(
            f"step3: all {n_batches} batches failed — aborting instead of "
            "writing an empty output tree (see errors above)")
    if writer_stats["failed"]:
        total = writer_stats["failed"] + writer_stats["ok"]
        print(f"# step3: {writer_stats['failed']}/{total} fetch/save "
              f"groups failed (see tracebacks above)")
        # fetch errors surface in the WORKERS (async dispatch never
        # raises), so a mid-run tunnel death shows up as every remaining
        # group failing while failed_batches stays 0.  A majority of
        # failed groups is an environment failure, not per-sample noise —
        # refuse to 'complete' a mostly-empty tree that step 4 would then
        # silently consume.
        if writer_stats["failed"] > writer_stats["ok"]:
            raise RuntimeError(
                f"step3: {writer_stats['failed']}/{total} fetch/save "
                "groups failed — aborting instead of completing a "
                "mostly-empty output tree")


def main(config) -> None:
    assert len(config.seed_list) == 3, "Please set 3 seeds for 3 perturbation types."
    model, tokenizer, processor = get_model(config)
    gen_cfg = config.generation_config or {}
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

    data_path = config.data_path or os.path.join(
        os.path.dirname(config.save_path), "step2", "long_prompt.json"
    )
    data = shard_for_process(
        load_base_dataset(data_path, config.get("s_idx"), config.get("e_idx"))
    )
    run_step3(config, engine, processor, data)
    from ospo_tpu.utils.profiling import dump_engine_stats

    dump_engine_stats(config.save_path, image=engine)
    print("(Step 3) Image generation completed.")


if __name__ == "__main__":
    from ospo_tpu.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_path", type=str, default="configs/step3.yaml")
    args, _ = parser.parse_known_args()
    main(build_config(cfg_path=args.cfg_path))
