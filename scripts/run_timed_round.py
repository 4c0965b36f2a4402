"""Timed self-improvement mini-round on real hardware (VERDICT r2 #4).

Measures the ACTUAL per-stage wall-clock of a production-shaped round —
pipeline-boundary costs included (model load, per-signature compiles,
host I/O, PNG encode) — and writes ``ROUND_r03.json`` with per-stage
seconds, rates, and the delta vs the BENCH_NOTES budget model.

Because this environment has no real Janus-Pro weights, the run uses the
explicit random-init 7B preset; stage INPUTS are synthesized by cycling
the reference's golden fixtures to ``--items`` so every stage processes
production-shaped work regardless of the random model's text quality:

- step2 consumes a cycled ``base_prompt.json`` (times negative+dense gen);
- step3 consumes a cycled ``long_prompt.json`` (times CFG decode + VQ +
  PNG at the serving batch);
- step4a times question gen on the long prompts; step4b times scoring of
  step3's real PNG tree against cycled fixture question lists
  (production question counts);
- step5 times SimPO training on pairs assembled from step3's tree.

Each stage runs in its own subprocess (clean HBM between stages — the
tunneled chip ignores donation) through the SAME CLIs a user runs; the
persistent compile cache carries compiles across stages exactly as in
production.

Usage:
    python scripts/run_timed_round.py [--items 200] [--out outputs-timed]
        [--preset 7b] [--stages 1,2,3,4,5]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "tests", "fixtures", "examples")

# BENCH_NOTES budget model (measured per-chip rates, round 2) — the
# comparison column in ROUND_r03.json
BUDGET = {
    "step2_tok_s": 1342.8,     # p1200 B=32 at the PRODUCTION top_p=0.5
                               # sampler (sampler_r5.log, r5)
    "step3_imgtok_s": 990.2,   # serving default B=24 (round 4 re-anchor)
    "step4b_pairs_h": 3853.5,  # rows=16 Q-uniform production shape (r4 grid)
    "step5_samples_s": 2.04,
}


def cycle_items(src: list, n: int) -> list:
    """Cycle fixture records to n items with fresh unique item_ids
    (category digit preserved — item_id = f"{cat_idx}{i:06d}")."""
    out = []
    for i in range(n):
        rec = dict(src[i % len(src)])
        rec["item_id"] = rec["item_id"][0] + f"{i:06d}"
        out.append(rec)
    return out


def run_stage(name: str, module: str, cfg: dict, out_dir: str,
              timeout: int = 5400) -> dict:
    """Write the stage config, run the CLI in a subprocess, time it."""
    import yaml

    cfg_path = os.path.join(out_dir, f"{name}.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", module, "--cfg_path", cfg_path],
        cwd=REPO, env=env, timeout=timeout)
    dt = time.time() - t0
    ok = proc.returncode == 0
    print(f"### {name}: {dt:.1f}s rc={proc.returncode}", flush=True)
    r = {"seconds": round(dt, 1), "ok": ok}
    # compile/steady split (VERDICT r4 #3): the stage engines dump
    # per-signature dispatch timing; fold the estimate into the report so
    # the feasibility model can be corrected from integrated runs
    stats_path = os.path.join(cfg.get("save_path") or out_dir,
                              "engine_stats.json")
    try:
        with open(stats_path) as f:
            stats = json.load(f)
        r["compile_s_est"] = round(sum(
            s.get("compile_s_est", 0.0) for s in stats.values()), 1)
        # chip-health anomaly wall (steady dispatches >4x their own
        # signature's first dispatch — DispatchStats): excluded from the
        # steady estimate so the feasibility model scales clean rates
        anomaly = round(sum(
            s.get("anomaly_s", 0.0) for s in stats.values()), 1)
        if anomaly:
            r["anomaly_s_est"] = anomaly
        r["steady_seconds_est"] = round(
            r["seconds"] - r["compile_s_est"] - anomaly, 1)
    except (OSError, ValueError):
        pass
    return r


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--items", type=int, default=200)
    parser.add_argument("--out", default="outputs-timed")
    parser.add_argument("--preset", default="7b")
    parser.add_argument("--stages", default="1,2,3,4,5")
    parser.add_argument("--report", default="ROUND_r05.json")
    args = parser.parse_args()
    stages = set(args.stages.split(","))
    n = args.items

    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    report = {"items": n, "preset": args.preset, "stages": {},
              "budget_model": BUDGET}

    # local BPE (scripts/train_bpe.py): random-init presets otherwise
    # byte-tokenize, inflating every prompt ~4x vs production BPE and
    # turning text-stage timings into extrapolations (round-3 caveat).
    # ~4.2 chars/token puts step-2 few-shots at their real ~600-900
    # token lengths, measured, with no char-truncation compensation.
    bpe = os.path.join(out, "local_bpe", "tokenizer.json")
    if not os.path.isfile(bpe):
        subprocess.run([sys.executable,
                        os.path.join(REPO, "scripts", "train_bpe.py"), bpe],
                       cwd=REPO, check=True, timeout=1200)
    base_model = {"model_path": None, "model_preset": args.preset,
                  "ckpt_path": None, "tokenizer_path": bpe}

    # ---- stage inputs from cycled fixtures ----
    with open(os.path.join(FIXTURES, "step1", "base_prompt.json")) as f:
        base_prompt = cycle_items(json.load(f), n)
    with open(os.path.join(out, "base_prompt.json"), "w") as f:
        json.dump(base_prompt, f)
    with open(os.path.join(FIXTURES, "step2", "long_prompt.json")) as f:
        long_prompt = cycle_items(json.load(f), n)
    # prompts go in UNTRUNCATED: the local BPE tokenizes them at
    # production-shaped lengths (the round-3 96-char byte-token
    # compensation is gone)
    with open(os.path.join(out, "long_prompt.json"), "w") as f:
        json.dump(long_prompt, f)
    with open(os.path.join(FIXTURES, "step4", "vqa_prompt.json")) as f:
        vqa_fix = json.load(f)

    # ---- step 1 (element-generation rate probe: one category, small
    # quota — the full quota is pure repetition of the same program) ----
    if "1" in stages:
        report["stages"]["step1"] = run_stage(
            "step1", "ospo_tpu.pipeline.step1", {
                **base_model, "seed": 42, "category": "object",
                # B=64: the shared-prefix serving point at BPE lengths
                # (stage-shape campaign, outputs-timed/stage_shapes.log)
                "max_len": 8,
                "batch_size": int(os.environ.get(
                    "OSPO_TIMED_STEP1_BATCH", "64")),
                "quantize": "int8",
                "kv_quant": "int8",
                "drop_vision": True,
                "save_path": os.path.join(out, "step1"),
                "generation_config": {"do_sample": True, "temperature": 1.3,
                                      "max_new_tokens": 256},
            }, out)

    # ---- step 2: negatives + densification over n items ----
    if "2" in stages:
        # a TIMED stage must start clean: a leftover negative_prompt.json
        # from an earlier run makes step 2's phase-resume skip 2a (and at
        # a different item count / tokenizer it is also wrong input)
        for stale in ("negative_prompt.json", "long_prompt.json"):
            sp = os.path.join(out, "step2", stale)
            if os.path.exists(sp):
                os.remove(sp)
        r = run_stage("step2", "ospo_tpu.pipeline.step2", {
            # B=32 at real BPE lengths: the measured p1200 t48 point
            # (1378 tok/s, outputs-timed/stage_shapes.log; B=48/64 crash
            # the tunneled remote-compile helper at this shape)
            **base_model, "seed_list": [0, 1, 2],
            "batch_size": int(os.environ.get("OSPO_TIMED_STEP2_BATCH", "32")),
            "quantize": "int8", "kv_quant": "int8", "drop_vision": True,
            "data_path": os.path.join(out, "base_prompt.json"),
            "save_path": os.path.join(out, "step2"),
            "generation_config": {"do_sample": True, "num_beams": 1,
                                  "temperature": 1.2, "top_p": 0.5,
                                  "max_new_tokens": 512},
        }, out)
        r["items"] = n
        r["items_per_s"] = round(n / r["seconds"], 3)
        report["stages"]["step2"] = r

    # ---- step 3: CFG image generation over n items (6 images each) ----
    if "3" in stages:
        # clean start: step 3's skip-if-exists resume would skip every
        # group a previous run already generated, timing a no-op
        import shutil
        if os.path.isdir(os.path.join(out, "step3")):
            shutil.rmtree(os.path.join(out, "step3"))
        r = run_stage("step3", "ospo_tpu.pipeline.step3", {
            **base_model, "seed_list": [0, 1, 2], "batch_size": 24,
            "data_path": os.path.join(out, "long_prompt.json"),
            "save_path": os.path.join(out, "step3"),
            "generation_config": {"parallel_size": 1, "temperature": 1.0,
                                  "cfg_weight": 5.0},
            "quantize": "int8", "kv_quant": "int8", "kv_layout": "shbd",
            "decode_segments": 8, "drop_lm_head": True,
            "drop_understanding": True,
        }, out)
        pngs = sum(
            sum(1 for f in files if f.endswith(".png"))
            for _, _, files in os.walk(os.path.join(out, "step3")))
        ntok = None
        try:
            from ospo_tpu.models import janus as janus_lib  # local count
            ntok = janus_lib.JANUS_PRO_7B.num_gen_tokens
        except Exception:
            ntok = 576
        r["items"] = n
        r["pngs"] = pngs
        r["imgtok_per_s_wall"] = round(pngs * ntok / r["seconds"], 1)
        report["stages"]["step3"] = r

    # ---- step 4a: question generation (empty image dir → 4b no-op) ----
    if "4" in stages:
        # clean start: step 4a skips question gen when vqa_prompt.json
        # exists, and 4b's train.json would mix runs
        import shutil
        for d in ("step4a", "step4"):
            if os.path.isdir(os.path.join(out, d)):
                shutil.rmtree(os.path.join(out, d))
        r = run_stage("step4a", "ospo_tpu.pipeline.step4", {
            **base_model, "seed": 42,
            "batch_size": int(os.environ.get(
                "OSPO_TIMED_STEP4A_BATCH", "64")),
            "kv_quant": "int8", "shared_prefix": True, "drop_vision": True,
            "data_path": os.path.join(out, "long_prompt.json"),
            "image_path": os.path.join(out, "empty"),
            "save_path": os.path.join(out, "step4a"),
            "quantize": "int8",
            "generation_config": {"do_sample": True, "num_beams": 1,
                                  "temperature": 0.8, "top_p": 0.9,
                                  "max_new_tokens": 256},
        }, out)
        r["items"] = n
        report["stages"]["step4a"] = r

        # ---- step 4b: scoring of step3's real PNG tree against cycled
        # fixture question lists (production question counts) ----
        os.makedirs(os.path.join(out, "step4"), exist_ok=True)
        vqa = cycle_items(vqa_fix, n)
        # align cycled questions with step3's tree (same cycling order)
        for rec, lp in zip(vqa, long_prompt):
            rec["item_id"], rec["category"] = lp["item_id"], lp["category"]
            rec["sub_category"] = lp["sub_category"]
        with open(os.path.join(out, "step4", "vqa_prompt.json"), "w") as f:
            json.dump(vqa, f)
        r = run_stage("step4b", "ospo_tpu.pipeline.step4", {
            **base_model, "seed": 42, "batch_size": 16,
            "score_rows": 16, "score_kv_quant": True,
            "image_path": os.path.join(out, "step3"),
            "save_path": os.path.join(out, "step4"),
            "quantize": "int8",
            "generation_config": {"do_sample": True, "temperature": 0.8,
                                  "top_p": 0.9, "max_new_tokens": 256},
        }, out)
        try:
            with open(os.path.join(out, "step4", "train.json")) as f:
                pairs = len(json.load(f))
        except Exception:
            pairs = 0
        r["items"] = n
        r["pairs"] = pairs
        r["items_per_h"] = round(n / r["seconds"] * 3600, 1)
        # per-category scored/failed/pairs — the r4 round lost the whole
        # complex category silently; the report now carries the evidence
        try:
            with open(os.path.join(out, "step4", "score_summary.json")) as f:
                r["per_category"] = json.load(f)
        except Exception:
            r["per_category"] = None
        report["stages"]["step4b"] = r

    # ---- step 5: SimPO training on step 4b's SELECTED pairs (the real
    # pipeline wiring — ospo/step5.py:17-59 consumes step 4's train.json);
    # falls back to raw step-3 (base, negative) pairs only when step 4
    # wasn't part of this run ----
    if "5" in stages:
        train = []
        step4_train = os.path.join(out, "step4", "train.json")
        if os.path.exists(step4_train):
            with open(step4_train) as f:
                train = json.load(f)
            print(f"### step5 consumes step4's train.json ({len(train)} pairs)")
        if not train:
            for rec in long_prompt:
                b = os.path.join(out, "step3", "base", rec["category"],
                                 rec["item_id"], "00.png")
                ng = os.path.join(out, "step3", "negative", rec["category"],
                                  rec["item_id"], "00.png")
                if os.path.exists(b) and os.path.exists(ng):
                    train.append({
                        "item_id": rec["item_id"], "category": rec["category"],
                        "sub_category": rec["sub_category"],
                        "question": [], "prompt": rec["prompt"],
                        "chosen": b, "rejected": ng, "metadata": {},
                    })
        with open(os.path.join(out, "train.json"), "w") as f:
            json.dump(train, f)
        r = run_stage("step5", "ospo_tpu.pipeline.step5", {
            "base": {"save_path": os.path.join(out, "step5"),
                     "exp_name": "timed", "world_size": None,
                     "resume": None},
            "model": {**base_model},
            "use_peft": True,
            "lora": {"lora_rank": 32, "lora_alpha": 64,
                     "lora_dropout": 0.05,
                     "target_modules": ["q_proj", "k_proj", "v_proj",
                                        "o_proj", "gate_proj", "down_proj",
                                        "up_proj"]},
            "dataset": {"train": {"batch_size": 4, "num_workers": 2,
                                  "data_path": os.path.join(out, "train.json"),
                                  "num_samples": None}},
            "optimizer": {"init_lr": 4e-5, "betas": [0.9, 0.95],
                          "weight_decay": 0.0, "eps": 1e-8,
                          "scheduler_type": "constant"},
            "experiment": {"seed": 42, "precision": "bf16",
                           "gradient_clip_val": 1.0,
                           "gradient_checkpointing": True,
                           "quantize_base": True,
                           "max_training_steps": max(1, len(train) // 4),
                           "max_epochs": 1, "save_steps": 10000,
                           "log_steps": 10},
            "algo": {"beta": 10, "gamma_beta_ratio": 0.5, "sft_weight": 0.0,
                     "label_smoothing": 0.0, "loss_type": "sigmoid"},
        }, out)
        r["pairs"] = len(train)
        r["samples_per_s_wall"] = round(len(train) / r["seconds"], 3)
        # trainer-side compile/steady split (train_stats.json — the first
        # optimizer update bounds the train-step compile)
        try:
            with open(os.path.join(out, "step5", "timed",
                                   "train_stats.json")) as f:
                r["train_stats"] = json.load(f)
        except Exception:
            r["train_stats"] = None
        report["stages"]["step5"] = r

    total = sum(s["seconds"] for s in report["stages"].values())
    report["total_seconds"] = round(total, 1)
    report["all_ok"] = all(s["ok"] for s in report["stages"].values())
    path = os.path.join(REPO, args.report)
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"### timed round → {path}: {json.dumps(report['stages'], indent=1)}")


if __name__ == "__main__":
    main()
