"""Launch a REAL 2-process pipeline step through scripts/run_multihost.sh:
both processes run ``ospo_tpu.pipeline.step2`` (tiny model, fixtures input)
over strided item shards and the merged ``long_prompt.json`` must contain
every item exactly once — the DDP-generation-stage contract of the
reference (Lightning spawn + save_json_ddp, ospo/utils/generate.py:5-15,
ospo/utils/common.py:36-58)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
LAUNCHER = os.path.join(REPO, "scripts", "run_multihost.sh")
FIXTURES = os.path.join(HERE, "fixtures", "examples")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_step2_launcher(tmp_path):
    cfg = tmp_path / "step2.yaml"
    cfg.write_text(
        "seed_list: [0,1,2]\n"
        "batch_size: 2\n"
        "e_idx: 4\n"
        f"data_path: {os.path.join(FIXTURES, 'step1', 'base_prompt.json')}\n"
        f"save_path: {tmp_path / 'step2'}\n"
        "model_preset: tiny\n"
        "generation_config:\n"
        "  do_sample: true\n"
        "  temperature: 1.2\n"
        "  top_p: 0.5\n"
        "  max_new_tokens: 8\n"
    )
    env = dict(os.environ)
    env["OSPO_PLATFORM"] = "cpu"
    env["OSPO_COORD_PORT"] = str(_free_port())
    env["OSPO_COMPILE_CACHE"] = "off"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # undo the test-harness device forcing for the subprocesses
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        ["bash", LAUNCHER, "2", "ospo_tpu.pipeline.step2",
         "--cfg_path", str(cfg)],
        env=env, cwd=REPO, capture_output=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout.decode() + proc.stderr.decode()

    out = json.load(open(tmp_path / "step2" / "long_prompt.json"))
    items = json.load(open(os.path.join(
        FIXTURES, "step1", "base_prompt.json")))[:4]
    assert sorted(r["item_id"] for r in out) == sorted(
        r["item_id"] for r in items)
    for rec in out:
        assert len(rec["negative_prompt"]) == 3
        assert len(rec["long_prompt"]) == 3


@pytest.mark.slow
def test_two_process_step4_launcher(tmp_path):
    """2-process step 4: question gen + cross-item scoring (with the
    prefetch pipeline) over strided shards, PNG trees synthesized as
    step-3 would leave them; merged vqa_prompt.json/train.json must
    contain every item exactly once."""
    from PIL import Image

    items = json.load(open(os.path.join(
        FIXTURES, "step2", "long_prompt.json")))[:2]
    img_root = tmp_path / "step3"
    rng = np.random.default_rng(7)
    for rec in items:
        for kind in ("base", "negative"):
            d = img_root / kind / rec["category"] / rec["item_id"]
            d.mkdir(parents=True)
            for i in range(3):
                Image.fromarray(rng.uniform(0, 255, (32, 32, 3)).astype(
                    "uint8")).save(d / f"{i:02d}.png")

    cfg = tmp_path / "step4.yaml"
    cfg.write_text(
        "seed: 42\n"
        "batch_size: 2\n"
        "e_idx: 2\n"
        "score_rows: 3\n"
        f"data_path: {os.path.join(FIXTURES, 'step2', 'long_prompt.json')}\n"
        f"image_path: {img_root}\n"
        f"save_path: {tmp_path / 'step4'}\n"
        "model_preset: tiny\n"
        "generation_config:\n"
        "  do_sample: true\n"
        "  temperature: 0.8\n"
        "  top_p: 0.9\n"
        "  max_new_tokens: 8\n"
    )
    env = dict(os.environ)
    env["OSPO_PLATFORM"] = "cpu"
    env["OSPO_COORD_PORT"] = str(_free_port())
    env["OSPO_COMPILE_CACHE"] = "off"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        ["bash", LAUNCHER, "2", "ospo_tpu.pipeline.step4",
         "--cfg_path", str(cfg)],
        env=env, cwd=REPO, capture_output=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout.decode() + proc.stderr.decode()

    vqa = json.load(open(tmp_path / "step4" / "vqa_prompt.json"))
    assert sorted(r["item_id"] for r in vqa) == sorted(
        r["item_id"] for r in items)
    for rec in vqa:
        assert rec["question"], "4a must attach questions"
    train = json.load(open(tmp_path / "step4" / "train.json"))
    assert isinstance(train, list)  # may be empty under a random model
    assert len({r["item_id"] for r in train}) == len(train)  # deduped


@pytest.mark.slow
def test_two_process_step3_launcher(tmp_path):
    """2-process step 3 (the round's dominant stage): each process
    CFG-decodes its strided item shard and writes its own PNG subtree —
    together they must cover every (item, kind, seed) exactly once."""
    items = json.load(open(os.path.join(
        FIXTURES, "step2", "long_prompt.json")))[:2]

    cfg = tmp_path / "step3.yaml"
    cfg.write_text(
        "seed: 42\n"
        "seed_list: [0,1,2]\n"
        "batch_size: 2\n"
        "e_idx: 2\n"
        f"data_path: {os.path.join(FIXTURES, 'step2', 'long_prompt.json')}\n"
        f"save_path: {tmp_path / 'step3'}\n"
        "model_preset: tiny\n"
        "generation_config:\n"
        "  temperature: 1.0\n"
        "  cfg_weight: 5.0\n"
    )
    env = dict(os.environ)
    env["OSPO_PLATFORM"] = "cpu"
    env["OSPO_COORD_PORT"] = str(_free_port())
    env["OSPO_COMPILE_CACHE"] = "off"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        ["bash", LAUNCHER, "2", "ospo_tpu.pipeline.step3",
         "--cfg_path", str(cfg)],
        env=env, cwd=REPO, capture_output=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout.decode() + proc.stderr.decode()

    for rec in items:
        for kind in ("base", "negative"):
            d = (tmp_path / "step3" / kind / rec["category"]
                 / rec["item_id"])
            prompts = rec["long_prompt" if kind == "base"
                          else "negative_long_prompt"]
            expected = sorted(f"{i:02d}.png" for i in range(3)
                              if prompts[i])
            assert sorted(p.name for p in d.glob("*.png")) == expected, d
            assert (d / "metadata.json").exists()
