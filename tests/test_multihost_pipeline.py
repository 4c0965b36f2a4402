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


def _run_step2_launcher(tmp_path, nproc: int) -> None:
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
        ["bash", LAUNCHER, str(nproc), "ospo_tpu.pipeline.step2",
         "--cfg_path", str(cfg)],
        env=env, cwd=REPO, capture_output=True, timeout=900,
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


def test_two_process_step2_launcher(tmp_path):
    _run_step2_launcher(tmp_path, 2)


@pytest.mark.slow
def test_four_process_step2_launcher(tmp_path):
    """Pod-slice-shaped launch: 4 coordinated processes (v5e-32 = 4 hosts
    x 8 chips — here 4 x 1 CPU device) through the SAME launcher +
    strided-shard + gather-merge path; with 4 items, every rank owns
    exactly one, so any rank lost in the merge changes the output."""
    _run_step2_launcher(tmp_path, 4)


def test_two_process_step1_launcher(tmp_path):
    """2-process step-1 element generation: each rank samples with a
    process-folded RNG, ``merge_element_sets`` gathers across ranks, and
    process 0 alone writes the element file (the DDP element-gen contract
    of ``ospo/wrapper/text_generation.py:84-103`` under Lightning DDP)."""
    cfg = tmp_path / "step1.yaml"
    cfg.write_text(
        "seed: 42\n"
        "batch_size: 2\n"
        "max_len: 3\n"
        f"save_path: {tmp_path / 'step1'}\n"
        "model_preset: tiny\n"
        "generation_config:\n"
        "  do_sample: true\n"
        "  temperature: 1.3\n"
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
        ["bash", LAUNCHER, "2", "ospo_tpu.pipeline.step1",
         "--cfg_path", str(cfg), "--category", "object"],
        env=env, cwd=REPO, capture_output=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout.decode() + proc.stderr.decode()
    out = json.load(open(tmp_path / "step1" / "object_element.json"))
    # merged union from both ranks: a list of unique element strings
    assert isinstance(out, list)
    assert len(out) == len(set(out))


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


def test_two_process_quantized_global_shard():
    """Factory path: quantized (committed jit-output) leaves must still
    shard onto a GLOBAL mesh — mesh._put host-round-trips them (plain
    device_put rejects committed arrays for cross-process shardings)."""
    worker = os.path.join(HERE, "multihost_quant_worker.py")
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(i), "2"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            assert p.returncode == 0, out.decode()
            assert b"QUANT-GLOBAL-OK" in out
    finally:
        # a wedged worker (or one peer's assert) must not orphan the
        # other: it would block on the dead coordinator forever
        for p in procs:
            if p.poll() is None:
                p.kill()


@pytest.mark.slow
def test_two_process_step5_launcher(tmp_path):
    """2-process step 5 (SimPO training): both processes build the SAME
    global batch and shard it over a 2-device global mesh — the
    Lightning-DDP train contract (ospo/utils/train.py) as one GSPMD
    mesh.  The final LoRA checkpoint (written by process 0 only, after a
    collective gather) must numerically match a single-process unsharded
    run of the identical config."""
    from PIL import Image

    rng = np.random.default_rng(3)
    records = []
    for i in range(4):
        d = tmp_path / "step3" / "base" / "attribute" / f"{i:07d}"
        d.mkdir(parents=True)
        for j, kind in enumerate(("chosen", "rejected")):
            Image.fromarray(rng.uniform(0, 255, (32, 32, 3)).astype(
                "uint8")).save(d / f"{j:02d}.png")
        records.append({
            "item_id": f"{i:07d}", "category": "attribute",
            "prompt": f"a photo of object {i}",
            "chosen": str(d / "00.png"), "rejected": str(d / "01.png"),
        })
    (tmp_path / "train.json").write_text(json.dumps(records))

    def cfg_text(save, dp):
        model = "model:\n  model_preset: tiny\n"
        if dp:
            model += f"  data_parallel: {dp}\n"
        return (
            "base:\n"
            f"  save_path: {save}\n"
            "  exp_name: mh\n"
            + model +
            "use_peft: True\n"
            "lora:\n  lora_rank: 4\n  lora_alpha: 8\n  lora_dropout: 0.0\n"
            "dataset:\n  train:\n    batch_size: 2\n"
            f"    data_path: {tmp_path / 'train.json'}\n"
            "optimizer:\n  init_lr: 1e-3\n  scheduler_type: constant\n"
            "experiment:\n  seed: 0\n  max_training_steps: 3\n"
            "  max_epochs: 2\n  log_steps: 1\n"
            "  gradient_checkpointing: False\n"
            "algo:\n  beta: 10\n  gamma_beta_ratio: 0.5\n"
        )

    env = dict(os.environ)
    env["OSPO_PLATFORM"] = "cpu"
    env["OSPO_COMPILE_CACHE"] = "off"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    cfg_sh = tmp_path / "step5_sh.yaml"
    cfg_sh.write_text(cfg_text(tmp_path / "out_sh", dp=2))
    env_sh = dict(env, OSPO_COORD_PORT=str(_free_port()))
    proc = subprocess.run(
        ["bash", LAUNCHER, "2", "ospo_tpu.pipeline.step5",
         "--cfg_path", str(cfg_sh)],
        env=env_sh, cwd=REPO, capture_output=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout.decode() + proc.stderr.decode()

    cfg_ref = tmp_path / "step5_ref.yaml"
    cfg_ref.write_text(cfg_text(tmp_path / "out_ref", dp=0))
    proc = subprocess.run(
        [sys.executable, "-m", "ospo_tpu.pipeline.step5",
         "--cfg_path", str(cfg_ref)],
        env=env, cwd=REPO, capture_output=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout.decode() + proc.stderr.decode()

    sh = np.load(tmp_path / "out_sh" / "mh" / "step_000003" / "lora.npz")
    ref = np.load(tmp_path / "out_ref" / "mh" / "step_000003" / "lora.npz")
    assert sorted(sh.files) == sorted(ref.files)
    for k in ref.files:
        np.testing.assert_allclose(sh[k], ref[k], atol=1e-5, rtol=1e-4,
                                   err_msg=k)


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
