"""Step 5 — SimPO training on (prompt, chosen image, rejected image) triples.

CLI/JSON-contract equivalent of ``ospo/step5.py``: loads ``train.json``
into a :class:`PreferenceDataset`, trains LoRA adapters on the language
trunk with the jitted SimPO step (``ospo_tpu.train.trainer``), checkpoints
every ``save_steps`` and supports ``base.resume``.
"""

from __future__ import annotations

import argparse
import os

from ospo_tpu.config import build_config
from ospo_tpu.io import set_seed
from ospo_tpu.pipeline.datasets import PreferenceDataset
from ospo_tpu.pipeline.model_factory import get_model
from ospo_tpu.train.trainer import SimPOTrainer


def main(config) -> None:
    base = config.base or {}
    if base.get("save_path"):
        os.makedirs(base["save_path"], exist_ok=True)

    exp = config.experiment or {}
    # a blank `seed:` in YAML is a PRESENT None (defeats .get's default),
    # and `or 42` would also eat an explicit seed: 0
    seed = exp.get("seed")
    seed = 42 if seed is None else int(seed)
    set_seed(seed)

    model_cfg = dict(config.model or {})
    model_cfg.setdefault("model_preset", config.get("model_preset"))
    model_cfg.setdefault("seed", seed)
    # training shards ONE global batch over every process's chips — the
    # factory mesh must span the whole jax.distributed world (generation
    # steps keep the per-process 'local' default; see model_factory)
    model_cfg.setdefault("mesh_scope", "global")
    from ospo_tpu.config import Config

    model, tokenizer, processor = get_model(Config.from_nested(model_cfg))

    train_cfg = config.dataset.train
    dataset = PreferenceDataset(
        seed=int(exp.get("seed", 42)),
        data_path=train_cfg.data_path,
        processor=processor,
        num_samples=train_cfg.get("num_samples"),
    )
    # allow relocated step-3 image trees (train.json may carry foreign paths)
    dataset.data_root = config.get("image_root") or os.path.join(
        os.path.dirname(os.path.dirname(train_cfg.data_path)), "step3"
    )
    print(f"Total length of data: {len(dataset)}")

    trainer = SimPOTrainer(config, model, processor)
    resume = base.get("resume")
    if resume and os.path.exists(resume):
        print("Training resume.")
        trainer.resume(resume)
    trainer.fit(dataset, batch_size=int(train_cfg.get("batch_size") or 16),
                max_epochs=int(exp.get("max_epochs") or 1))
    print("Training END.")


if __name__ == "__main__":
    from ospo_tpu.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_path", type=str, default="configs/step5.yaml")
    args, _ = parser.parse_known_args()
    main(build_config(cfg_path=args.cfg_path))
