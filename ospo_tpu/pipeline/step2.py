"""Step 2 — pairwise prompt perturbation: (a) contrastive negative prompts,
(b) densification of both prompts into long prompts sharing a scene.

CLI/JSON-contract equivalent of ``ospo/step2.py`` +
``JanusProNegativeGenWrapper`` / ``JanusProDenseGenWrapper``
(``ospo/wrapper/text_generation.py:107-364``): per batch, the 3 perturbation
variants are generated as 3 seeded groups (seeds [0,1,2] are part of the
data protocol), outputs parsed on the reference anchors and accumulated into
``negative_prompt.json`` → ``long_prompt.json``.
"""

from __future__ import annotations

import argparse
import os
import re
from typing import List, Tuple

import jax

from ospo_tpu import chat
from ospo_tpu.config import build_config
from ospo_tpu.engine.text_engine import TextGenEngine
from ospo_tpu.io import save_json_sharded, set_seed, shard_for_process
from ospo_tpu.pipeline.datasets import load_base_dataset
from ospo_tpu.pipeline.model_factory import get_model
from ospo_tpu.pipeline.templates import (
    get_dense_conversation,
    get_negative_conversation,
)


def render(system: str, conversation) -> str:
    return chat.apply_sft_template(conversation, system_prompt=system)


# ---------------------------------------------------------------------------
# 2a — negative prompts
# ---------------------------------------------------------------------------


def parse_negative(answer: str) -> str:
    """Anchor parse + post-processing (text_generation.py:157-167)."""
    out = answer.split("Contrastive Prompt: ")[-1].strip()
    if "<pos>" in out:
        out = out.replace("<pos>", "").strip()
    if "Step 1." in out:
        out = ""
    return out


def build_negative_prompts(batch: List[dict], i: int, seed: int):
    """Rendered 2a prompts for perturbation index ``i`` (None where the
    sample has no template).  ``set_seed`` is (re)applied first — the
    spatial templates draw words from the global RNG, so prompt
    construction is deterministic per (batch, i) and safe to run twice
    (signature pre-warm + the real loop)."""
    set_seed(seed)
    prompts, keep = [], []
    for sample in batch:
        p_type = sample["perturbed_method"][i]
        system, conv = get_negative_conversation(
            sample["sub_category"], p_type, sample["prompt"]
        )
        if system is None or conv is None:
            keep.append(False)
            prompts.append(None)
            continue
        keep.append(True)
        prompts.append(render(system, conv))
    return prompts, keep


def _template_key(s: dict):
    return (str(s.get("sub_category", "")),
            tuple(s.get("perturbed_method", ())))


def _template_grouped(data: List[dict]) -> List[dict]:
    """Stable-sort samples so each batch shares one few-shot template per
    perturbation index — (sub_category, perturbed_method) determine the
    rendered template, and the text engine's shared-prefix program stores
    that ~600–1200-token prefix once per batch instead of once per row.
    Callers mutate samples in place and return the ORIGINAL list, so the
    saved artifact's order is unchanged."""
    return sorted(data, key=_template_key)


def _template_batches(data: List[dict], bsz: int) -> List[List[dict]]:
    """The batches BOTH the prewarm signature walk and the data loops
    dispatch: template-pure (``batched_grouped`` over the stable template
    sort) — a mixed-template batch loses the shared prefix and runs ~8×
    slower at production lengths (see ``datasets.batched_grouped``)."""
    from ospo_tpu.pipeline.datasets import batched_grouped

    return list(batched_grouped(_template_grouped(data), bsz, _template_key))


def _collect_signatures(engine: TextGenEngine, batches: List[List[dict]],
                        build) -> List[tuple]:
    """Compile signatures for every (batch, perturbation) the data loop
    will dispatch — prompt construction is deterministic, so this walks
    the same template-pure batches and feeds ``engine.prewarm`` the exact
    (kind, batch, prefix, tail) tuples the loop will hit."""
    sigs = []
    for batch in batches:
        for i in range(3):
            prompts, _ = build(batch, i)
            live = [p for p in prompts if p is not None]
            if live:
                sigs.append(engine.signature_for(live))
    return sigs


def run_negative(config, engine: TextGenEngine, data: List[dict]) -> List[dict]:
    seed_list = list(config.seed_list)
    done = 0
    for bidx, batch in enumerate(
            _template_batches(data, int(config.batch_size or 8))):
        outputs_by_index: List[List[str]] = []
        for i in range(3):
            prompts, keep = build_negative_prompts(batch, i, seed_list[i])
            live = [p for p in prompts if p is not None]
            answers = iter(
                engine.generate(live, rng=jax.random.PRNGKey(seed_list[i]))
                if live else []
            )
            outputs_by_index.append([
                parse_negative(next(answers)) if k else "" for k in keep
            ])
        for s_idx, sample in enumerate(batch):
            sample["negative_prompt"] = [outputs_by_index[i][s_idx] for i in range(3)]
            done += 1
        print(f"[step2a] batch {bidx}: {done}/{len(data)} samples")
    return list(data)


# ---------------------------------------------------------------------------
# 2b — densification
# ---------------------------------------------------------------------------


def parse_dense(answer: str) -> Tuple[str, str]:
    """'Step 2./Step 4. … Dense:' anchors (text_generation.py:280-306)."""
    base = re.search(r"Step 2\. Prompt 1 Dense: (.+)", answer)
    neg = re.search(r"Step 4\. Prompt 2 Dense: (.+)", answer)
    base_out = base.group(1) if base else ""
    neg_out = neg.group(1) if neg else ""
    if "Step 1." in base_out:
        base_out = ""
    if "Step 1." in neg_out:
        neg_out = ""
    return base_out, neg_out


def build_dense_prompts(batch: List[dict], i: int, seed: int):
    """Rendered 2b prompts for perturbation index ``i`` (None where the
    2a negative is empty).  Deterministic per (batch, i) — see
    :func:`build_negative_prompts`."""
    set_seed(seed)
    prompts, keep = [], []
    for sample in batch:
        negative = sample["negative_prompt"][i]
        if negative == "":
            keep.append(False)
            prompts.append(None)
            continue
        system, conv = get_dense_conversation(
            sample["sub_category"], sample["prompt"], negative
        )
        keep.append(True)
        prompts.append(render(system, conv))
    return prompts, keep


def run_dense(config, engine: TextGenEngine, data: List[dict]) -> List[dict]:
    seed_list = list(config.seed_list)
    done = 0
    for bidx, batch in enumerate(
            _template_batches(data, int(config.batch_size or 8))):
        results: List[List[Tuple[str, str]]] = []
        for i in range(3):
            prompts, keep = build_dense_prompts(batch, i, seed_list[i])
            live = [p for p in prompts if p is not None]
            answers = iter(
                engine.generate(live, rng=jax.random.PRNGKey(seed_list[i]))
                if live else []
            )
            results.append([
                parse_dense(next(answers)) if k else ("", "") for k in keep
            ])
        for s_idx, sample in enumerate(batch):
            sample["long_prompt"] = [results[i][s_idx][0] for i in range(3)]
            sample["negative_long_prompt"] = [results[i][s_idx][1] for i in range(3)]
            done += 1
        print(f"[step2b] batch {bidx}: {done}/{len(data)} samples")
    return list(data)


def main(config) -> None:
    assert len(config.seed_list) == 3, "Please set 3 seeds for 3 perturbation types."
    model, tokenizer, processor = get_model(config)
    engine = TextGenEngine.from_generation_config(
        model, processor, config.generation_config,
        kv_quant=config.get("kv_quant"),
        batch_cap=int(config.batch_size or 0) or None,
        shared_prefix=config.get("shared_prefix"),
    )

    # 1. negative prompt generation — skip-if-exists resume: a completed
    # negative_prompt.json short-circuits 2a so a crashed/restarted run
    # resumes at densification (same ethos as the reference's step-4
    # question-gen skip, ospo/step4.py:59)
    data_path = config.data_path or os.path.join(
        os.path.dirname(config.save_path), "step1", "base_prompt.json"
    )
    bsz = int(config.batch_size or 8)
    neg_path = os.path.join(config.save_path, "negative_prompt.json")
    # single-process only: under multi-process the file exists on host 0
    # alone (save_json_sharded), so a per-host existence check would
    # diverge and deadlock the merge collective — regenerate instead.
    if os.path.exists(neg_path) and jax.process_count() == 1:
        # the saved file already reflects any s_idx/e_idx slicing of the
        # original run — load it whole, do not re-slice
        negatives = load_base_dataset(neg_path, None, None)
        print(f"(Step 2) Resuming from existing {neg_path} "
              f"({len(negatives)} samples); skipping 2a.")
    else:
        data = shard_for_process(
            load_base_dataset(data_path, config.get("s_idx"), config.get("e_idx"))
        )
        # pre-warm the decode programs for EVERY batch's signature so the
        # per-(template, bucket) compiles overlap in the thread pool
        # instead of stalling the data loop one by one (prompt
        # construction is deterministic — build_negative_prompts; the
        # host-side re-tokenize is trivial next to one decode batch)
        n = engine.prewarm(_collect_signatures(
            engine, _template_batches(data, bsz),
            lambda b, i: build_negative_prompts(b, i, config.seed_list[i])))
        print(f"[step2a] pre-warmed {n} decode program(s)")
        negatives = run_negative(config, engine, data)
        save_json_sharded(config.save_path, "negative_prompt", negatives)
        print("(Step 2) Negative prompt generation completed.")

    # 2. densification — consumes this host's negative shard directly
    # (multi-host safe: no cross-host file dependency before the merge)
    n = engine.prewarm(_collect_signatures(
        engine, _template_batches(negatives, bsz),
        lambda b, i: build_dense_prompts(b, i, config.seed_list[i])))
    print(f"[step2b] pre-warmed {n} decode program(s)")
    dense = run_dense(config, engine, negatives)
    save_json_sharded(config.save_path, "long_prompt", dense)
    print("(Step 2) Dense prompt generation completed.")
    from ospo_tpu.utils.profiling import dump_engine_stats

    dump_engine_stats(config.save_path, text=engine)


if __name__ == "__main__":
    from ospo_tpu.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_path", type=str, default="configs/step2.yaml")
    args, _ = parser.parse_known_args()
    main(build_config(cfg_path=args.cfg_path))
