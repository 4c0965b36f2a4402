"""Real-weights quality gate (round-3 VERDICT #8).

Given ANY Janus-Pro checkpoint directory (HF layout: config.json +
safetensors — the real release or a synthetic dress-rehearsal checkpoint
from ``ospo_tpu.models.synthetic``), run the full serving-quality
validation in one command:

1. ``port``       — checkpoint → JAX pytree via the production mapping
                    (``weights.load_janus``); per-module tensor counts /
                    bytes / value stats; finiteness.
2. ``modules``    — forward smoke of every pathway: ViT encode, VQ
                    encode→decode round trip (codebook usage), trunk
                    prefill, gen-head logits.
3. ``divergence`` — the serving-quantization gate: teacher-forced CFG
                    decode divergence of the production int8-weight
                    engine with bf16 vs int8 vs int4 KV caches (and
                    optionally bf16 vs int8 weights) on one shared token
                    sequence: per-step KL + top-1 agreement, reported by
                    decode quarter.  This is the harness that qualifies
                    (or rejects) the ``kv_quant: int4`` serving point.
4. ``samples``    — N sample images from fixed prompts + self-VQA scores
                    (the visual smoke a human checks).

Writes ``validation_report.json`` (+ sample PNGs) into ``--out``.

Usage:
    python scripts/validate_weights.py --model_path ./checkpoints/Janus-Pro-7B \
        [--out ./validation] [--phases port,modules,divergence,samples]
        [--tokens 576] [--batch 2] [--weight-divergence]

The day a real checkpoint exists, validation is this one command; until
then ``tests/test_validate_weights.py`` runs the whole gate on a tiny
synthetic checkpoint in CI.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tree_stats(params) -> dict:
    import jax
    import jax.numpy as jnp

    from ospo_tpu.ops.quant import hbm_bytes

    out = {}
    for mod, sub in params.items():
        leaves = jax.tree.leaves(sub)
        n_bytes = hbm_bytes(leaves)  # int4-aware (0.5 byte/element)
        finite = all(bool(jnp.isfinite(x.astype(jnp.float32)).all())
                     for x in leaves)
        big = [x for x in leaves if x.size >= 1024]
        stds = [float(jnp.std(x.astype(jnp.float32))) for x in big[:8]]
        out[mod] = {
            "tensors": len(leaves),
            "gbytes": round(n_bytes / 1e9, 3),
            "finite": finite,
            "sample_stds": [round(s, 5) for s in stds],
            "degenerate": bool(big) and all(s == 0.0 for s in stds),
        }
    return out


def phase_port(model) -> dict:
    stats = tree_stats(model.params)
    ok = all(v["finite"] and not v["degenerate"] for v in stats.values())
    return {"ok": ok, "modules": stats}


def phase_modules(model, processor) -> dict:
    """Forward smoke of every pathway on deterministic inputs."""
    import jax.numpy as jnp
    import numpy as np
    from ospo_tpu.models import janus as janus_lib
    from ospo_tpu.models import llama, vqgan

    cfg = model.cfg
    rng = np.random.RandomState(0)
    report = {}

    # understanding pathway: image → ViT → aligner embeds
    side = cfg.vision.image_size
    pix = jnp.asarray(rng.rand(2, side, side, 3).astype(np.float32) * 2 - 1)
    emb = janus_lib.encode_images(model.params, cfg, pix)
    report["vit_embeds"] = {
        "shape": list(emb.shape),
        "std": float(jnp.std(emb.astype(jnp.float32))),
        "finite": bool(jnp.isfinite(emb.astype(jnp.float32)).all()),
    }

    # generation pathway: pixels → VQ codes → pixels
    gside = cfg.gen_image_size
    gpix = jnp.asarray(rng.rand(2, gside, gside, 3).astype(np.float32) * 2 - 1)
    codes = vqgan.encode_to_ids(model.params["gen_vision_model"], cfg.vq, gpix)
    latent = gside // cfg.vq.downsample_factor
    recon = vqgan.decode_code(model.params["gen_vision_model"], cfg.vq,
                              codes, latent_hw=(latent, latent))
    usage = len(np.unique(np.asarray(codes)))
    report["vq_roundtrip"] = {
        "codes_shape": list(codes.shape),
        "distinct_codes": usage,
        "recon_std": float(jnp.std(recon.astype(jnp.float32))),
        "finite": bool(jnp.isfinite(recon.astype(jnp.float32)).all()),
    }

    # language trunk + both heads
    ids = jnp.asarray(rng.randint(0, cfg.language.vocab_size, (2, 16)),
                      jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    x = janus_lib.embed_text(model.params, ids)
    hidden, _ = janus_lib.language_forward(
        model.params, cfg, x, mask, llama.positions_from_mask(mask))
    lm = janus_lib.lm_logits(model.params, hidden[:, -1:, :])
    gen = janus_lib.gen_logits(model.params, hidden[:, -1:, :])
    report["trunk"] = {
        "lm_logits_std": float(jnp.std(lm.astype(jnp.float32))),
        "gen_logits_std": float(jnp.std(gen.astype(jnp.float32))),
        "finite": bool(jnp.isfinite(lm.astype(jnp.float32)).all()
                       and jnp.isfinite(gen.astype(jnp.float32)).all()),
    }
    report["ok"] = all(v["finite"] for v in report.values()
                       if isinstance(v, dict))
    return report


def _divergence_metrics(ref, test) -> dict:
    """ref/test: [B, T, V] fp32 fused CFG logits on the same forced
    sequence → per-quarter KL(ref‖test) and top-1 agreement."""
    import numpy as np

    def logsoftmax(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    lp, lq = logsoftmax(ref), logsoftmax(test)
    kl = (np.exp(lp) * (lp - lq)).sum(-1)                  # [B, T]
    agree = (ref.argmax(-1) == test.argmax(-1))            # [B, T]
    T = ref.shape[1]
    quarters = []
    for qi in range(4):
        sl = slice(qi * T // 4, (qi + 1) * T // 4)
        quarters.append({
            "kl_mean": float(kl[:, sl].mean()),
            "kl_p95": float(np.percentile(kl[:, sl], 95)),
            "top1_agree": float(agree[:, sl].mean()),
        })
    return {
        "kl_mean": float(kl.mean()),
        "kl_max": float(kl.max()),
        "top1_agree": float(agree.mean()),
        "by_quarter": quarters,
    }


def _weight_fingerprint(model) -> list:
    """Cheap cross-process identity check for the loaded weights (the
    two-process weight gate relies on both processes seeing the SAME
    synthetic/ported checkpoint)."""
    import numpy as np

    # probe a leaf that weight quantization never touches, so the
    # bf16-reference process and the int8/int4-serving process
    # fingerprint identically iff they loaded the same checkpoint.
    # stats over SEVERAL spread rows — row 0 alone is often an all-zero
    # pad slot in real checkpoints, which would make the check vacuous
    emb = model.params["language_model"]["embed"]
    v = int(emb.shape[0])
    flat = []
    for r in (1, v // 2, v - 1):
        row = np.asarray(emb[r], dtype=np.float32)
        flat += [float(row.mean()), float(row.std())]
    flat += [float(x) for x in np.asarray(emb[0][:2], dtype=np.float32)]
    return [round(x, 5) for x in flat]


def phase_divergence(model, processor, n_tokens: int, batch: int,
                     weight_divergence: bool,
                     export_reference: str = None,
                     compare_reference: str = None,
                     quantize_label: str = "int8") -> dict:
    """Teacher-forced serving-quantization divergence (the int4 gate).

    Two-process mode for chips that cannot co-resident two 7B trunks
    (axon ignores donation): ``--export-reference DIR`` saves the forced
    token sequence + reference logits from THIS process's weights (load
    with ``--quantize none`` for a bf16 reference); a second process
    loaded with the serving quantization then runs
    ``--compare-reference DIR`` to score itself against the saved
    reference without ever holding both trunks.
    """
    import numpy as np
    from ospo_tpu.engine.image_engine import ImageGenEngine
    from ospo_tpu.processing import t2i_prompt

    cfg = model.cfg
    prompts = [t2i_prompt(processor, p) for p in
               ["A red cube on a blue sphere",
                "Two cats sitting on a wooden bench"] * ((batch + 1) // 2)]
    prompts = prompts[:batch]
    kw = dict(image_token_num=min(n_tokens, cfg.num_gen_tokens),
              img_size=cfg.gen_image_size,
              patch_size=cfg.vq.downsample_factor,
              batch_bucketing=False, kv_layout="shbd", decode_segments=8)

    report = {}
    if compare_reference:
        with open(os.path.join(compare_reference, "meta.json")) as f:
            meta = json.load(f)
        want_tokens = min(n_tokens, cfg.num_gen_tokens)
        if meta["batch"] != batch or meta["n_tokens"] != want_tokens:
            raise SystemExit(
                f"reference shape mismatch: {compare_reference} was "
                f"exported with batch={meta['batch']} "
                f"n_tokens={meta['n_tokens']}, this run uses "
                f"batch={batch} n_tokens={want_tokens} — re-export or "
                f"pass matching --batch/--tokens")
        # refuse to score against a reference exported from DIFFERENT
        # weights (stale dir, wrong --model_path): the gate would emit a
        # plausible-looking KL for a nonsense comparison
        fp = _weight_fingerprint(model)
        ref_fp = meta.get("weight_fingerprint")
        if ref_fp is not None and (len(ref_fp) != len(fp) or any(
                abs(a - b) > 1e-4 for a, b in zip(fp, ref_fp))):
            raise SystemExit(
                f"weight fingerprint mismatch: this process loaded "
                f"{fp} but the reference at {compare_reference} was "
                f"exported from {ref_fp} — different checkpoints")
        forced = np.load(os.path.join(compare_reference, "forced.npy"))
        ref_logits = np.load(os.path.join(compare_reference,
                                          "ref_logits.npy"))
        eng = ImageGenEngine(model, processor, kv_quant=False, **kw)
        key = f"w_{quantize_label}_vs_{meta['quantize']}"
        report[key] = _divergence_metrics(
            ref_logits, eng.forced_cfg_logits(prompts, forced))
        print(f"# weight divergence {key}: "
              f"{report[key]['kl_mean']:.5f} mean KL, "
              f"{report[key]['top1_agree']:.3f} top-1", flush=True)
        report["n_tokens"] = int(forced.shape[1])
        report["batch"] = batch
        report["reference_meta"] = meta
        return report

    # the reference sequence + logits come from the serving-weight (int8
    # when quantized upstream, else bf16) engine with a bf16 KV cache
    ref_engine = ImageGenEngine(model, processor, kv_quant=False, **kw)
    forced = ref_engine.generate_tokens(prompts, seed=0)
    ref_logits = ref_engine.forced_cfg_logits(prompts, forced)

    if export_reference:
        os.makedirs(export_reference, exist_ok=True)
        np.save(os.path.join(export_reference, "forced.npy"),
                np.asarray(forced))
        np.save(os.path.join(export_reference, "ref_logits.npy"),
                np.asarray(ref_logits, dtype=np.float32))
        with open(os.path.join(export_reference, "meta.json"), "w") as f:
            json.dump({"batch": batch, "n_tokens": int(forced.shape[1]),
                       "quantize": quantize_label,
                       "weight_fingerprint": _weight_fingerprint(model)},
                      f)
        print(f"# reference exported → {export_reference}", flush=True)
        report["exported"] = export_reference
        report["n_tokens"] = int(forced.shape[1])
        report["batch"] = batch
        return report

    for kv in ("int8", "int4"):
        eng = ImageGenEngine(model, processor, kv_quant=kv, **kw)
        test_logits = eng.forced_cfg_logits(prompts, forced)
        report[f"kv_{kv}_vs_bf16"] = _divergence_metrics(ref_logits,
                                                         test_logits)
        print(f"# divergence kv={kv}: {report[f'kv_{kv}_vs_bf16']['kl_mean']:.5f} "
              f"mean KL, {report[f'kv_{kv}_vs_bf16']['top1_agree']:.3f} top-1",
              flush=True)

    if weight_divergence:
        # bf16-weight reference vs int8 weights, both bf16 KV.  Requires
        # the model to have been loaded UNquantized (--quantize none) and
        # both trunks to co-reside — run this phase alone on >16 GB, or
        # on small/tiny models.
        import jax
        import jax.numpy as jnp
        from ospo_tpu.models import janus as janus_lib
        from ospo_tpu.ops import quant

        lm = model.params["language_model"]
        if any(x.dtype == jnp.int8 for x in jax.tree.leaves(lm)):
            raise ValueError("--weight-divergence needs --quantize none "
                             "(the loaded trunk is already quantized)")
        for wmode in ("int8", "w8a8", "int4", "int4g"):
            qparams = {**model.params,
                       "language_model": quant.quantize_llama_params(
                           lm, mode=wmode)}
            qmodel = janus_lib.JanusModel(cfg, qparams)
            qeng = ImageGenEngine(qmodel, processor, kv_quant=False, **kw)
            key = f"w_{wmode}_vs_bf16"
            report[key] = _divergence_metrics(
                ref_logits, qeng.forced_cfg_logits(prompts, forced))
            print(f"# weight divergence {wmode}: "
                  f"{report[key]['kl_mean']:.5f} mean KL, "
                  f"{report[key]['top1_agree']:.3f} top-1", flush=True)

    report["n_tokens"] = int(forced.shape[1])
    report["batch"] = batch
    return report


def phase_scoring(model, processor, export_reference: str = None,
                  compare_reference: str = None,
                  quantize_label: str = "int8", n_items: int = 4) -> dict:
    """Scoring-WORKLOAD quality gate: does serving quantization change the
    yes/no readouts — and, decisively, WHICH preference pairs step 4b
    selects?  The generation gate (phase_divergence) measures 576-step
    image-token logit divergence; scoring is a different numerical
    regime (one 2-way readout after a short suffix) and its only
    consumer is the pair decision (``compute_preference_strength`` over
    local/global score gaps).  A mode disqualified for generation can
    still be fit for scoring (or vice versa) — this measures that
    directly.  Two-process like the weight gate: ``--export-reference``
    from a ``--quantize none`` process, then ``--compare-reference``
    from the quantized one.  Reference workload: ospo/wrapper/vqa.py:112-318.

    Program shapes are asymmetric by necessity: the quantized process
    scores one ITEM (6 images) per call on the production shared-prefix
    path (int8 prefix KV and all), while the bf16 reference scores one
    IMAGE per call on the cache-free fallback path — a 14 GB bf16 trunk
    cannot hold even a 6-row shared cache on a 15.75 GB chip, and the
    24-image shared program crashes the remote compile helper outright
    (HTTP 500, not RESOURCE_EXHAUSTED, so the OOM fallback never fires).
    The two paths are exact-parity tested against each other
    (tests/test_scoring.py), so the comparison still isolates
    quantization: weights + activations + prefix-KV vs pure bf16.
    """
    import numpy as np
    from PIL import Image

    from ospo_tpu.engine.scoring import (ScoringEngine,
                                         compute_preference_strength)

    cfg = model.cfg
    side = cfg.vision.image_size
    rng = np.random.default_rng(7)
    qsets = [
        ["Is there a black umbrella?", "Is the umbrella open?",
         "Does this image accurately represent the prompt?"],
        ["Is there a red car?", "Is it parked?", "Is it daytime?",
         "Does this image accurately represent the prompt?"],
        ["Is there a dog?",
         "Does this image accurately represent the prompt?"],
    ]
    items = []
    for it in range(n_items):
        imgs = [Image.fromarray(
            (rng.random((side, side, 3)) * 255).astype(np.uint8))
            for _ in range(6)]  # base_0..2 + negative_0..2
        items.append((imgs, qsets[it % len(qsets)]))

    # main() maps --quantize none → label "bf16" (the report-key name);
    # treat every full-precision spelling as the reference process
    quantized = quantize_label not in ("none", "", "bf16")
    engine = ScoringEngine(model, processor, kv_quant=quantized)
    scores = []
    if quantized:
        # production path: per-item shared-prefix call (6 images ≈ the
        # rows the serving default uses; int8 prefix KV included)
        for imgs, qs in items:
            scores.extend(engine.score_images_multi(imgs, [qs] * len(imgs)))
    else:
        # bf16 reference: per-image cache-free fallback (see docstring)
        for imgs, qs in items:
            for im in imgs:
                scores.extend(engine.score_images_multi(
                    [im], [qs], share_prefix=False))

    p_yes, p_no = [], []
    chosen = []
    for it in range(n_items):
        res = scores[it * 6:(it + 1) * 6]
        for r in res:
            for a in r["answer_metadata"]:
                p_yes.append(a["p_yes"])
                p_no.append(a["p_no"])
        base_d = {f"base_{i}": {**res[i], "path": f"b{it}_{i}"}
                  for i in range(3)}
        neg_d = {f"negative_{i}": {**res[3 + i], "path": f"n{it}_{i}"}
                 for i in range(3)}
        sel = compute_preference_strength(base_d, neg_d)
        chosen.append(-1 if sel is None else int(sel[0][1:].split("_")[1]))
    p_yes = np.asarray(p_yes, np.float32)
    p_no = np.asarray(p_no, np.float32)
    chosen = np.asarray(chosen, np.int32)

    report = {"n_items": n_items, "n_readouts": int(p_yes.size)}
    if export_reference:
        os.makedirs(export_reference, exist_ok=True)
        np.savez(os.path.join(export_reference, "scoring_ref.npz"),
                 p_yes=p_yes, p_no=p_no, chosen=chosen,
                 fingerprint=np.asarray(_weight_fingerprint(model),
                                        np.float64))
        print(f"# scoring reference exported → {export_reference}",
              flush=True)
        report["exported"] = export_reference
        return report
    if compare_reference:
        ref = np.load(os.path.join(compare_reference, "scoring_ref.npz"))
        fp = np.asarray(_weight_fingerprint(model), np.float64)
        if not np.allclose(ref["fingerprint"], fp, atol=1e-4):
            raise SystemExit(
                f"weight fingerprint mismatch: this process loaded "
                f"{fp.tolist()} but {compare_reference} was exported "
                f"from {ref['fingerprint'].tolist()}")
        d = np.abs(p_yes - ref["p_yes"])
        ans = np.sign(p_yes - p_no)
        ref_ans = np.sign(ref["p_yes"] - ref["p_no"])
        key = f"scoring_{quantize_label}_vs_bf16"
        report[key] = {
            "mean_abs_dp_yes": float(d.mean()),
            "max_abs_dp_yes": float(d.max()),
            "answer_agree": float((ans == ref_ans).mean()),
            "pair_agree": float((chosen == ref["chosen"]).mean()),
        }
        print(f"# {key}: mean|Δp_yes|={d.mean():.5f} "
              f"max={d.max():.5f} answers={report[key]['answer_agree']:.3f} "
              f"pairs={report[key]['pair_agree']:.3f}", flush=True)
    return report


def phase_samples(model, processor, out_dir: str, n_samples: int = 3) -> dict:
    import numpy as np
    from PIL import Image
    from ospo_tpu.engine.image_engine import ImageGenEngine
    from ospo_tpu.engine.scoring import ScoringEngine

    cfg = model.cfg
    prompts = ["A red cube on a blue sphere",
               "Two cats sitting on a wooden bench",
               "A green apple next to a yellow banana"][:n_samples]
    engine = ImageGenEngine(
        model, processor, image_token_num=cfg.num_gen_tokens,
        img_size=cfg.gen_image_size, patch_size=cfg.vq.downsample_factor,
        kv_quant="int8", kv_layout="shbd", decode_segments=8)
    images = engine.generate_from_raw_prompts(prompts, seed=0)

    scorer = ScoringEngine(model, processor)
    report = {"samples": []}
    os.makedirs(out_dir, exist_ok=True)
    for i, (prompt, img) in enumerate(zip(prompts, images)):
        path = os.path.join(out_dir, f"sample_{i}.png")
        Image.fromarray(img).save(path)
        qs = [f"Does this image show: {prompt.lower()}?",
              f"This image is generated by a prompt: {prompt}. "
              "Does this image accurately represent the prompt?"]
        scores = scorer.score_images([Image.fromarray(img)], qs)[0]
        report["samples"].append({
            "prompt": prompt, "path": path,
            "pixel_std": float(np.std(img.astype(np.float32))),
            "local_score": scores["local_score"],
            "global_score": scores["global_score"],
        })
    report["ok"] = all(s["pixel_std"] > 1.0 for s in report["samples"])
    return report


def main(argv=None) -> dict:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", default=None)
    parser.add_argument("--model_preset", default=None,
                        help="random-init preset (tiny|1b|7b) instead of a "
                             "checkpoint — for on-chip divergence runs "
                             "without weights on disk")
    parser.add_argument("--out", default="./validation")
    parser.add_argument("--phases",
                        default="port,modules,divergence,samples")
    parser.add_argument("--tokens", type=int, default=576)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--quantize", default="int8",
                        help="serving weight quantization for divergence/"
                             "samples (int8 | w8a8 | int4 | int4g | none)")
    parser.add_argument("--weight-divergence", action="store_true",
                        help="also measure bf16-vs-int8 WEIGHT divergence "
                             "(double trunk residency — needs >16GB or a "
                             "small model)")
    parser.add_argument("--export-reference", default=None,
                        help="divergence phase: save forced tokens + "
                             "reference logits to DIR and stop (two-"
                             "process weight gate, pass --quantize none)")
    parser.add_argument("--compare-reference", default=None,
                        help="divergence phase: score this process's "
                             "(quantized) weights against a reference "
                             "exported by --export-reference")
    parser.add_argument("--drop-lm-head", action="store_true",
                        help="drop the 102k-vocab text head (~840MB at "
                             "7B) — valid for divergence-only runs, which "
                             "exercise only the image head")
    args = parser.parse_args(argv)

    from ospo_tpu.config import Config
    from ospo_tpu.pipeline.model_factory import get_model

    t0 = time.time()
    phases = [p.strip() for p in args.phases.split(",") if p.strip()]
    known_phases = {"port", "modules", "divergence", "samples", "scoring"}
    unknown = [p for p in phases if p not in known_phases]
    if unknown:
        # a typo'd phase must not silently drop a validation gate (a
        # missing report key reads as "passed")
        parser.error(f"unknown phase(s) {unknown}; "
                     f"valid: {sorted(known_phases)}")
    if not args.model_path and not args.model_preset:
        parser.error("one of --model_path / --model_preset is required")
    config = Config.from_nested({
        "model_path": args.model_path,
        "model_preset": args.model_preset,
        "quantize": args.quantize if args.quantize != "none" else None,
        "drop_lm_head": bool(args.drop_lm_head),
    })
    model, tokenizer, processor = get_model(config)

    report = {"model_path": args.model_path or f"preset:{args.model_preset}",
              "phases": phases, "quantize": args.quantize}
    if "port" in phases:
        report["port"] = phase_port(model)
        print(f"# port: ok={report['port']['ok']}", flush=True)
    if "modules" in phases:
        report["modules"] = phase_modules(model, processor)
        print(f"# modules: ok={report['modules']['ok']}", flush=True)
    if "divergence" in phases:
        report["divergence"] = phase_divergence(
            model, processor, args.tokens, args.batch,
            args.weight_divergence,
            export_reference=args.export_reference,
            compare_reference=args.compare_reference,
            quantize_label=args.quantize)
    if "scoring" in phases:
        report["scoring"] = phase_scoring(
            model, processor,
            export_reference=args.export_reference,
            compare_reference=args.compare_reference,
            quantize_label=(args.quantize if args.quantize != "none"
                            else "bf16"))
    if "samples" in phases:
        report["samples"] = phase_samples(model, processor, args.out)
        print(f"# samples: ok={report['samples']['ok']}", flush=True)

    report["elapsed_s"] = round(time.time() - t0, 1)
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "validation_report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"# validation report → {path} ({report['elapsed_s']}s)")
    return report


if __name__ == "__main__":
    from ospo_tpu.platform import apply_platform_env

    apply_platform_env()
    main()
