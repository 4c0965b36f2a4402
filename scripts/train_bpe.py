"""Train a local byte-level BPE sized to production token lengths.

The random-init presets fall back to the byte tokenizer, which inflates
the pipeline's few-shot prompts ~4x vs the real Janus-Pro BPE
(~100k-vocab LlamaTokenizer) — so timed-round text stages either run at
fake sequence lengths or get char-truncated inputs (the round-3
compromise).  This trains a `tokenizers` byte-level BPE on the
pipeline's OWN prompt surface (every rendered few-shot conversation
across categories and perturbation types, plus fixture prompts), picks
the vocab size whose chars-per-token on held-out rendered prompts is
closest to the production ~4.2, and writes a ``tokenizer.json`` that
``HFTokenizer`` loads verbatim — so `scripts/run_timed_round.py` can
measure step 2/4a at REAL sequence shapes with random-init weights.

Reference tokenizer surface: janus/models/processing_vlm.py:102-107
(special-tag registration) + ospo/utils/model.py:26-40 (checkpoint
tokenizer load).

Usage: python scripts/train_bpe.py [out.json] [target_chars_per_token]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ospo_tpu.constants import (  # noqa: E402
    BOS_TAG, EOS_TAG, IMAGE_END_TAG, IMAGE_START_TAG, IMAGE_TAG, PAD_TAG)

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures", "examples")


def build_corpus():
    """Every rendered pipeline prompt + fixture text, one string each."""
    from ospo_tpu.pipeline.step2 import render
    from ospo_tpu.pipeline.templates import dense, element, negative, vqa

    texts = []

    probes = [
        "A red cube on a blue sphere near a green pyramid",
        "Two cats sitting on a wooden bench in the park",
        "A photo of three yellow umbrellas beside a fountain",
        "The chef slices fresh bread while steam rises",
    ]
    for sub in negative.NEGATIVE_TEMPLATES:
        for p_type in ("replace", "swap", "drop"):
            for p in probes:
                try:
                    s, c = negative.get_negative_conversation(sub, p_type, p)
                    texts.append(render(s, c))
                except Exception:
                    pass  # not every (sub, p_type) combination is defined
    for sub in dense.DENSE_TEMPLATES:
        for p in probes:
            s, c = dense.get_dense_conversation(sub, p, probes[0])
            texts.append(render(s, c))
    # step-1 element few-shots (the base-prompt combine is non-LLM)
    for cat in element.ELEMENT_TEMPLATES:
        s, c = element.get_element_conversation(cat)
        texts.append(render(s, c))
    texts.extend(str(v) for v in vars(vqa).values()
                 if isinstance(v, str) and len(v) > 80)

    # fixture prompts (the actual data distribution the stages consume)
    for sub in ("step1", "step2", "step4"):
        d = os.path.join(FIXTURES, sub)
        if not os.path.isdir(d):
            continue
        for name in os.listdir(d):
            if name.endswith(".json"):
                with open(os.path.join(d, name)) as f:
                    texts.append(json.dumps(json.load(f))[:200000])
    return [t for t in texts if t]


def main():
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

    out = sys.argv[1] if len(sys.argv) > 1 else "checkpoints/local_bpe/tokenizer.json"
    target = float(sys.argv[2]) if len(sys.argv) > 2 else 4.2

    corpus = build_corpus()
    total_chars = sum(len(t) for t in corpus)
    print(f"# corpus: {len(corpus)} documents, {total_chars} chars")

    # held-out probes: rendered prompts with UNSEEN content words, so the
    # chars/token measurement is not an in-corpus memorization artifact
    from ospo_tpu.pipeline.step2 import render
    from ospo_tpu.pipeline.templates import dense, negative

    held = []
    for p in ["An ancient lighthouse towering over seventeen violet canoes",
              "A transparent staircase spiraling through amber clouds"]:
        s, c = negative.get_negative_conversation(
            list(negative.NEGATIVE_TEMPLATES)[0], "replace", p)
        held.append(render(s, c))
        s, c = dense.get_dense_conversation(
            list(dense.DENSE_TEMPLATES)[0], p, p)
        held.append(render(s, c))

    specials = [BOS_TAG, EOS_TAG, PAD_TAG, IMAGE_TAG, IMAGE_START_TAG,
                IMAGE_END_TAG]
    best = None
    for vocab in (768, 1024, 1536, 2048, 4096):
        tok = Tokenizer(models.BPE(unk_token=None))
        tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
        tok.decoder = decoders.ByteLevel()
        trainer = trainers.BpeTrainer(
            vocab_size=vocab, special_tokens=specials,
            initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
        tok.train_from_iterator(corpus, trainer=trainer)
        cpt = sum(len(h) for h in held) / sum(
            len(tok.encode(h).ids) for h in held)
        print(f"# vocab={vocab}: held-out chars/token={cpt:.2f}")
        if best is None or abs(cpt - target) < abs(best[1] - target):
            best = (tok, cpt, vocab)

    tok, cpt, vocab = best
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    tok.save(out)
    print(f"# saved {out}: vocab={vocab}, held-out chars/token={cpt:.2f} "
          f"(target {target}; byte tokenizer is 1.0)")


if __name__ == "__main__":
    main()
