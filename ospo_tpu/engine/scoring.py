"""Self-VQA scoring engine (step 4b understanding path).

One jitted multimodal forward: image + per-question conversations →
last-position vocabulary distribution, from which p(yes)/p(no) gaps are
computed exactly like ``JanusProScoreWrapper``
(``ospo/wrapper/vqa.py:161-225``): softmax at the final position, p_yes =
max over {"yes","Yes"} last-token ids, p_no likewise, local score = mean
gap over non-global questions, global score = last question's gap.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ospo_tpu.models import janus as janus_lib
from ospo_tpu.models import llama
from ospo_tpu.processing import Processor


def _bucket(n: int, step: int = 64) -> int:
    return max(step, ((n + step - 1) // step) * step)


class ScoringEngine:
    def __init__(self, model: janus_lib.JanusModel, processor: Processor):
        self.model = model
        self.processor = processor
        tok = processor.tokenizer
        self.yes_ids = [tok("yes", add_special_tokens=False).input_ids[-1],
                        tok("Yes", add_special_tokens=False).input_ids[-1]]
        self.no_ids = [tok("no", add_special_tokens=False).input_ids[-1],
                       tok("No", add_special_tokens=False).input_ids[-1]]

    @functools.partial(jax.jit, static_argnums=(0,))
    def _last_probs(self, params, input_ids, attn_mask, pixel_values,
                    seq_mask, emb_mask):
        cfg = self.model.cfg
        embeds = janus_lib.prepare_inputs_embeds(
            params, cfg, input_ids, pixel_values, seq_mask, emb_mask
        )
        positions = llama.positions_from_mask(attn_mask)
        hidden, _ = janus_lib.language_forward(
            params, cfg, embeds, attn_mask, positions
        )
        logits = janus_lib.lm_logits(params, hidden[:, -1:, :])[:, 0]
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    def question_conversations(self, image, questions: Sequence[str]):
        """Per-question single-image yes/no conversations
        (``build_conversation``, ospo/wrapper/vqa.py:149-158)."""
        convs = []
        for q in questions:
            convs.append([
                {"role": "<|User|>",
                 "content": f"<image_placeholder>\n{q} Please answer 'yes' or 'no' without explanation.",
                 "images": [image]},
                {"role": "<|Assistant|>", "content": ""},
            ])
        return convs

    def score_images(self, images: Sequence, questions: Sequence[str]) -> List[Dict]:
        """N images × Q questions in ONE multimodal forward (N·Q rows) —
        the reference runs a forward per image (vqa.py:161-204); batching
        all six images of an item amortises the weight reads 6×."""
        prepares = []
        for image in images:
            for c in self.question_conversations(image, questions):
                prepares.append(
                    self.processor.process_one(conversations=c, images=[image])
                )
        batch = self.processor.batchify(prepares)

        # pad sequence dim to a bucket (left pad) to bound recompiles
        t = batch.input_ids.shape[1]
        pad = _bucket(t) - t
        input_ids = np.pad(batch.input_ids, ((0, 0), (pad, 0)),
                           constant_values=self.processor.pad_id)
        attn = np.pad(batch.attention_mask, ((0, 0), (pad, 0)))
        seq_mask = np.pad(batch.images_seq_mask, ((0, 0), (pad, 0)))

        probs = np.asarray(self._last_probs(
            self.model.params,
            jnp.asarray(input_ids), jnp.asarray(attn),
            jnp.asarray(batch.pixel_values),
            jnp.asarray(seq_mask), jnp.asarray(batch.images_emb_mask),
        ))

        q_count = len(questions)
        results: List[Dict] = []
        for img_idx in range(len(images)):
            score_sum = 0.0
            global_score = 0.0
            answer_metadata: List[dict] = []
            for q_idx in range(q_count):
                row = img_idx * q_count + q_idx
                p_yes = max(float(probs[row, y]) for y in self.yes_ids)
                p_no = max(float(probs[row, n]) for n in self.no_ids)
                answer_metadata.append({
                    "p_yes": p_yes,
                    "p_no": p_no,
                    "answer": ("yes" if p_yes > p_no
                               else ("no" if p_no > p_yes else "tie")),
                })
                if q_idx == q_count - 1:
                    global_score = p_yes - p_no
                else:
                    score_sum += p_yes - p_no
            results.append({
                "local_score": float(score_sum / max(q_count - 1, 1)),
                "global_score": float(global_score),
                "answer_metadata": answer_metadata,
            })
        return results

    def score_image(self, image, questions: Sequence[str]) -> Dict:
        """Single-image convenience wrapper around :meth:`score_images`."""
        return self.score_images([image], questions)[0]


def compute_preference_strength(base_img_dict: Dict, negative_img_dict: Dict):
    """Pair selection — a verbatim port of the algorithm core
    (``ospo/wrapper/vqa.py:228-280``): keep (base_i, negative_i) pairs with
    non-negative local & global gaps, normalise by max |gap|, strength =
    norm_local / (norm_global + 1e-8), pick argmax."""
    bases = [base_img_dict.get(f"base_{i}") for i in range(3)]
    negatives = [negative_img_dict.get(f"negative_{i}") for i in range(3)]
    if not any(b is not None for b in bases) or not any(
        n is not None for n in negatives
    ):
        return None

    pairs = []
    for idx in range(3):
        base, neg = bases[idx], negatives[idx]
        if base is None or neg is None:
            continue
        local_gap = base["local_score"] - neg["local_score"]
        global_gap = base["global_score"] - neg["global_score"]
        if local_gap >= 0 and global_gap >= 0:
            pairs.append({"pair_idx": idx, "local_gap": local_gap,
                          "global_gap": global_gap})
    if not pairs:
        return None

    max_local = max(abs(p["local_gap"]) for p in pairs)
    max_global = max(abs(p["global_gap"]) for p in pairs)
    best_score, best_pair = -np.inf, None
    for pair in pairs:
        norm_local = abs(pair["local_gap"]) / (max_local + 1e-8)
        norm_global = abs(pair["global_gap"]) / (max_global + 1e-8)
        strength = norm_local / (norm_global + 1e-8)
        if strength > best_score:
            best_score, best_pair = strength, pair
    if best_pair is None:
        return None

    chosen = base_img_dict[f"base_{best_pair['pair_idx']}"]["path"]
    rejected = negative_img_dict[f"negative_{best_pair['pair_idx']}"]["path"]
    return chosen, rejected, {
        "local_gap": best_pair["local_gap"],
        "global_gap": best_pair["global_gap"],
        "preference_strength": best_score,
    }
