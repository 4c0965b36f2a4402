"""Exhaustive decode-configuration matrix (VERDICT round-1 weak #7).

The image engine's decode options interact:
    kv_layout ∈ {bshd, bhsd, shbd} × decode_kernel × speculative (SJD)
    × kv_quant × OSPO_FAST_DECODE
with constraints (asserted in ``llama.forward`` / ``ImageGenEngine``):
    decode_kernel  → layout == shbd, no SJD
    SJD (per-row)  → layout != shbd
    fast path      → skipped automatically for kernel / SJD

Rather than pairwise spot checks, enumerate EVERY valid combination at
tiny scale and require token-identical output to the canonical config
(pure memory-order / implementation choices must not change results);
every invalid combination must fail loudly at engine construction.
"""

import itertools
import os

import numpy as np
import pytest

import jax.numpy as jnp

from ospo_tpu.engine.image_engine import ImageGenEngine
from ospo_tpu.image_processing import ImageProcessor
from ospo_tpu.models import janus
from ospo_tpu.processing import Processor, t2i_prompt
from ospo_tpu.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = janus.tiny_janus_config()
    model = janus.JanusModel.init(cfg, seed=0)
    tok = ByteTokenizer(vocab_size=cfg.language.vocab_size)
    proc = Processor(tok, ImageProcessor(image_size=16), num_image_tokens=4)
    return cfg, model, proc


def make_engine(model, proc, *, layout, kernel, sjd, quant):
    return ImageGenEngine(
        model, proc, image_token_num=8, img_size=16, patch_size=4,
        kv_quant=quant, kv_layout=layout, decode_kernel=kernel,
        speculative=sjd,
    )


LAYOUTS = ("bshd", "bhsd", "shbd")


def valid_combos():
    for layout, kernel, sjd, quant, fast in itertools.product(
            LAYOUTS, (False, True), (0, 2), (False, True), (False, True)):
        if kernel and (layout != "shbd" or sjd):
            continue
        if sjd and layout == "shbd":
            continue
        if fast and (kernel or sjd):
            continue  # fast path never engages there — identical program
        yield layout, kernel, sjd, quant, fast


def test_every_valid_combo_token_identical(setup, monkeypatch):
    cfg, model, proc = setup
    prompts = [t2i_prompt(proc, "A red ball"), t2i_prompt(proc, "cat")]

    # canonical references, one per quant setting (quantization is a
    # numerics choice, so int8 combos compare against the int8 canonical)
    ref = {}
    for quant in (False, True):
        eng = make_engine(model, proc, layout="bshd", kernel=False, sjd=0,
                          quant=quant)
        ref[quant] = eng.generate_tokens(prompts, seed=11)

    checked = 0
    for layout, kernel, sjd, quant, fast in valid_combos():
        monkeypatch.setenv("OSPO_FAST_DECODE", "1" if fast else "0")
        eng = make_engine(model, proc, layout=layout, kernel=kernel,
                          sjd=sjd, quant=quant)
        out = eng.generate_tokens(prompts, seed=11)
        monkeypatch.delenv("OSPO_FAST_DECODE")
        if sjd:
            # SJD preserves the sampling distribution, not the sample;
            # shape/dtype/range only (near-greedy equality is covered in
            # test_sjd.py)
            assert out.shape == ref[quant].shape
            assert (out >= 0).all()
        else:
            np.testing.assert_array_equal(
                ref[quant], out,
                err_msg=f"layout={layout} kernel={kernel} quant={quant} "
                        f"fast={fast}")
        checked += 1
    # 3 layouts × 2 quant × 2 fast (no kernel/sjd) = 12, + kernel (shbd,
    # 2 quant) = 2, + sjd (bshd/bhsd × 2 quant) = 4 → 18 valid combos
    assert checked == 18


@pytest.mark.parametrize("kwargs", [
    dict(layout="bshd", kernel=True, sjd=0, quant=True),   # kernel needs shbd
    dict(layout="bhsd", kernel=True, sjd=0, quant=True),
    dict(layout="shbd", kernel=True, sjd=2, quant=True),   # kernel + SJD
    dict(layout="shbd", kernel=False, sjd=2, quant=False), # SJD batch-minor
])
def test_invalid_combos_fail_loudly(setup, kwargs):
    cfg, model, proc = setup
    with pytest.raises(AssertionError):
        make_engine(model, proc, **kwargs)
