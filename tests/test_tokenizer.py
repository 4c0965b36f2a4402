"""Tokenizer backends: byte fallback roundtrips + HF-tokenizers backend
built from a real BPE tokenizer.json (dress rehearsal for the Janus files)."""

import numpy as np
import pytest

from ospo_tpu.constants import (
    EOS_TAG,
    IMAGE_END_TAG,
    IMAGE_START_TAG,
    IMAGE_TAG,
    PAD_TAG,
)
from ospo_tpu.tokenizer import ByteTokenizer, HFTokenizer, load_tokenizer


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer(512)
    text = "Hello, TPU world! héllo"
    ids = tok.encode(text)
    assert ids[0] == tok.bos_id
    assert tok.decode(ids) == text


def test_byte_tokenizer_special_tags_single_token():
    tok = ByteTokenizer(512)
    text = f"img: {IMAGE_TAG} end {IMAGE_START_TAG}{IMAGE_END_TAG}{PAD_TAG}{EOS_TAG}"
    ids = tok.encode(text, add_bos=False)
    assert ids.count(tok.image_id) == 1
    assert ids.count(tok.image_start_id) == 1
    assert ids.count(tok.image_end_id) == 1
    assert ids.count(tok.pad_id) == 1
    assert ids.count(tok.eos_id) == 1
    # specials dropped on skip_special_tokens decode
    assert tok.decode(ids) == "img:  end "


def test_byte_tokenizer_call_shim():
    tok = ByteTokenizer(512)
    out = tok("yes", add_special_tokens=False)
    assert out.input_ids == [ord("y"), ord("e"), ord("s")]


@pytest.fixture
def hf_tokenizer_path(tmp_path):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=300, special_tokens=["<unk>"] + list(
            (EOS_TAG, PAD_TAG, IMAGE_TAG, IMAGE_START_TAG, IMAGE_END_TAG)
        ),
    )
    tok.train_from_iterator(
        ["a black umbrella", "a red moon and a white sky",
         "yes no Yes No the quick brown fox"], trainer)
    path = tmp_path / "tokenizer.json"
    tok.save(str(path))
    return str(tmp_path)


def test_hf_tokenizer_backend(hf_tokenizer_path):
    tok = HFTokenizer(hf_tokenizer_path)
    ids = tok.encode("a black umbrella")
    assert ids[0] == tok.bos_id  # BOS prepended (registered special)
    text = tok.decode(ids[1:])
    assert "black" in text
    # special ids resolve through .vocab like the reference wrappers expect
    assert tok.vocab.get(IMAGE_TAG) == tok.image_id
    assert tok.pad_id != tok.eos_id


def test_load_tokenizer_fallback(tmp_path):
    tok = load_tokenizer(str(tmp_path / "missing"), vocab_size=512)
    assert isinstance(tok, ByteTokenizer)


def test_load_tokenizer_hf(hf_tokenizer_path):
    tok = load_tokenizer(hf_tokenizer_path)
    assert isinstance(tok, HFTokenizer)
