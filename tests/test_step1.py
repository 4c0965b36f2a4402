"""Step 1: element generation + combinatorial base-prompt construction."""

import json
import os

import pytest

from ospo_tpu.config import Config
from ospo_tpu.pipeline import step1


def cfg(**kw):
    return Config.from_nested(kw)


def test_parse_element_answer_filters():
    out = step1.parse_element_answer("dog, ROSE , blue-green, a/b, color red, cat", "object")
    # 'blue-green' fails the regex, 'a/b' fails, 'color red' hits a stop word
    assert out == ["dog", "rose", "cat"]
    # non-element categories take the whole answer
    assert step1.parse_element_answer(" A Prompt. ", "complex") == ["a prompt."]


def test_construct_prompt_layouts():
    import random

    random.seed(0)
    objs = ["dog", "cat", "car", "house"]
    colors = ["red", "blue"]
    p1 = step1.construct_prompt(objs, colors, "attribute1", 5)
    assert len(p1) == 5
    assert all(p.startswith("A ") for p in p1)

    p2 = step1.construct_prompt(objs, [], "layout2", 6)
    assert len(p2) == 6

    p3 = step1.construct_prompt(objs, [], "layout3", 4)
    assert len(p3) == 4
    assert all(" and " in p for p in p3)

    p4 = step1.construct_prompt(
        objs, [colors, ["round", "square"], ["soft", "rough"]], "attribute2", 4)
    assert len(p4) == 4
    assert all(" and a " in p for p in p4)


def test_combine_prompt_item_ids(tmp_path):
    import random

    random.seed(42)
    save = tmp_path / "step1"
    os.makedirs(save)
    elements = {
        "object": ["dog", "cat", "car"],
        "color": ["red", "blue"],
        "shape": ["round"],
        "texture": ["soft"],
        "spatial": ["above", "below"],
        "non-spatial": ["A dog is running.", "A cat sits."],
        "complex": ["The red dog sat next to the blue cat."],
    }
    for name, data in elements.items():
        json.dump(data, open(save / f"{name}_element.json", "w"))

    config = cfg(save_path=str(save), category_num={
        "attribute1_color": 3, "layout1": 2, "layout2": 2, "layout3": 2,
        "non-spatial": 2, "complex": 1,
    })
    step1.combine_prompt(config)

    out = json.load(open(save / "base_prompt.json"))
    assert len(out) == 12
    ids = [r["item_id"] for r in out]
    assert ids == sorted(ids, key=int)
    cats = {r["item_id"][0] for r in out}
    assert cats == {"0", "1", "2", "3"}  # attribute/layout/non-spatial/complex
    for r in out:
        assert set(r) == {"prompt", "category", "sub_category", "item_id"}


def test_step1_main_tiny(tmp_path):
    config = cfg(
        seed=42, batch_size=2, max_len=3, category="object",
        save_path=str(tmp_path), model_preset="tiny",
        generation_config={"do_sample": True, "temperature": 1.3,
                           "max_new_tokens": 8},
    )
    step1.main(config)
    out = json.load(open(tmp_path / "object_element.json"))
    assert isinstance(out, list)
