"""english utils vs inflect semantics (the subset step-1 uses)."""

import pytest

from ospo_tpu.utils.english import number_to_words, plural


@pytest.mark.parametrize("n,expect", [
    (1, "one"), (2, "two"), (5, "five"), (13, "thirteen"),
    (20, "twenty"), (21, "twenty-one"), (29, "twenty-nine"),
])
def test_number_to_words(n, expect):
    assert number_to_words(n) == expect


@pytest.mark.parametrize("noun,expect", [
    ("dog", "dogs"), ("box", "boxes"), ("bench", "benches"),
    ("city", "cities"), ("key", "keys"), ("knife", "knives"),
    ("leaf", "leaves"), ("child", "children"), ("person", "people"),
    ("sheep", "sheep"), ("coffee cup", "coffee cups"),
    ("sweet potato", "sweet potatoes"), ("piano", "pianos"),
])
def test_plural(noun, expect):
    assert plural(noun) == expect


def test_config_system(tmp_path):
    from ospo_tpu.config import Config, build_config, save_config, load_saved_config

    p = tmp_path / "c.yaml"
    p.write_text("a: 1\nnested:\n  x: foo\n  y: ${a}\nseed_list: [0,1,2]\n")
    cfg = build_config(str(p), overrides=["nested.x=bar", "b=2.5"], use_cli=False)
    assert cfg.a == 1
    assert cfg.nested.x == "bar"
    assert cfg.nested.y == 1          # interpolation
    assert cfg.b == 2.5
    assert cfg.missing_key is None    # absent keys read as None
    assert cfg.seed_list == [0, 1, 2]

    save_config(str(tmp_path / "out"), cfg)
    loaded = load_saved_config(str(tmp_path / "out"))
    assert loaded.nested.x == "bar"


def test_dedup_by_item_id():
    from ospo_tpu.io import dedup_by_item_id

    records = [{"item_id": "0000002"}, {"item_id": "0000001"},
               {"item_id": "0000002"}]
    out = dedup_by_item_id(records)
    assert [r["item_id"] for r in out] == ["0000001", "0000002"]


def test_shard_for_process():
    from ospo_tpu.io import shard_for_process

    items = list(range(10))
    shards = [shard_for_process(items, i, 4) for i in range(4)]
    assert sorted(x for s in shards for x in s) == items
