"""Conversation-template registry parity: every style the reference
registers (janus/utils/conversation.py:241-345) renders byte-identical
prompts through our TEMPLATE_REGISTRY.  The reference module is pure
Python (dataclasses + IntEnum) — imported directly as the oracle."""

import importlib.util

import pytest

from ospo_tpu import chat


def _load_ref_conversation():
    spec = importlib.util.spec_from_file_location(
        "ref_conversation", "/root/reference/janus/utils/conversation.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ref = _load_ref_conversation()

TURN_SETS = [
    [("What is in this image?", "A red cube."),
     ("Where is it?", "On a table.")],
    [("Describe the scene.", None)],  # open assistant turn
    [("First question?", "First answer."),
     ("Second question?", "Second answer."),
     ("Third question?", None)],
]
SYSTEMS = ["", "You are a meticulous visual judge."]


@pytest.mark.parametrize("name", ["deepseek", "deepseek_old", "llama-2",
                                  "llava_llama2", "plain", "alignment"])
@pytest.mark.parametrize("turns_idx", range(len(TURN_SETS)))
@pytest.mark.parametrize("system", SYSTEMS)
def test_style_matches_reference(name, turns_idx, system):
    conv = ref.get_conv_template(name)
    if system:
        conv.set_system_message(system)
    roles = chat.TEMPLATE_INFO[name]["roles"]
    msgs = []
    for q, a in TURN_SETS[turns_idx]:
        conv.append_message(conv.roles[0], q)
        msgs.append((roles[0], q))
        conv.append_message(conv.roles[1], a)
        msgs.append((roles[1], a or ""))
    want = conv.get_prompt()
    got = chat.render_template(name, msgs,
                               system_prompt=conv.system_message)
    assert got == want, (name, got, want)


def test_registry_covers_reference_styles():
    """Every template the reference registers (minus its EOL'd
    deepseek-vl2 variants that Janus-Pro never loads) exists here with
    the same canonical roles."""
    for name in ("deepseek", "deepseek_old", "llama-2", "llava_llama2",
                 "plain", "alignment"):
        conv = ref.get_conv_template(name)
        assert name in chat.TEMPLATE_REGISTRY
        assert tuple(conv.roles) == chat.TEMPLATE_INFO[name]["roles"]
        assert conv.sep == chat.TEMPLATE_INFO[name]["sep"]
        assert (conv.sep2 or "") == chat.TEMPLATE_INFO[name]["sep2"] or \
            name.startswith("deepseek")  # sep2 is the EOS surface form
