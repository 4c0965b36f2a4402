"""Golden parity: our template library must render byte-identical
(system_prompt, conversation) pairs to the reference's template modules.
The reference template files are dependency-free pure-Python data, so we
import them directly as the oracle."""

import importlib.util
import random
import sys

import pytest


def _load_ref(name):
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", f"/root/reference/ospo/templates/{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ref_element = _load_ref("template_element")
ref_negative = _load_ref("template_negative")
ref_dense = _load_ref("template_dense")
ref_vqa = _load_ref("template_vqa")

from ospo_tpu.pipeline.templates import (
    get_dense_conversation,
    get_element_conversation,
    get_negative_conversation,
    get_vqa_conversation,
)

REF_ELEMENT_FNS = {
    "object": ref_element.get_object_prompt,
    "color": ref_element.get_color_prompt,
    "texture": ref_element.get_texture_prompt,
    "shape": ref_element.get_shape_prompt,
    "spatial": ref_element.get_spatial_prompt,
    "non-spatial": ref_element.get_non_spatial_prompt,
    "complex": ref_element.get_complex_prompt,
}


def assert_conv_equal(ours, refs):
    sys_ours, conv_ours = ours
    sys_ref, conv_ref = refs
    assert sys_ours == sys_ref
    assert len(conv_ours) == len(conv_ref)
    for m_ours, m_ref in zip(conv_ours, conv_ref):
        assert m_ours["role"] == m_ref["role"]
        assert m_ours["content"] == m_ref["content"]


@pytest.mark.parametrize("category", list(REF_ELEMENT_FNS))
def test_element_templates(category):
    assert_conv_equal(get_element_conversation(category), REF_ELEMENT_FNS[category]())


SUBCATS = ["attribute1_color", "attribute1_texture", "attribute1_shape",
           "attribute2", "layout1", "layout2", "layout3", "non-spatial",
           "complex"]


@pytest.mark.parametrize("sub", SUBCATS)
@pytest.mark.parametrize("p_type", ["replace", "swap", "drop"])
def test_negative_templates(sub, p_type):
    prompt = "A black umbrella"
    random.seed(0)
    ref = ref_negative.get_prompt_negative[sub](p_type, prompt)
    random.seed(0)
    ours = get_negative_conversation(sub, p_type, prompt)
    if ref == (None, None):
        assert ours == (None, None)
    else:
        assert_conv_equal(ours, ref)


@pytest.mark.parametrize("sub", SUBCATS)
def test_dense_templates(sub):
    base, neg = "A black umbrella", "a green umbrella"
    assert_conv_equal(
        get_dense_conversation(sub, base, neg),
        ref_dense.get_prompt_dense[sub](base, neg),
    )


@pytest.mark.parametrize("category", ["attribute", "layout", "non-spatial", "complex"])
def test_vqa_templates(category):
    prompt = "A black umbrella"
    assert_conv_equal(
        get_vqa_conversation(category, prompt),
        ref_vqa.get_vqa_prompt(category, prompt),
    )
