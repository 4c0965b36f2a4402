"""Chat templating for the Janus-Pro / DeepSeek conversation format.

The only template the OSPO pipeline uses is ``"deepseek"``
(``janus/utils/conversation.py:293-309``): roles ``<|User|>`` /
``<|Assistant|>``, turn separator ``"\n\n"``, end-of-conversation separator
``<｜end▁of▁sentence｜>``, rendered as::

    {system}\n\n<|User|>: {msg}\n\n<|Assistant|>:{answer}<｜end▁of▁sentence｜>

with the system block omitted entirely when the system message is empty.
We implement that format directly instead of a multi-style registry.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

from ospo_tpu.constants import EOS_TAG

DEFAULT_SYSTEM_PROMPT = (
    "You are a helpful language and vision assistant. "
    "You are able to understand the visual content that the user provides, "
    "and assist the user with a variety of tasks using natural language."
)

USER_ROLE = "<|User|>"
ASSISTANT_ROLE = "<|Assistant|>"


@dataclass
class ChatTemplate:
    """DeepSeek-style two-role chat template."""

    sep: str = "\n\n"
    sep2: str = EOS_TAG
    roles: Tuple[str, str] = (USER_ROLE, ASSISTANT_ROLE)

    def render(
        self,
        messages: Sequence[Tuple[str, str]],
        system_prompt: str = "",
    ) -> str:
        """Render (role, content) turns; empty content leaves an open turn
        (``"<|Assistant|>:"``) for the model to complete."""
        parts: List[str] = []
        if system_prompt:
            parts.append(system_prompt + self.sep)
        # NOTE: role strings are rendered verbatim — the reference appends the
        # role given in each message dict, so step-3 T2I prompts read
        # "User: ..." while step-4 VQA prompts read "<|User|>: ...".
        seps = (self.sep, self.sep2)
        for i, (role, message) in enumerate(messages):
            if message:
                parts.append(f"{role}: {message}{seps[i % 2]}")
            else:
                parts.append(f"{role}:")
        return "".join(parts)


_TEMPLATE = ChatTemplate()


# ---------------------------------------------------------------------------
# template registry
# ---------------------------------------------------------------------------
# The reference carries a multi-style registry (janus/utils/conversation.py:
# 221-320); OSPO itself only ever uses "deepseek", but the other styles are
# part of the model family's chat surface.


def _render_deepseek(messages, system_prompt):
    return _TEMPLATE.render(messages, system_prompt=system_prompt)


def _render_llama2(messages, system_prompt):
    seps = (" ", " </s><s>")
    ret = f"[INST] <<SYS>>\n{system_prompt}\n<</SYS>>\n\n" if system_prompt else "[INST] "
    tags = ("[INST]", "[/INST]")
    for i, (role, message) in enumerate(messages):
        tag = tags[i % 2]
        if message:
            if i == 0:
                ret += message + " "
            else:
                ret += f"{tag} {message}{seps[i % 2]}"
        else:
            ret += tag
    return ret


def _render_plain(messages, system_prompt):
    return "".join(m for _, m in messages if m)


def _render_alignment(messages, system_prompt):
    # ALIGNMENT style (janus/utils/conversation.py:124-137): even turns
    # are replaced by a literal image marker, odd turns keep their text;
    # sep/sep2 are "" for the registered "alignment" template
    return "".join("<image>\n" if i % 2 == 0 else m
                   for i, (_, m) in enumerate(messages) if m)


def _render_llava_llama2(messages, system_prompt):
    # llama-2 rendering with the llava default system message when the
    # caller passes none (janus/utils/conversation.py:241-256)
    return _render_llama2(messages, system_prompt or DEFAULT_SYSTEM_PROMPT)


TEMPLATE_REGISTRY = {
    "deepseek": _render_deepseek,
    # same DeepSeek separator algebra, bare "User"/"Assistant" roles in
    # the canonical role set (roles always come from the messages here)
    "deepseek_old": _render_deepseek,
    "llama-2": _render_llama2,
    "llava_llama2": _render_llava_llama2,
    "plain": _render_plain,
    "alignment": _render_alignment,
}

# per-template chat surface the reference's Conversation objects carry
# (canonical roles + decode stop strings) — janus/utils/conversation.py:
# 241-345.  OSPO only consumes "deepseek"; the rest complete the model
# family's registry for reference users.
TEMPLATE_INFO = {
    "deepseek": {"roles": (USER_ROLE, ASSISTANT_ROLE), "sep": "\n\n",
                 "sep2": EOS_TAG, "stop_str": ["<|User|>", EOS_TAG]},
    "deepseek_old": {"roles": ("User", "Assistant"), "sep": "\n\n",
                     "sep2": EOS_TAG, "stop_str": ["User:", EOS_TAG]},
    "llama-2": {"roles": ("[INST]", "[/INST]"), "sep": " ",
                "sep2": " </s><s>", "stop_str": ["[INST]"]},
    "llava_llama2": {"roles": ("[INST]", "[/INST]"), "sep": " ",
                     "sep2": " </s><s>", "stop_str": ["[INST]"]},
    "plain": {"roles": ("", ""), "sep": "", "sep2": "",
              "stop_str": ["</s>"]},
    "alignment": {"roles": ("", ""), "sep": "", "sep2": "",
                  "stop_str": ["</s>"]},
}


def render_template(name: str, messages, system_prompt: str = "") -> str:
    return TEMPLATE_REGISTRY[name](list(messages), system_prompt)


def apply_sft_template(
    conversations: Sequence[Dict[str, str]],
    system_prompt: str = "",
    sft_format: str = "deepseek",
) -> str:
    """Render a conversation (list of ``{"role", "content"}`` dicts) to the
    SFT prompt string.  Content is stripped and the final prompt stripped,
    matching ``apply_sft_template_for_multi_turn_prompts``
    (``janus/models/processing_vlm.py:137-177``)."""
    msgs = [(m["role"], m["content"].strip()) for m in conversations]
    return render_template(sft_format, msgs, system_prompt).strip()


def t2i_conversation(prompt: str) -> List[Dict[str, str]]:
    """Single-turn text-to-image conversation (``ospo/utils/processor.py:8-17``).

    Uses bare "User"/"Assistant" role strings exactly like the reference's
    ``get_conversation`` — this affects tokenization of every T2I prompt.
    """
    return [
        {"role": "User", "content": prompt},
        {"role": "Assistant", "content": ""},
    ]


def get_sft_format(system_prompt: str, conversation: Sequence[Dict[str, str]]) -> str:
    return apply_sft_template(conversation, system_prompt=system_prompt)
