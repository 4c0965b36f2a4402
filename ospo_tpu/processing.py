"""Multimodal chat processor: prompt rendering, image-token expansion,
left-padded batching.

Numpy re-implementation of ``VLChatProcessor``
(``janus/models/processing_vlm.py:72-418``) with identical sequence
semantics:

- each ``<image_placeholder>`` occurrence in the tokenised prompt expands to
  ``<begin_of_image>`` + 576×``<image_placeholder>`` + ``<end_of_image>``;
- batches are **left-padded** with ``<｜▁pad▁｜>``;
- ``images_seq_mask`` marks the 576-token spans, ``images_emb_mask`` marks
  valid image-embedding rows.

Output arrays are numpy; engines move them to device and pad to shape
buckets (fixed shapes keep XLA from retracing).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from ospo_tpu import chat
from ospo_tpu.constants import IMAGE_TOKEN_NUM_PER_IMAGE
from ospo_tpu.image_processing import ImageProcessor
from ospo_tpu.tokenizer import BaseTokenizer


@dataclasses.dataclass
class ProcessorOutput:
    sft_format: str
    input_ids: np.ndarray          # [T] int32, image tokens expanded
    pixel_values: np.ndarray       # [n_images, H, W, 3] float32
    num_image_tokens: List[int]    # per image

    def __len__(self) -> int:
        return len(self.input_ids)


@dataclasses.dataclass
class BatchedOutput:
    sft_format: List[str]
    input_ids: np.ndarray          # [B, T] int32 (left-padded)
    attention_mask: np.ndarray     # [B, T] int32
    pixel_values: np.ndarray       # [B, n, H, W, 3] float32
    images_seq_mask: np.ndarray    # [B, T] bool
    images_emb_mask: np.ndarray    # [B, n, T2] bool


class Processor:
    system_prompt = chat.DEFAULT_SYSTEM_PROMPT

    def __init__(
        self,
        tokenizer: BaseTokenizer,
        image_processor: Optional[ImageProcessor] = None,
        num_image_tokens: int = IMAGE_TOKEN_NUM_PER_IMAGE,
    ):
        self.tokenizer = tokenizer
        self.image_processor = image_processor or ImageProcessor()
        self.num_image_tokens = num_image_tokens

    # --- ids -----------------------------------------------------------
    @property
    def image_id(self) -> int:
        return self.tokenizer.image_id

    @property
    def image_start_id(self) -> int:
        return self.tokenizer.image_start_id

    @property
    def image_end_id(self) -> int:
        return self.tokenizer.image_end_id

    @property
    def pad_id(self) -> int:
        return self.tokenizer.pad_id

    # tag passthroughs used by pipeline code
    @property
    def image_start_tag(self) -> str:
        from ospo_tpu.constants import IMAGE_START_TAG

        return IMAGE_START_TAG

    # --- core ------------------------------------------------------------
    def apply_sft_template(self, conversations, system_prompt="") -> str:
        return chat.apply_sft_template(conversations, system_prompt=system_prompt)

    def expand_image_tokens(self, input_ids: np.ndarray) -> np.ndarray:
        """Replace each image placeholder with boi + 576×img + eoi
        (``add_image_token``, processing_vlm.py:215-258)."""
        out: List[int] = []
        span = [self.image_start_id] + [self.image_id] * self.num_image_tokens + [
            self.image_end_id
        ]
        for t in input_ids.tolist():
            if t == self.image_id:
                out.extend(span)
            else:
                out.append(t)
        return np.asarray(out, np.int32)

    def process_one(
        self,
        prompt: Optional[str] = None,
        conversations: Optional[Sequence[Dict[str, str]]] = None,
        images: Sequence = (),
        system_prompt: Optional[str] = None,
    ) -> ProcessorOutput:
        assert (prompt is None) != (conversations is None), (
            "exactly one of prompt / conversations"
        )
        if prompt is None:
            sft_format = self.apply_sft_template(
                conversations,
                system_prompt=self.system_prompt if system_prompt is None else system_prompt,
            )
        else:
            sft_format = prompt

        input_ids = np.asarray(self.tokenizer.encode(sft_format), np.int32)
        n_images = int(np.sum(input_ids == self.image_id))
        input_ids = self.expand_image_tokens(input_ids)
        pixel_values = self.image_processor(list(images))
        return ProcessorOutput(
            sft_format=sft_format,
            input_ids=input_ids,
            pixel_values=pixel_values,
            num_image_tokens=[self.num_image_tokens] * n_images,
        )

    def batchify(self, prepares: Sequence[ProcessorOutput]) -> BatchedOutput:
        bsz = len(prepares)
        t2 = self.num_image_tokens
        seq_lens = [len(p) for p in prepares]
        n_images = [len(p.num_image_tokens) for p in prepares]
        t_max = max(seq_lens)
        n_max = max(1, max(n_images))
        hwc = self.image_processor.default_shape

        input_ids = np.full((bsz, t_max), self.pad_id, np.int32)
        attention_mask = np.zeros((bsz, t_max), np.int32)
        pixel_values = np.zeros((bsz, n_max, *hwc), np.float32)
        seq_mask = np.zeros((bsz, t_max), bool)
        emb_mask = np.zeros((bsz, n_max, t2), bool)
        sft_formats = []

        for i, p in enumerate(prepares):
            t = seq_lens[i]
            input_ids[i, -t:] = p.input_ids          # left padding
            attention_mask[i, -t:] = 1
            seq_mask[i, -t:] = p.input_ids == self.image_id
            if n_images[i] > 0:
                pixel_values[i, : n_images[i]] = p.pixel_values
                for j, n_tok in enumerate(p.num_image_tokens):
                    emb_mask[i, j, :n_tok] = True
            sft_formats.append(p.sft_format)

        return BatchedOutput(
            sft_format=sft_formats,
            input_ids=input_ids,
            attention_mask=attention_mask,
            pixel_values=pixel_values,
            images_seq_mask=seq_mask,
            images_emb_mask=emb_mask,
        )

    def __call__(self, *, prompt=None, conversations=None, images=(),
                 system_prompt=None) -> BatchedOutput:
        return self.batchify(
            [self.process_one(prompt=prompt, conversations=conversations,
                              images=images, system_prompt=system_prompt)]
        )

    # --- text-only fast path (ospo/utils/processor.py equivalents) -------
    def encode_batch_left_padded(self, prompts: Sequence[str]):
        """Tokenise + left-pad a list of raw prompt strings.

        Returns (input_ids [B, T] int32, attention_mask [B, T] int32) —
        the exact padding scheme of the CFG decode prompt builder
        (ospo/wrapper/image_generation.py:125-141) and the text engines.
        """
        ids_list = [np.asarray(self.tokenizer.encode(p), np.int32) for p in prompts]
        t_max = max(len(x) for x in ids_list)
        bsz = len(ids_list)
        input_ids = np.full((bsz, t_max), self.pad_id, np.int32)
        mask = np.zeros((bsz, t_max), np.int32)
        for i, ids in enumerate(ids_list):
            input_ids[i, t_max - len(ids):] = ids
            mask[i, t_max - len(ids):] = 1
        return input_ids, mask


def t2i_prompt(processor: Processor, prompt: str) -> str:
    """Render the text-to-image generation prompt: bare-role SFT format with
    empty system prompt + ``<begin_of_image>`` appended
    (``get_image_generation_prompt``, ospo/wrapper/image_generation.py:100-106)."""
    sft = chat.apply_sft_template(chat.t2i_conversation(prompt), system_prompt="")
    return sft + processor.image_start_tag
