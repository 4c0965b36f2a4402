"""Host-side image preprocessing.

Mirrors ``VLMImageProcessor`` (``janus/models/image_processing_vlm.py:92-196``):
resize longest side to ``image_size`` (bicubic, antialias), pad to square
with the mean-colour background, rescale 1/255, normalise.  Output is NHWC
float32 — the TPU-native layout consumed by the JAX ViT/VQ stacks (the
reference emits NCHW for torch).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image

# Defaults match the reference's VLMImageProcessor CLIP stats
# (image_processing_vlm.py:68-77) so behavior is identical when no
# checkpoint preprocessor_config.json is present.  Janus-Pro checkpoints
# ship inception-style 0.5/0.5 stats in preprocessor_config.json, which
# ImageProcessor.from_config picks up — so real-checkpoint runs normalise
# to [-1, 1] exactly as before.
DEFAULT_MEAN = (0.48145466, 0.4578275, 0.40821073)
DEFAULT_STD = (0.26862954, 0.26130258, 0.27577711)


def expand2square(img: Image.Image, background_color: Tuple[int, int, int]) -> Image.Image:
    w, h = img.size
    if w == h:
        return img
    side = max(w, h)
    out = Image.new(img.mode, (side, side), background_color)
    out.paste(img, ((side - w) // 2, (side - h) // 2))
    return out


class ImageProcessor:
    def __init__(
        self,
        image_size: int = 384,
        min_size: int = 14,
        image_mean: Sequence[float] = DEFAULT_MEAN,
        image_std: Sequence[float] = DEFAULT_STD,
        rescale_factor: float = 1.0 / 255.0,
        do_normalize: bool = True,
    ):
        self.image_size = image_size
        self.min_size = min_size
        self.image_mean = tuple(image_mean)
        self.image_std = tuple(image_std)
        self.rescale_factor = rescale_factor
        self.do_normalize = do_normalize
        self.background_color = tuple(int(x * 255) for x in self.image_mean)

    @property
    def default_shape(self) -> Tuple[int, int, int]:
        """NHWC single-image shape."""
        return (self.image_size, self.image_size, 3)

    def resize(self, img: Image.Image) -> Image.Image:
        if img.mode != "RGB":
            img = img.convert("RGB")
        w, h = img.size
        m = max(w, h)
        size = (
            max(int(w / m * self.image_size), self.min_size),
            max(int(h / m * self.image_size), self.min_size),
        )
        img = img.resize(size, Image.Resampling.BICUBIC)
        return expand2square(img, self.background_color)

    def process_one(self, img: Image.Image) -> np.ndarray:
        arr = np.asarray(self.resize(img), np.float32) * self.rescale_factor
        if self.do_normalize:
            arr = (arr - np.asarray(self.image_mean, np.float32)) / np.asarray(
                self.image_std, np.float32
            )
        return arr  # [H, W, 3]

    def process_one_u8(self, img: Image.Image) -> np.ndarray:
        """Resize/pad only — rescale + normalize run ON DEVICE
        (``ops.pixels.normalize_pixels``) so image batches transfer as
        uint8, 4x fewer bytes over the host↔device link than the
        host-normalized float32 layout ``process_one`` emits."""
        return np.asarray(self.resize(img), np.uint8)  # [H, W, 3]

    def process_one_transfer(self, img: Image.Image) -> np.ndarray:
        """The host→device transfer layout for hot-path image batches
        (scoring chunks, train batches): uint8 by default, or the
        host-normalized float32 layout when ``OSPO_U8_PIXELS=0`` —
        the A/B measurement knob and the safety valve if a backend
        mishandles uint8 transfers."""
        import os

        if os.environ.get("OSPO_U8_PIXELS", "1").lower() in ("0", "off"):
            return self.process_one(img)
        return self.process_one_u8(img)

    def __call__(self, images: Sequence[Image.Image]) -> np.ndarray:
        """→ [n_images, H, W, 3] float32 (possibly n_images == 0)."""
        if not images:
            return np.zeros((0, *self.default_shape), np.float32)
        return np.stack([self.process_one(im) for im in images])

    def denormalize_to_uint8(self, pixels: np.ndarray) -> np.ndarray:
        """Model-space pixels (≈[-1,1] NHWC) → uint8 images, matching the
        reference's ``np.clip((dec + 1) / 2 * 255, 0, 255)``
        (ospo/wrapper/image_generation.py:177)."""
        return np.clip((pixels + 1.0) / 2.0 * 255.0, 0, 255).astype(np.uint8)


def load_image_processor(model_path: Optional[str] = None,
                         image_size: int = 384) -> ImageProcessor:
    """Build from a checkpoint's ``preprocessor_config.json`` when present."""
    import json
    import os

    if model_path:
        cfg_path = os.path.join(model_path, "preprocessor_config.json")
        if os.path.isfile(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
            return ImageProcessor(
                image_size=cfg.get("image_size", image_size),
                min_size=cfg.get("min_size", 14),
                image_mean=cfg.get("image_mean", DEFAULT_MEAN),
                image_std=cfg.get("image_std", DEFAULT_STD),
                rescale_factor=cfg.get("rescale_factor", 1.0 / 255.0),
                do_normalize=cfg.get("do_normalize", True),
            )
    return ImageProcessor(image_size=image_size)
