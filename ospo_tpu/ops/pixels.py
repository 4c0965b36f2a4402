"""On-device pixel normalization for uint8-transferred images.

The reference preprocesses on the host (``VLMImageProcessor``,
``janus/models/image_processing_vlm.py:92-196``: rescale 1/255 +
normalize) and ships float32 tensors to the device.  On a TPU behind a
network tunnel — or any host↔device link — that quadruples the transfer
bytes of every image batch for arithmetic the device does for free
fused into the first conv.  The hot paths (SimPO training batches,
step-4b scoring chunks) therefore ship **uint8** pixels (resize/pad
only on host, ``ImageProcessor.process_one_u8``) and normalize here,
inside the jitted program.

``normalize_pixels`` is a trace-time dtype branch: float inputs (the
host-normalized layout every other caller produces) pass through
untouched, so both layouts share one code path and stay numerically
identical (same float32 ops, same constants — parity-tested in
``tests/test_uint8_pixels.py``).
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_pixels(x, image_processor, dtype=jnp.float32):
    """uint8 [..., H, W, 3] → normalized ``dtype`` pixels; float passes
    through unchanged (already host-normalized)."""
    if x.dtype != jnp.uint8:
        return x
    ip = image_processor
    x = x.astype(dtype) * jnp.asarray(ip.rescale_factor, dtype)
    if ip.do_normalize:
        x = (x - jnp.asarray(ip.image_mean, dtype)) / jnp.asarray(
            ip.image_std, dtype
        )
    return x
