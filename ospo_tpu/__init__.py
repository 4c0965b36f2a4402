"""ospo_tpu — a TPU-native JAX framework for object-centric self-improving
preference optimization (OSPO).

Re-implements the full capability surface of the OSPO reference
(OSPO-NeurIPS2025/OSPO): a unified multimodal LLM (Janus-Pro family) that
bootstraps its own compositional text-to-image preference data over a
5-stage pipeline and trains itself with SimPO on LoRA adapters — redesigned
from scratch for TPUs (jax / XLA / Pallas / pjit), not ported from torch.

Subpackages
-----------
- ``ospo_tpu.models``    Janus-Pro model family in pure-functional JAX
  (Llama decoder, SigLIP ViT, VQ-GAN, projectors) with stacked-layer
  ``lax.scan`` forward passes and bf16 weights.
- ``ospo_tpu.ops``       Pallas TPU kernels + XLA fallbacks (flash attention,
  fused sampling).
- ``ospo_tpu.parallel``  GSPMD mesh/sharding layer (data/tensor parallel over
  ICI) and multi-host object merging.
- ``ospo_tpu.engine``    jitted generation engines: batched text decode and
  CFG image-token decode as fixed-shape scans over a KV cache.
- ``ospo_tpu.train``     LoRA, SimPO loss, optax optimizers/schedules, Orbax
  checkpointing, the jitted training step.
- ``ospo_tpu.pipeline``  the 5-stage OSPO pipeline CLIs, prompt-template
  library and dataset layer (JSON protocol compatible with the reference's
  ``examples/``).
"""

__version__ = "0.1.0"
