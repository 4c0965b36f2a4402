from ospo_tpu.models.llama import LlamaConfig  # noqa: F401
