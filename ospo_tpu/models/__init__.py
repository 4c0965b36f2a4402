from ospo_tpu.models.llama import LlamaConfig  # noqa: F401
from ospo_tpu.models.janus import JanusConfig, JanusModel  # noqa: F401
