from ospo_tpu.ops.attention import attention  # noqa: F401
