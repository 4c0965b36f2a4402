from ospo_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    shard_batch,
    shard_janus_params,
    shard_lora_params,
)
