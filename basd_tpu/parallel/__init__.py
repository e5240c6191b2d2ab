from basd_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    replicated,
    shard_batch,
)
