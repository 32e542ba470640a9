from ducosy_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_mesh,
    replicate,
    replicated,
    shard_batch,
)
