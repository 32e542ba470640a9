from ducosy_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_mesh,
    data_sp_mesh,
    global_shard_batch,
    init_distributed,
    mesh_process_count,
    process_row_slice,
    replicate,
    replicated,
    shard_batch,
)
