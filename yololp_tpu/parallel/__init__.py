from yololp_tpu.parallel.mesh import (
    data_mesh,
    data_sharding,
    initialize_distributed,
    is_main_process,
    replicated,
    shard_dataset_indices,
)
