from yololp_tpu.parallel.mesh import (
    data_mesh,
    data_spatial_mesh,
    image_sharding,
    data_sharding,
    initialize_distributed,
    is_main_process,
    replicated,
    shard_dataset_indices,
)
