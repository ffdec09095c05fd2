from maskcyclegan_vc_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_sharded_train_step,
    make_shardmap_train_step,
    replicate,
    replicated_sharding,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "make_sharded_train_step",
    "make_shardmap_train_step",
    "replicate",
    "replicated_sharding",
]
