from danerf_tpu.parallel.mesh import (
    make_mesh,
    param_pspecs,
    replicate_pool,
    shard_train_state,
    make_sharded_train_step,
    initialize_distributed,
    process_slice,
)

__all__ = [
    "make_mesh",
    "param_pspecs",
    "replicate_pool",
    "shard_train_state",
    "make_sharded_train_step",
    "initialize_distributed",
    "process_slice",
]
