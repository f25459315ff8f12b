from .distributed import (
    host_mesh,
    init_distributed,
    is_host0,
    reduce_scalars_across_hosts,
    sync_hosts,
)
from .mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_eval_forward,
    shard_eval_forward_shard_map,
    shard_eval_forward_space,
    shard_train_step,
    shard_train_step_shard_map,
)

__all__ = [
    "host_mesh",
    "init_distributed",
    "is_host0",
    "make_mesh",
    "reduce_scalars_across_hosts",
    "replicate",
    "shard_batch",
    "shard_eval_forward",
    "shard_eval_forward_shard_map",
    "shard_eval_forward_space",
    "shard_train_step",
    "shard_train_step_shard_map",
    "sync_hosts",
]
