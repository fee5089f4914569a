from tpuwsi.parallel.sharding import (
    replicate_params,
    shard_params,
    sync_batch_stats,
    tensor_parallel_rules,
)

__all__ = [
    "replicate_params",
    "shard_params",
    "sync_batch_stats",
    "tensor_parallel_rules",
]
