from .mesh import (
    create_mesh,
    data_parallel_shardings,
    is_main_process,
    make_parallel_train_step,
    process_count,
    shard_batch,
    sync_global_devices,
    tensor_parallel_shardings,
)

__all__ = [
    "create_mesh",
    "data_parallel_shardings",
    "is_main_process",
    "make_parallel_train_step",
    "process_count",
    "shard_batch",
    "sync_global_devices",
    "tensor_parallel_shardings",
]
