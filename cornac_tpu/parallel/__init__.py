from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    init_distributed,
    make_mesh,
    shard_batch,
    shard_replicated,
    shard_rows,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "init_distributed",
    "make_mesh",
    "shard_batch",
    "shard_replicated",
    "shard_rows",
]
