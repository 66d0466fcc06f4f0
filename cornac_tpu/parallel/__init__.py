from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    init_distributed,
    make_mesh,
    pad_rows_to_multiple,
    replicate_all,
    shard_batch,
    shard_replicated,
    shard_rows,
    shard_tables,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "init_distributed",
    "make_mesh",
    "pad_rows_to_multiple",
    "replicate_all",
    "shard_batch",
    "shard_replicated",
    "shard_rows",
    "shard_tables",
]
