"""Multi-device scaling: mesh construction and sharded batched solves."""

from .mesh import (
    batched_solve,
    init_distributed,
    make_global_batch,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = [
    "batched_solve",
    "init_distributed",
    "make_global_batch",
    "make_mesh",
    "replicate",
    "shard_batch",
]
