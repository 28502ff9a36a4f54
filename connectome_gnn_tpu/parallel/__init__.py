"""Parallelism layer: meshes, data-parallel shard_map steps, edge partitioning."""

from connectome_gnn_tpu.parallel.data_parallel import (
    make_dp_eval_step,
    make_dp_train_step,
    shard_batch,
    stack_batches,
)
from connectome_gnn_tpu.parallel.mesh import create_mesh

__all__ = [
    "create_mesh",
    "make_dp_eval_step",
    "make_dp_train_step",
    "shard_batch",
    "stack_batches",
]
