"""Parallelism layer: meshes, data-parallel shard_map steps, edge
partitioning, and the multi-process (multi-host) execution layer."""

from connectome_gnn_tpu.parallel.distributed import (
    assemble_global,
    initialize_distributed,
    local_shard_range,
    process_count,
    process_index,
)
from connectome_gnn_tpu.parallel.data_parallel import (
    make_dp_eval_step,
    make_dp_train_step,
    shard_batch,
    stack_batches,
)
from connectome_gnn_tpu.parallel.banded_partition import (
    PartitionedBanded,
    ShardedBandedGCN,
    ShardedBandedSAGE,
    halo_exchange,
    make_banded_train_step_2d,
    make_sharded_banded_train_step,
    partition_banded,
    partition_banded_from_coo,
    stack_partitioned,
)
from connectome_gnn_tpu.parallel.hybrid_partition import (
    PartitionedHybrid,
    hybrid_remainder_capacities,
    partition_hybrid,
    partition_hybrid_cohort,
    partition_hybrid_from_coo,
)
from connectome_gnn_tpu.parallel.edge_partition import (
    EdgePartitionedGCN,
    EdgePartitionedSAGE,
    PartitionedGraph,
    make_partitioned_train_step,
    partition_graph,
    partitioned_gcn_layer,
    partitioned_sage_layer,
)
from connectome_gnn_tpu.parallel.mesh import create_mesh
from connectome_gnn_tpu.parallel.sampled_dp import (
    make_device_sampled_dp_epoch_runner,
    make_device_sampled_dp_eval_step,
    make_device_sampled_dp_step,
    replicate_csr,
)
from connectome_gnn_tpu.parallel.sharded_sampling import (
    CompactionConfig,
    GraphShardedSampledModel,
    ShardedGraphCSR,
    graph_sharded_sage,
    make_graph_sharded_eval_step,
    make_graph_sharded_sampled_forward,
    make_graph_sharded_train_step,
    shard_csr,
    sharded_device_sample,
    sharded_device_sample_with_stats,
    sharded_sampling_comm_model,
)
from connectome_gnn_tpu.parallel.comm_accounting import count_collective_bytes

__all__ = [
    "assemble_global",
    "initialize_distributed",
    "local_shard_range",
    "process_count",
    "process_index",
    "EdgePartitionedGCN",
    "EdgePartitionedSAGE",
    "PartitionedBanded",
    "PartitionedHybrid",
    "ShardedBandedGCN",
    "ShardedBandedSAGE",
    "halo_exchange",
    "partition_banded",
    "partition_banded_from_coo",
    "partition_hybrid_from_coo",
    "hybrid_remainder_capacities",
    "partition_hybrid",
    "partition_hybrid_cohort",
    "PartitionedGraph",
    "create_mesh",
    "make_device_sampled_dp_epoch_runner",
    "make_device_sampled_dp_eval_step",
    "make_device_sampled_dp_step",
    "make_dp_eval_step",
    "make_dp_train_step",
    "replicate_csr",
    "CompactionConfig",
    "GraphShardedSampledModel",
    "ShardedGraphCSR",
    "count_collective_bytes",
    "graph_sharded_sage",
    "sharded_device_sample_with_stats",
    "make_graph_sharded_eval_step",
    "make_graph_sharded_sampled_forward",
    "make_graph_sharded_train_step",
    "shard_csr",
    "sharded_device_sample",
    "sharded_sampling_comm_model",
    "make_partitioned_train_step",
    "make_banded_train_step_2d",
    "make_sharded_banded_train_step",
    "stack_partitioned",
    "partition_graph",
    "partitioned_gcn_layer",
    "partitioned_sage_layer",
    "shard_batch",
    "stack_batches",
]
