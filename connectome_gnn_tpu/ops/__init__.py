"""Compute ops: segment reductions, SpMM, GCN normalization.

Two interchangeable implementations of the aggregation kernels exist:

* the XLA path (:mod:`segment`) — ``jax.ops.segment_sum`` based, the
  correctness oracle, used by default;
* the Pallas path (:mod:`spmm_pallas`) — hand-written TPU kernels over the
  CSR layout produced by the batch collator.
"""

from connectome_gnn_tpu.ops.banded import (
    BandedMatrix,
    banded_spmm,
    gcn_normalize_banded,
    to_banded,
)
from connectome_gnn_tpu.ops.gcn_norm import GCNNorm, gcn_normalize
from connectome_gnn_tpu.ops.segment import (
    coo_spmm,
    graph_mean_pool,
    segment_mean,
    segment_sum,
)

__all__ = [
    "BandedMatrix",
    "GCNNorm",
    "banded_spmm",
    "coo_spmm",
    "gcn_normalize",
    "gcn_normalize_banded",
    "graph_mean_pool",
    "segment_mean",
    "segment_sum",
    "to_banded",
]
