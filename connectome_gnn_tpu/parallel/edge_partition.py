"""Edge-partitioned giant-graph mode: one big graph sharded across devices.

The batched small-graph path scales by data parallelism; a single giant
connectome (voxel-level, ~10⁶ nodes / ~10⁷ edges) instead scales by
**partitioning the graph itself** — the GNN counterpart of sequence
parallelism (SURVEY §5).  Layout:

* **Nodes are sharded contiguously**: the node id space is padded to
  ``D · P_local`` and device ``d`` owns rows ``[d·P_local, (d+1)·P_local)``
  of the feature matrix.
* **Edges are partitioned by receiver block**: device ``d`` owns every edge
  whose receiver lives in its node block, stored with *global* sender ids
  and *local* receiver ids, receiver-sorted (CSR within the shard).
  Aggregation is therefore entirely local once sender features are visible.
* **Boundary exchange**: sender features are made visible with an
  ``all_gather`` over the mesh axis (transform-then-gather: the dense
  ``xW`` runs on local rows, then the [P_total, H] activations are
  gathered).  All-gather rides ICI as XLA's collective; a
  halo/``ppermute`` exchange that moves only boundary nodes is the planned
  refinement for higher scale.
* **Degrees are exact**: per-shard partial sender-degrees are psummed, so
  normalization matches the unpartitioned computation for arbitrary
  (even asymmetric) edge sets.

``EdgePartitionedGCN`` is the node-level model for this mode (L GCN
convolutions + BatchNorm/ReLU + per-node linear head — no pooling), the
framework's node-classification family.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from connectome_gnn_tpu.data.batch import round_up
from connectome_gnn_tpu.data.graph import ConnectomeGraph
from connectome_gnn_tpu.models.node_gcn import init_node_gcn_params
from connectome_gnn_tpu.parallel.shard_forward import (
    ShardMapForwardMixin,
    apply_global_update,
)
from connectome_gnn_tpu.nn.layers import batch_norm_apply, dense_apply, dropout
from connectome_gnn_tpu.utils.pytree import pytree_dataclass, static_field

EPS = 1e-8


@pytree_dataclass
class PartitionedGraph:
    """A single giant graph, node/edge-partitioned over ``D`` shards.

    All leaves carry the leading shard axis ``D`` (sharded with
    ``P(axis)`` under ``shard_map``).

    Attributes
    ----------
    node_features : float32 [D, P_local, F]
    senders : int32 [D, E_local]       global sender ids
    receivers : int32 [D, E_local]     local receiver ids (within shard)
    edge_weight : float32 [D, E_local] 0 for padding
    node_mask : bool [D, P_local]
    labels : int32 [D, P_local]        per-node labels (0 where unlabeled)
    label_mask : bool [D, P_local]
    num_shards : int (static)
    """

    node_features: jnp.ndarray
    senders: jnp.ndarray
    receivers: jnp.ndarray
    edge_weight: jnp.ndarray
    node_mask: jnp.ndarray
    labels: jnp.ndarray
    label_mask: jnp.ndarray
    num_shards: int = static_field(default=1)

    @property
    def nodes_per_shard(self) -> int:
        return int(self.node_features.shape[1])

    @property
    def total_nodes(self) -> int:
        return self.num_shards * self.nodes_per_shard


def partition_graph(
    graph: ConnectomeGraph,
    num_shards: int,
    *,
    node_labels: Optional[np.ndarray] = None,
    node_multiple: int = 8,
    edge_multiple: int = 128,
    shard_range: Optional[tuple[int, int]] = None,
) -> PartitionedGraph:
    """Partition one graph into a :class:`PartitionedGraph` (host side).

    Nodes are split into ``num_shards`` contiguous blocks (pad the id space
    first); edges go to the shard owning their receiver.  ``node_labels``
    enables node-level supervision.

    ``shard_range=(lo, hi)`` materializes only shards ``[lo, hi)`` (the
    multi-process path: each process builds its own slice, to be lifted
    into a global array by
    :func:`~connectome_gnn_tpu.parallel.distributed.assemble_global`; the
    static paddings stay GLOBAL so all processes produce one shape).
    """
    n = graph.num_nodes
    p_local = round_up(-(-n // num_shards), node_multiple)
    total = num_shards * p_local
    lo, hi = shard_range if shard_range is not None else (0, num_shards)
    if not 0 <= lo < hi <= num_shards:
        raise ValueError(f"bad shard_range {(lo, hi)} for D={num_shards}")
    d_here = hi - lo

    src = graph.edge_index[0].astype(np.int64)
    dst = graph.edge_index[1].astype(np.int64)
    w = graph.edge_weight
    owner = dst // p_local

    counts = np.bincount(owner, minlength=num_shards)
    e_local = round_up(int(counts.max()) if counts.size else 1, edge_multiple)

    F = graph.num_features
    x = np.zeros((d_here, p_local, F), np.float32)
    senders = np.zeros((d_here, e_local), np.int32)
    receivers = np.zeros((d_here, e_local), np.int32)
    weights = np.zeros((d_here, e_local), np.float32)
    node_mask = np.zeros((d_here, p_local), bool)
    labels = np.zeros((d_here, p_local), np.int32)
    label_mask = np.zeros((d_here, p_local), bool)

    def slab(flat):
        """Rows ``[lo*p_local, hi*p_local)`` of a conceptual [total, ...]
        array, zero-padded past ``n`` — built without materializing the
        full id space."""
        a, b = lo * p_local, hi * p_local
        out = np.zeros((b - a,) + flat.shape[1:], flat.dtype)
        if a < n:
            out[: min(b, n) - a] = flat[a : min(b, n)]
        return out.reshape((d_here, p_local) + flat.shape[1:])

    x[:] = slab(np.asarray(graph.node_features, np.float32))
    node_mask[:] = slab(np.ones(n, bool))
    if node_labels is not None:
        labels[:] = slab(np.asarray(node_labels, np.int32))
        label_mask[:] = node_mask

    for d in range(lo, hi):
        sel = owner == d
        e = int(sel.sum())
        # receiver-sorted within the shard (stable → deterministic)
        order = np.argsort(dst[sel], kind="stable")
        senders[d - lo, :e] = src[sel][order]
        receivers[d - lo, :e] = (dst[sel][order] - d * p_local).astype(np.int32)
        weights[d - lo, :e] = w[sel][order]

    return PartitionedGraph(
        node_features=jnp.asarray(x),
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        edge_weight=jnp.asarray(weights),
        node_mask=jnp.asarray(node_mask),
        labels=jnp.asarray(labels),
        label_mask=jnp.asarray(label_mask),
        num_shards=num_shards,
    )


def partitioned_gcn_layer(
    params: dict,
    x_local: jnp.ndarray,     # [P_local, F]
    senders: jnp.ndarray,     # [E_local] global ids
    receivers: jnp.ndarray,   # [E_local] local ids
    edge_weight: jnp.ndarray, # [E_local]
    axis_name: str,
) -> jnp.ndarray:
    """One GCN convolution over the partitioned layout (inside shard_map).

    Same numerics as :func:`gcn_layer_apply`: sender-degree symmetric
    normalization with self-loop weight 1.0 and the reference epsilons.
    """
    p_local = x_local.shape[0]
    d = jax.lax.axis_index(axis_name)
    num_shards = jax.lax.axis_size(axis_name)
    total = p_local * num_shards

    # Exact sender degrees: partial scatter into the full id space, psummed.
    deg_partial = jax.ops.segment_sum(edge_weight, senders, num_segments=total)
    deg = jax.lax.psum(deg_partial, axis_name) + 1.0  # + self-loop
    dinv = jax.lax.rsqrt(deg + EPS)  # [total], replicated
    dinv_local = jax.lax.dynamic_slice_in_dim(dinv, d * p_local, p_local)

    # Transform locally, then gather the activations (boundary exchange).
    xw_local = jnp.dot(x_local, params["kernel"], preferred_element_type=jnp.float32)
    xw_full = jax.lax.all_gather(xw_local, axis_name, tiled=True)  # [total, H]

    w_norm = dinv[senders] * edge_weight * dinv_local[receivers]
    msg = xw_full[senders] * w_norm[:, None]
    out = jax.ops.segment_sum(
        msg, receivers, num_segments=p_local, indices_are_sorted=True
    )
    out = out + (dinv_local * dinv_local)[:, None] * xw_local
    return out + params["bias"]


class EdgePartitionedGCN(ShardMapForwardMixin):
    """Node-level GCN over an edge-partitioned giant graph.

    Architecture: L partitioned GCN convolutions, each followed by
    cross-shard-synchronized BatchNorm, ReLU and dropout, then a per-node
    linear head → ``[P_local, num_classes]`` logits per shard.
    """

    def __init__(
        self,
        in_channels: int,
        hidden_dim: int = 64,
        num_classes: int = 2,
        num_layers: int = 3,
        dropout: float = 0.0,
    ):
        self.in_channels = int(in_channels)
        self.hidden_dim = int(hidden_dim)
        self.num_classes = int(num_classes)
        self.num_layers = int(num_layers)
        self.dropout = float(dropout)

    def init(self, key: jax.Array) -> tuple[dict, dict]:
        return init_node_gcn_params(
            key, self.in_channels, self.hidden_dim, self.num_classes,
            self.num_layers,
        )

    def apply_shard(
        self,
        params: dict,
        state: dict,
        pgraph_shard: PartitionedGraph,
        *,
        axis_name: str,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> tuple[jnp.ndarray, dict]:
        """Forward for one shard — must run inside ``shard_map``.

        ``pgraph_shard`` is the local view (leading shard axis dropped).
        Returns per-node logits ``[P_local, C]`` and updated BN state.
        """
        x = pgraph_shard.node_features
        new_norms = []
        if train and rng is not None:
            # decorrelate dropout masks across shards
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
            drop_keys = jax.random.split(rng, self.num_layers)
        else:
            drop_keys = [None] * self.num_layers
        for i in range(self.num_layers):
            x = partitioned_gcn_layer(
                params["convs"][i],
                x,
                pgraph_shard.senders,
                pgraph_shard.receivers,
                pgraph_shard.edge_weight,
                axis_name,
            )
            x, bn_state = batch_norm_apply(
                params["norms"][i],
                state["norms"][i],
                x,
                pgraph_shard.node_mask,
                train=train,
                axis_name=axis_name,
            )
            new_norms.append(bn_state)
            x = jax.nn.relu(x)
            x = dropout(drop_keys[i], x, self.dropout, train=train)
        logits = dense_apply(params["head"], x)
        return logits, {"norms": new_norms}


def make_partitioned_train_step(
    model: EdgePartitionedGCN,
    optimizer,
    mesh: Mesh,
    axis_name: str = "edge",
):
    """Jitted node-classification train step over a partitioned graph.

    Signature: ``(params, state, opt_state, step_key, pgraph) ->
    (params, state, opt_state, loss, n_real)``.  The loss is the masked
    mean cross-entropy over labeled nodes across ALL shards; gradients
    follow the same exactness rules as the data-parallel step (shard_map's
    vma autodiff delivers cotangents of replicated params already psummed —
    only the global-count normalization is applied here).
    """
    import optax

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis_name)),
        out_specs=(P(), P(), P(), P(), P()),
    )
    def _step(params, state, opt_state, step_key, stacked):
        shard = jax.tree_util.tree_map(lambda a: a[0], stacked)

        def loss_sum_fn(p):
            logits, new_state = model.apply_shard(
                p, state, shard, axis_name=axis_name, train=True, rng=step_key
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, shard.labels
            )
            mask = shard.label_mask.astype(jnp.float32)
            return jnp.sum(ce * mask), (new_state, jnp.sum(mask))

        (local_sum, (new_state, local_n)), grads = jax.value_and_grad(
            loss_sum_fn, has_aux=True
        )(params)
        new_params, new_opt_state, loss, n = apply_global_update(
            optimizer, axis_name, params, opt_state, local_sum, local_n, grads
        )
        return new_params, new_state, new_opt_state, loss, n

    return jax.jit(_step)
