"""Graph-SHARDED device-side sampling: the giant graph's adjacency and
features are node-partitioned across the mesh — no device holds the
whole graph.

`data/device_sampling.py` scales config 5 ("giant connectome with
neighbor sampling") as far as one device's HBM: the CSR replicates per
device (~0.61 GB at 1M/44M) and only seeds shard.  The north-star
sentence is about graphs that CANNOT do that.  This module is the
beyond-replication mode: nodes split into ``D`` contiguous ranges, each
device holding only its range's in-adjacency rows (packed
(sender, weight) pairs) and feature rows, and each hop of the fanout
sample resolves remote rows with mesh collectives:

1. ``all_gather`` of every device's frontier ids (tiny: ``D·Fb·4`` B);
2. each OWNER draws the fanout sample for every request it owns —
   randomness is keyed by ``fold_in(hop_key, requester)`` so the draw
   for a given (requester, slot) is identical no matter which device
   owns the node (this is what makes the scheme a well-defined sampler,
   and what the keep-all oracle exercises);
3. ``all_to_all`` routes each answer block back to its requester, and a
   per-slot owner select keeps exactly the valid block;
4. drawn-sender features resolve the same way (gather-by-owner →
   ``all_to_all`` → select).

Sampling semantics are the MULTISET mode of
:func:`~connectome_gnn_tpu.data.device_sampling.device_sample`
(``dedup=False``): every draw gets its own node slot, locals are
arithmetic, so no global relabel table needs to exist anywhere — the
property that makes graph-sharded sampling collective-friendly.  With
``fanout >= max_in_degree`` every occurrence keeps every in-edge and
eval-mode model outputs must match the single-device sampler exactly
(``tests/test_sharded_sampling.py``).  SAGE-family inners only (the
multiset restriction, see ``device_sampled_sage``).

This exchange ships ``D×`` the minimal payload (owners answer EVERY
request slot, not just owned ones — full-frontier broadcast keeps every
buffer static).  The analytic ICI projection and the compaction lever
(send only owned requests: expected payload drops ``D×``) live in
docs/ARCHITECTURE.md §"Graph-sharded sampling".

Reference counterpart: the single-device ``.to(device)`` residency model
of `/root/reference/connectome_gnn/graph.py:87-94`, generalized to
graphs that cannot fit one device.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from connectome_gnn_tpu.data.graph import ConnectomeGraph
from connectome_gnn_tpu.data.sampled import HopBlock, SampledNodeBatch
from connectome_gnn_tpu.utils.pytree import pytree_dataclass, static_field


@pytree_dataclass
class ShardedGraphCSR:
    """Node-partitioned CSR: leaves carry a leading ``[D]`` shard axis
    (place with ``P(axis_name)`` / iterate per process).  Shard ``d``
    owns global nodes ``[d·P, (d+1)·P)`` (``P = nodes_per_shard``;
    the id space is padded to ``D·P`` — padded nodes have degree 0 and
    zero features).

    ``indptr[d]`` indexes shard-local edge storage; ``sender_weight[d]``
    is the packed (global sender id, bitcast f32 weight) rows of the
    shard's in-edges, padded to the max shard edge count so the pytree
    is rectangular (static shapes).
    """

    indptr: jnp.ndarray  # int32 [D, P+1]
    sender_weight: jnp.ndarray  # int32 [D, E_max, 2]
    node_features: jnp.ndarray  # float32 [D, P, F]
    nodes_per_shard: int = static_field(default=0)
    max_in_degree: int = static_field(default=0)
    num_nodes: int = static_field(default=0)

    @property
    def num_shards(self) -> int:
        return int(self.indptr.shape[0])

    @classmethod
    def partition(
        cls, graph: ConnectomeGraph, num_shards: int
    ) -> "ShardedGraphCSR":
        """Host-side one-time partition (receiver sort per shard)."""
        D = int(num_shards)
        N = graph.num_nodes
        P = -(-N // D)
        F = graph.num_features

        src, dst = graph.edge_index
        order = np.argsort(dst, kind="stable")
        src = src[order].astype(np.int64)
        dst = dst[order].astype(np.int64)
        w = graph.edge_weight[order].astype(np.float32)

        counts = np.bincount(dst, minlength=D * P)
        max_deg = int(counts.max()) if counts.size else 0
        # shard edge ranges (dst sorted → contiguous per shard)
        starts = np.searchsorted(dst, np.arange(D) * P)
        ends = np.searchsorted(dst, (np.arange(D) + 1) * P)
        e_max = int((ends - starts).max()) if D else 0

        indptr = np.zeros((D, P + 1), np.int32)
        sw = np.zeros((D, max(e_max, 1), 2), np.int32)
        feats = np.zeros((D, P, F), np.float32)
        for d in range(D):
            lo, hi = starts[d], ends[d]
            c = counts[d * P : (d + 1) * P]
            np.cumsum(c, out=indptr[d, 1:])
            sw[d, : hi - lo, 0] = src[lo:hi]
            sw[d, : hi - lo, 1] = w[lo:hi].view(np.int32)
            n_here = min(P, N - d * P)
            if n_here > 0:
                feats[d, :n_here] = graph.node_features[
                    d * P : d * P + n_here
                ]
        return cls(
            indptr=jnp.asarray(indptr),
            sender_weight=jnp.asarray(sw),
            node_features=jnp.asarray(feats),
            nodes_per_shard=P,
            max_in_degree=max_deg,
            num_nodes=N,
        )


def _exchange_select(local_answers, owner, axis_name):
    """Route owner-computed answers back to requesters and keep the
    valid block per slot.

    ``local_answers``: ``[D, L, ...]`` — what THIS device computed for
    every (requester, slot).  After ``all_to_all`` the leading axis
    indexes the OWNER that computed each block for THIS device;
    ``owner [L]`` picks the authoritative one per slot.
    """
    exchanged = jax.lax.all_to_all(
        local_answers, axis_name, split_axis=0, concat_axis=0, tiled=False
    )
    idx = owner[None, :, None] if exchanged.ndim == 3 else owner[None, :]
    sel = jnp.take_along_axis(exchanged, idx.astype(jnp.int32), axis=0)
    return sel[0]


def sharded_device_sample(
    g: ShardedGraphCSR,
    seeds: jnp.ndarray,
    key: jax.Array,
    fanout: Sequence[int],
    *,
    axis_name: str = "data",
) -> SampledNodeBatch:
    """Multiset fanout sample with node-partitioned graph state — call
    INSIDE ``shard_map`` (``g`` leaves are the local ``[1, ...]`` shard
    blocks; ``seeds`` are this device's ``[S]`` seed ids, -1 padding).

    Returns this device's :class:`SampledNodeBatch` (multiset layout:
    seeds first, then hop draws in emission order; ``node_ids`` carry
    GLOBAL ids).  Randomness: hop ``h``'s draw for requester ``r`` uses
    ``fold_in(split(key)[h], r)`` — owner-independent, so the sample is
    a well-defined function of (key, shard index) however the graph is
    partitioned.
    """
    indptr = g.indptr[0]
    sw_tab = g.sender_weight[0]
    feats = g.node_features[0]
    P = g.nodes_per_shard
    D = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    lo = me * P
    Emax = int(sw_tab.shape[0])
    fanout = tuple(int(f) for f in fanout)
    max_deg = max(g.max_in_degree, max(fanout) if fanout else 1, 1)
    S = int(seeds.shape[0])

    i32 = jnp.int32
    svalid = seeds >= 0
    frontier = jnp.where(svalid, seeds, -1)
    frontier_start = 0
    offset = S

    all_nodes_parts = [frontier]
    senders_parts, receivers_parts, weight_parts = [], [], []
    hop_blocks: list[HopBlock] = []
    for f in fanout:
        key, sub = jax.random.split(key)
        Fb = int(frontier.shape[0])
        f_eff = min(f, max_deg)

        # 1) broadcast every device's frontier
        frontier_all = jax.lax.all_gather(frontier, axis_name)  # [D, Fb]

        # 2) owner-side draws for EVERY request slot (masked to owned)
        v = frontier_all
        owned = (v >= lo) & (v < lo + P)
        vl = jnp.clip(v - lo, 0, P - 1)
        deg = jnp.where(
            owned, indptr[vl + 1] - indptr[vl], 0
        )  # [D, Fb]
        req_keys = jax.vmap(
            lambda r: jax.random.fold_in(sub, r)
        )(jnp.arange(D, dtype=jnp.uint32))
        u = jax.vmap(
            lambda k: jax.random.uniform(k, (Fb, max_deg))
        )(req_keys)  # [D, Fb, max_deg]
        pos_ok = (
            jnp.arange(max_deg, dtype=i32)[None, None, :] < deg[..., None]
        )
        scores = jnp.where(pos_ok, u, -1.0)
        vals, pos = jax.lax.top_k(scores, f_eff)  # [D, Fb, f]
        evalid_own = (vals >= 0.0) & owned[..., None]
        eid = jnp.clip(indptr[vl][..., None] + pos, 0, Emax - 1)
        rows = sw_tab[eid]  # [D, Fb, f, 2]
        snd_own = jnp.where(evalid_own, rows[..., 0], -1)
        w_own = jnp.where(
            evalid_own,
            jax.lax.bitcast_convert_type(rows[..., 1], jnp.float32),
            0.0,
        )

        # 3) route answers back; keep the authoritative owner per slot
        owner = jnp.clip(jnp.maximum(frontier, 0) // P, 0, D - 1)
        snd = _exchange_select(snd_own, owner, axis_name)  # [Fb, f]
        wv = _exchange_select(w_own, owner, axis_name)

        evalid_flat = (snd >= 0).reshape(-1)
        rloc_rows = frontier_start + jnp.arange(Fb, dtype=i32)
        rloc = jnp.broadcast_to(
            rloc_rows[:, None], (Fb, f_eff)
        ).reshape(-1)
        snd_slots = offset + jnp.arange(Fb * f_eff, dtype=i32)
        snd_final = jnp.where(evalid_flat, snd_slots, rloc)
        all_nodes_parts.append(
            jnp.where(evalid_flat, snd.reshape(-1), -1)
        )
        senders_parts.append(snd_final)
        receivers_parts.append(rloc)
        weight_parts.append(wv.reshape(-1))
        hop_blocks.append(
            HopBlock(
                senders=snd_final.reshape(Fb, f_eff),
                weights=wv,
                recv=rloc_rows,
                sender_start=int(offset),
                recv_start=int(frontier_start),
            )
        )
        frontier = jnp.where(evalid_flat, snd.reshape(-1), -1)
        frontier_start = offset
        offset += Fb * f_eff

    # 4) features for every node slot, resolved by owner exchange
    all_nodes = jnp.concatenate(all_nodes_parts)
    node_mask = all_nodes >= 0
    ids_all = jax.lax.all_gather(all_nodes, axis_name)  # [D, NBud]
    owned = (ids_all >= lo) & (ids_all < lo + P)
    il = jnp.clip(ids_all - lo, 0, P - 1)
    x_own = jnp.where(owned[..., None], feats[il], 0.0)  # [D, NBud, F]
    owner = jnp.clip(jnp.maximum(all_nodes, 0) // P, 0, D - 1)
    x = _exchange_select(x_own, owner, axis_name)
    x = jnp.where(node_mask[:, None], x, 0.0)

    zeros_s = jnp.zeros(S, i32)
    return SampledNodeBatch(
        node_features=x,
        senders=jnp.concatenate(senders_parts)
        if senders_parts
        else jnp.zeros(0, i32),
        receivers=jnp.concatenate(receivers_parts)
        if receivers_parts
        else jnp.zeros(0, i32),
        edge_weight=jnp.concatenate(weight_parts)
        if weight_parts
        else jnp.zeros(0, jnp.float32),
        node_mask=node_mask,
        labels=zeros_s,
        label_mask=zeros_s.astype(bool),
        seed_mask=zeros_s.astype(bool),
        node_ids=all_nodes,
        num_seeds=S,
        hop_blocks=tuple(hop_blocks) if hop_blocks else None,
    )


def make_graph_sharded_sampled_forward(
    inner, mesh, fanout: Sequence[int], axis_name: str = "data"
):
    """Jitted eval forward over the graph-sharded sampler.

    Signature: ``(params, state, g: ShardedGraphCSR, seeds [D, S],
    key_data [D, 2]) -> logits [D, S, C]`` — ``g`` sharded on its
    leading axis, seeds/keys one row per device.  The inner model must
    be SAGE-family (multiset semantics).
    """
    from functools import partial

    from jax.sharding import PartitionSpec as P

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
    )
    def fwd(params, state, g, seeds, key_data):
        batch = sharded_device_sample(
            g, seeds[0], jax.random.wrap_key_data(key_data[0]),
            fanout, axis_name=axis_name,
        )
        logits, _ = inner.apply(params, state, batch, train=False)
        return logits[None]

    return fwd


def make_graph_sharded_train_step(
    inner, optimizer, mesh, fanout: Sequence[int],
    axis_name: str = "data", *, guard: bool = False,
):
    """Jitted train step over the graph-sharded sampler: sync-BN psum,
    globally-masked loss, psummed gradients (exactness rules of
    ``make_dp_train_step``).  Signature: ``(params, state, opt_state,
    step_key, g, seeds [D, S], key_data [D, 2], labels [D, S],
    label_mask [D, S]) -> (params, state, opt_state, loss, n)``.

    ``guard=True`` appends ``make_dp_train_step``'s
    non-finite-rejection semantics (trailing ``ok`` output; rejected
    steps keep old params/state/opt bitwise on every replica).
    """
    import dataclasses
    from functools import partial

    import optax
    from jax.sharding import PartitionSpec as P

    from connectome_gnn_tpu.parallel.shard_forward import apply_global_update

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(), P(), P(), P(), P()) + ((P(),) if guard else ()),
    )
    def step(params, state, opt_state, step_key, g, seeds, key_data,
             labels, label_mask):
        batch = sharded_device_sample(
            g, seeds[0], jax.random.wrap_key_data(key_data[0]),
            fanout, axis_name=axis_name,
        )
        batch = dataclasses.replace(
            batch, labels=labels[0], label_mask=label_mask[0]
        )
        rng = jax.random.fold_in(step_key, jax.lax.axis_index(axis_name))

        def loss_sum_fn(p):
            logits, new_state = inner.apply(
                p, state, batch, train=True, rng=rng, axis_name=axis_name
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch.labels
            )
            m = batch.label_mask.astype(jnp.float32)
            return jnp.sum(ce * m), (new_state, jnp.sum(m))

        (local_sum, (new_state, local_n)), grads = jax.value_and_grad(
            loss_sum_fn, has_aux=True
        )(params)
        new_params, new_opt_state, loss, n = apply_global_update(
            optimizer, axis_name, params, opt_state, local_sum, local_n,
            grads,
        )
        if not guard:
            return new_params, new_state, new_opt_state, loss, n

        from connectome_gnn_tpu.train import fault

        ok = fault.all_finite(loss, grads, new_state)
        trees, loss, n, ok_f = fault.guard_step_outputs(
            ok,
            (new_params, new_state, new_opt_state),
            (params, state, opt_state),
            loss, n,
        )
        return (*trees, loss, n, ok_f)

    return step


def sharded_sampling_comm_model(
    *, D: int, S: int, fanout: Sequence[int], F: int, max_deg: int
) -> dict:
    """Analytic per-device per-step collective payload (bytes) of the
    full-frontier-broadcast exchange, for the docs projection.

    Frontier sizes under multiset sampling: ``Fb_0 = S``,
    ``Fb_{h+1} = Fb_h · fanout[h]``.  Per hop: frontier all_gather
    ``(D-1)·Fb·4``, answer all_to_all ``(D-1)·Fb·f·8`` out AND in; final
    feature exchange ``(D-1)·NBud·4`` ids + ``(D-1)·NBud·F·4`` rows each
    way, ``NBud = S·(1+Σ prod fanout)``-ish.  The compaction lever
    (request only owned slots) divides the answer/feature payloads by
    ``~D`` in expectation — recorded here as ``compacted_*``.
    """
    fanout = tuple(int(f) for f in fanout)
    hop_bytes = 0
    Fb = S
    nbud = S
    for f in fanout:
        hop_bytes += (D - 1) * Fb * 4  # frontier all_gather
        hop_bytes += 2 * (D - 1) * Fb * f * 8  # answers out + in
        Fb *= f
        nbud += Fb
    feat_bytes = (D - 1) * nbud * 4 + 2 * (D - 1) * nbud * F * 4
    total = hop_bytes + feat_bytes
    return {
        "per_device_bytes_per_step": int(total),
        "hop_exchange_bytes": int(hop_bytes),
        "feature_exchange_bytes": int(feat_bytes),
        "node_budget": int(nbud),
        "compacted_per_device_bytes_per_step": int(
            hop_bytes / max(D - 1, 1) + feat_bytes / max(D - 1, 1)
        ),
    }


def shard_csr(
    g: ShardedGraphCSR, mesh, axis_name: str = "data"
) -> ShardedGraphCSR:
    """Place a :class:`ShardedGraphCSR`'s ``[D, ...]`` leaves with shard
    ``d`` on mesh position ``d`` (one-time cost, like
    :func:`~connectome_gnn_tpu.parallel.sampled_dp.replicate_csr` but
    sharded, not replicated).  Uses ``make_array_from_callback`` so each
    process materializes only its addressable rows in multi-process runs
    (the host-side partition is cheap numpy; the device transfer is the
    cost that matters and it is per-shard)."""
    from jax.sharding import NamedSharding, PartitionSpec

    def put(x):
        sh = NamedSharding(
            mesh, PartitionSpec(axis_name, *([None] * (x.ndim - 1)))
        )
        if getattr(x, "sharding", None) == sh:
            return x
        xn = np.asarray(x)
        return jax.make_array_from_callback(
            xn.shape, sh, lambda idx: xn[idx]
        )

    return jax.tree_util.tree_map(put, g)


def make_graph_sharded_eval_step(
    inner, mesh, fanout: Sequence[int], axis_name: str = "data"
):
    """Jitted graph-sharded eval step returning global ``(loss_sum,
    correct, n_real)`` — the :meth:`Trainer.evaluate` contract, psummed
    across shards.  Signature: ``(params, state, g, seeds [D, S],
    key_data [D, 2], labels [D, S], label_mask [D, S])``."""
    import dataclasses
    from functools import partial

    import optax
    from jax.sharding import PartitionSpec as P

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name)),
        out_specs=(P(), P(), P()),
    )
    def ev(params, state, g, seeds, key_data, labels, label_mask):
        batch = sharded_device_sample(
            g, seeds[0], jax.random.wrap_key_data(key_data[0]),
            fanout, axis_name=axis_name,
        )
        batch = dataclasses.replace(
            batch, labels=labels[0], label_mask=label_mask[0]
        )
        logits, _ = inner.apply(params, state, batch, train=False)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch.labels
        )
        m = batch.label_mask.astype(jnp.float32)
        correct = jnp.sum(
            (jnp.argmax(logits, axis=1) == batch.labels).astype(jnp.int32)
            * batch.label_mask
        )
        return (
            jax.lax.psum(jnp.sum(ce * m), axis_name),
            jax.lax.psum(correct, axis_name),
            jax.lax.psum(jnp.sum(m), axis_name),
        )

    return ev


class GraphShardedSampledModel:
    """Product-API wrapper for beyond-replication training: the
    :class:`~connectome_gnn_tpu.train.Trainer` in mesh mode drives
    graph-sharded sampled training/eval exactly like the replicated
    device-sampled path — same sharded :class:`~connectome_gnn_tpu.data.
    device_sampling.DeviceSeedLoader`, same fit/evaluate surface — but
    no device ever holds the whole graph.

    SAGE-family inners only (the sharded sampler is the multiset mode;
    see module docstring).  Build via :func:`graph_sharded_sage`.
    """

    def __init__(self, csr: ShardedGraphCSR, inner, fanout: Sequence[int]):
        from connectome_gnn_tpu.models.node_coo import NodeGCN

        if isinstance(inner, NodeGCN):
            raise ValueError(
                "graph-sharded sampling is multiset-mode: SAGE-family "
                "inners only (GCN sender-degree normalization changes "
                "meaning under duplicated sender slots)"
            )
        self.csr = csr
        self.inner = inner
        self.fanout = tuple(int(f) for f in fanout)

    def init(self, key):
        return self.inner.init(key)

    def make_loader(self, seed_pool, node_labels=None, **kw):
        """A sharded :class:`DeviceSeedLoader` (``num_shards`` defaults
        to the partition's shard count; batches carry NO DeviceGraphCSR
        — the graph rides as the sharded step's explicit argument)."""
        from connectome_gnn_tpu.data.device_sampling import DeviceSeedLoader

        kw.setdefault("num_shards", self.csr.num_shards)
        return DeviceSeedLoader(seed_pool, node_labels, **kw)


def graph_sharded_sage(
    graph: ConnectomeGraph,
    num_shards: int,
    *,
    hidden_dim: int = 64,
    num_classes: int = 2,
    num_layers: int = 2,
    fanout: Sequence[int] = (10, 10),
) -> GraphShardedSampledModel:
    """Partition ``graph`` into ``num_shards`` node ranges and wrap a
    :class:`~connectome_gnn_tpu.models.node_coo.BlockedNodeSAGE` for
    Trainer-driven graph-sharded sampled training."""
    from connectome_gnn_tpu.models.node_coo import BlockedNodeSAGE

    csr = ShardedGraphCSR.partition(graph, num_shards)
    inner = BlockedNodeSAGE(
        in_channels=graph.num_features,
        hidden_dim=hidden_dim,
        num_classes=num_classes,
        num_layers=num_layers,
    )
    return GraphShardedSampledModel(csr, inner, fanout)
