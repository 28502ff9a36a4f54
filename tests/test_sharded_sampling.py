"""Graph-sharded device sampling (`parallel/sharded_sampling.py`).

Oracles:
* partition invariants — per-shard CSRs tile the global adjacency
  exactly (edge multiset, degrees, features);
* keep-all equivalence — with ``fanout >= max_in_degree`` the sharded
  sampler's eval-mode model outputs must match the single-device
  multiset sampler exactly up to reduction order (both keep EVERY
  in-edge per occurrence, so their sampling trees are the same
  unordered tree);
* structural — fanout bounds, weight-0 padding, global node ids valid;
* end-to-end — the graph-sharded train step learns the one-hop task on
  a virtual 4-device mesh.

Scales /root/reference/connectome_gnn/graph.py:87-94's single-device
residency model past one device's HBM (BASELINE configs[4]).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from connectome_gnn_tpu.data import (
    device_sample,
    DeviceGraphCSR,
    generate_spatial_graph,
)
from connectome_gnn_tpu.models.node_coo import BlockedNodeSAGE, NodeSAGE
from connectome_gnn_tpu.parallel import (
    ShardedGraphCSR,
    create_mesh,
    make_graph_sharded_sampled_forward,
    make_graph_sharded_train_step,
    sharded_sampling_comm_model,
)


def _graph(n=256, degree=5, band=24, seed=0, shortcut_frac=0.2):
    return generate_spatial_graph(
        n, degree=degree, band=band, seed=seed, shortcut_frac=shortcut_frac
    )


class TestPartition:
    def test_shards_tile_the_global_adjacency(self):
        g = _graph()
        sg = ShardedGraphCSR.partition(g, 4)
        assert sg.num_shards == 4
        P = sg.nodes_per_shard

        src, dst = g.edge_index
        want = sorted(
            (int(s), int(d), round(float(w), 6))
            for s, d, w in zip(src, dst, g.edge_weight)
        )
        got = []
        indptr = np.asarray(sg.indptr)
        sw = np.asarray(sg.sender_weight)
        for d in range(4):
            for v_loc in range(P):
                v = d * P + v_loc
                for e in range(indptr[d, v_loc], indptr[d, v_loc + 1]):
                    got.append(
                        (int(sw[d, e, 0]), v,
                         round(float(sw[d, e, 1].view(np.float32)), 6))
                    )
        assert sorted(got) == want

        feats = np.asarray(sg.node_features).reshape(4 * P, -1)
        np.testing.assert_array_equal(
            feats[: g.num_nodes], g.node_features
        )
        assert np.all(feats[g.num_nodes :] == 0)

    def test_max_degree_matches_dense(self):
        g = _graph(seed=3)
        sg = ShardedGraphCSR.partition(g, 8)
        deg = np.bincount(g.edge_index[1], minlength=g.num_nodes)
        assert sg.max_in_degree == int(deg.max())


class TestKeepAllOracle:
    def test_matches_single_device_multiset(self, cpu_devices):
        """Eval logits per seed: sharded sampler over 4 devices ==
        single-device multiset sampler (keep-all fanout ⇒ identical
        unordered sampling trees)."""
        g = _graph()
        csr = DeviceGraphCSR.from_graph(g)
        F = csr.max_in_degree
        mesh = create_mesh(devices=cpu_devices[:4])
        sg = ShardedGraphCSR.partition(g, 4)

        model = BlockedNodeSAGE(in_channels=5, hidden_dim=16, num_layers=2)
        params, state = model.init(jax.random.PRNGKey(1))

        seeds = np.array(
            [[3, 17], [70, 140], [150, 200], [33, 255]], np.int32
        )
        keys = np.stack([
            np.asarray(jax.random.key_data(jax.random.PRNGKey(100 + r)))
            for r in range(4)
        ])
        fwd = make_graph_sharded_sampled_forward(model, mesh, (F, F))
        logits_sharded = np.asarray(
            fwd(params, state, sg, jnp.asarray(seeds), jnp.asarray(keys))
        )

        for r in range(4):
            single = device_sample(
                csr, jnp.asarray(seeds[r]), jax.random.PRNGKey(50 + r),
                (F, F), dedup=False,
            )
            want, _ = model.apply(params, state, single, train=False)
            np.testing.assert_allclose(
                logits_sharded[r], np.asarray(want), rtol=1e-4, atol=1e-5
            )

    def test_fanout_limited_structure(self, cpu_devices):
        """Fanout-limited draws: weight-0 padding is self-edges, real
        senders are valid global ids whose edges exist in the graph."""
        g = _graph(n=256, degree=8)
        mesh = create_mesh(devices=cpu_devices[:4])
        sg = ShardedGraphCSR.partition(g, 4)
        model = NodeSAGE(in_channels=5, hidden_dim=8, num_layers=2)
        params, state = model.init(jax.random.PRNGKey(0))

        from functools import partial

        from jax.sharding import PartitionSpec as P

        from connectome_gnn_tpu.parallel.sharded_sampling import (
            sharded_device_sample,
        )

        @jax.jit
        @partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P("data"), P("data"), P("data")),
            out_specs=P("data"),
        )
        def sample(gs, seeds, key_data):
            b = sharded_device_sample(
                gs, seeds[0], jax.random.wrap_key_data(key_data[0]), (3, 3)
            )
            return jax.tree_util.tree_map(lambda a: a[None], (
                b.node_ids, b.senders, b.receivers, b.edge_weight,
            ))

        seeds = np.arange(8, dtype=np.int32).reshape(4, 2) * 30
        keys = np.stack([
            np.asarray(jax.random.key_data(jax.random.PRNGKey(r)))
            for r in range(4)
        ])
        ids, snd, rcv, w = map(
            np.asarray, sample(sg, jnp.asarray(seeds), jnp.asarray(keys))
        )
        gs_, gd_ = g.edge_index
        eset = set(zip(gs_.tolist(), gd_.tolist()))
        for r in range(4):
            pad = w[r] == 0
            assert (snd[r][pad] == rcv[r][pad]).all()
            real = ~pad
            a = ids[r][snd[r][real]]
            b = ids[r][rcv[r][real]]
            assert ((a >= 0) & (a < g.num_nodes)).all()
            for aa, bb in zip(a.tolist(), b.tolist()):
                assert (aa, bb) in eset
            # fanout bound per receiver occurrence per hop
            hop0 = rcv[r][:6][real[:6]]
            assert np.bincount(hop0, minlength=2).max() <= 3

    def test_comm_model_shapes(self):
        m = sharded_sampling_comm_model(
            D=8, S=1024, fanout=(10, 10), F=64, max_deg=40
        )
        assert m["node_budget"] == 1024 * (1 + 10 + 100)
        assert m["per_device_bytes_per_step"] > m[
            "compacted_per_device_bytes_per_step"
        ]


@pytest.mark.slow
class TestTraining:
    def test_graph_sharded_step_learns_one_hop_task(self, cpu_devices):
        import optax

        g = _graph(n=512, degree=8, band=32)
        src, dst = g.edge_index
        num = np.zeros(g.num_nodes)
        den = np.zeros(g.num_nodes)
        np.add.at(num, dst, g.edge_weight * g.node_features[src, 0])
        np.add.at(den, dst, g.edge_weight)
        agg = num / (den + 1e-8)
        labels = (agg > np.median(agg)).astype(np.int32)

        mesh = create_mesh(devices=cpu_devices[:4])
        sg = ShardedGraphCSR.partition(g, 4)
        model = BlockedNodeSAGE(in_channels=5, hidden_dim=32, num_layers=2)
        params, state = model.init(jax.random.PRNGKey(0))
        opt = optax.adam(3e-3)
        opt_state = opt.init(params)
        step = make_graph_sharded_train_step(model, opt, mesh, (8, 8))

        rng = np.random.default_rng(0)
        S = 32  # seeds per device
        losses = []
        for i in range(30):
            seeds = rng.permutation(g.num_nodes)[: 4 * S].reshape(4, S)
            keys = np.stack([
                np.asarray(jax.random.key_data(
                    jax.random.PRNGKey(1000 * i + r)
                ))
                for r in range(4)
            ])
            lab = labels[seeds]
            mask = np.ones_like(lab, bool)
            params, state, opt_state, loss, n = step(
                params, state, opt_state, jax.random.PRNGKey(i),
                sg, jnp.asarray(seeds.astype(np.int32)),
                jnp.asarray(keys), jnp.asarray(lab), jnp.asarray(mask),
            )
            losses.append(float(loss))
            assert float(n) == 4 * S
        assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.05


@pytest.mark.slow
class TestTrainerGraphSharded:
    """Product-API reachability: Trainer(mesh=...) drives graph-sharded
    sampled training/eval through GraphShardedSampledModel exactly like
    the replicated device-sampled path."""

    def test_trainer_fit_learns_one_hop_task(self, cpu_devices):
        from connectome_gnn_tpu.parallel import graph_sharded_sage
        from connectome_gnn_tpu.train import Trainer

        g = _graph(n=512, degree=8, band=32)
        src, dst = g.edge_index
        num = np.zeros(g.num_nodes)
        den = np.zeros(g.num_nodes)
        np.add.at(num, dst, g.edge_weight * g.node_features[src, 0])
        np.add.at(den, dst, g.edge_weight)
        agg = num / (den + 1e-8)
        labels = (agg > np.median(agg)).astype(np.int32)

        mesh = create_mesh(devices=cpu_devices[:4])
        model = graph_sharded_sage(
            g, num_shards=4, hidden_dim=32, fanout=(8, 8)
        )
        tr = model.make_loader(
            np.arange(g.num_nodes), labels, batch_size=128, seed=0,
            drop_last=True,
        )
        va = model.make_loader(
            np.arange(g.num_nodes), labels, batch_size=128, seed=1,
            shuffle=False, drop_last=True,
        )
        trainer = Trainer(model, mesh=mesh, seed=0)
        hist = trainer.fit(tr, va, num_epochs=8, patience=20, verbose=False)
        assert hist["train_loss"][-1] < hist["train_loss"][0]
        m = trainer.evaluate(va)
        assert m["total"] == 512
        assert m["accuracy"] > 0.6

    def test_loader_defaults_to_partition_shards(self):
        from connectome_gnn_tpu.parallel import graph_sharded_sage

        g = _graph()
        model = graph_sharded_sage(g, num_shards=4, fanout=(4, 4))
        lo = model.make_loader(np.arange(g.num_nodes), batch_size=64)
        assert lo.num_shards == 4
        b = next(iter(lo))
        assert b.stacked and b.packed.shape[0] == 4
        assert b.csr is None  # the graph rides as the step's argument

    def test_rejects_gcn_inner(self):
        from connectome_gnn_tpu.models.node_coo import NodeGCN
        from connectome_gnn_tpu.parallel import (
            GraphShardedSampledModel, ShardedGraphCSR,
        )

        g = _graph()
        csr = ShardedGraphCSR.partition(g, 4)
        with pytest.raises(ValueError, match="SAGE-family"):
            GraphShardedSampledModel(
                csr, NodeGCN(in_channels=5, hidden_dim=8), (4, 4)
            )
