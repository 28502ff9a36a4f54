"""Fused Pallas GCN kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import jax
import pytest

from connectome_gnn_tpu.data import collate_dense, generate_dataset
from connectome_gnn_tpu.models import GCNConnectome
from connectome_gnn_tpu.ops.fused_pallas import fused_gcn_forward


@pytest.fixture(scope="module")
def setup():
    graphs = generate_dataset(num_subjects=8, num_regions=20, seed=0)
    batch = collate_dense(graphs)
    model = GCNConnectome(in_channels=5, hidden_dim=32, num_classes=2, num_layers=3)
    params, state = model.init(jax.random.PRNGKey(0))
    return model, params, state, batch


class TestFusedGCN:
    def test_matches_xla_path(self, setup):
        model, params, state, batch = setup
        oracle, _ = model.apply(params, state, batch, train=False)
        fused = fused_gcn_forward(
            params,
            state,
            batch.node_features,
            batch.adj,
            batch.node_mask,
            num_layers=3,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(oracle), rtol=1e-4, atol=1e-5
        )

    def test_matches_after_bn_stats_update(self, setup):
        """Run a train-mode step first so BN stats are non-trivial."""
        model, params, state, batch = setup
        _, state2 = model.apply(
            params, state, batch, train=True, rng=jax.random.PRNGKey(1)
        )
        oracle, _ = model.apply(params, state2, batch, train=False)
        fused = fused_gcn_forward(
            params,
            state2,
            batch.node_features,
            batch.adj,
            batch.node_mask,
            num_layers=3,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(oracle), rtol=1e-4, atol=1e-5
        )

    def test_single_layer(self):
        graphs = generate_dataset(num_subjects=4, num_regions=16, seed=2)
        batch = collate_dense(graphs)
        model = GCNConnectome(in_channels=5, hidden_dim=16, num_layers=1)
        params, state = model.init(jax.random.PRNGKey(0))
        oracle, _ = model.apply(params, state, batch, train=False)
        fused = fused_gcn_forward(
            params, state, batch.node_features, batch.adj, batch.node_mask,
            num_layers=1, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(oracle), rtol=1e-4, atol=1e-5
        )

    def test_rejects_nonuniform_width(self):
        model = GCNConnectome(in_channels=5, hidden_dim=16, num_layers=2)
        params, state = model.init(jax.random.PRNGKey(0))
        params["convs"][1]["kernel"] = params["convs"][1]["kernel"][:, :8]
        graphs = generate_dataset(num_subjects=2, num_regions=16, seed=3)
        batch = collate_dense(graphs)
        with pytest.raises(ValueError):
            fused_gcn_forward(
                params, state, batch.node_features, batch.adj, batch.node_mask,
                num_layers=2, interpret=True,
            )


class TestFusedSAGE:
    def test_matches_xla_path(self):
        from connectome_gnn_tpu.models import GraphSAGEConnectome
        from connectome_gnn_tpu.ops.fused_pallas import fused_sage_forward

        graphs = generate_dataset(num_subjects=8, num_regions=20, seed=0)
        batch = collate_dense(graphs)
        model = GraphSAGEConnectome(in_channels=5, hidden_dim=32, num_layers=3)
        params, state = model.init(jax.random.PRNGKey(0))
        # non-trivial BN stats
        _, state = model.apply(params, state, batch, train=True, rng=jax.random.PRNGKey(1))
        oracle, _ = model.apply(params, state, batch, train=False)
        fused = fused_sage_forward(
            params, state, batch.node_features, batch.adj, batch.node_mask,
            num_layers=3, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(oracle), rtol=1e-4, atol=1e-5
        )

    def test_single_layer(self):
        from connectome_gnn_tpu.models import GraphSAGEConnectome
        from connectome_gnn_tpu.ops.fused_pallas import fused_sage_forward

        graphs = generate_dataset(num_subjects=4, num_regions=16, seed=2)
        batch = collate_dense(graphs)
        model = GraphSAGEConnectome(in_channels=5, hidden_dim=16, num_layers=1)
        params, state = model.init(jax.random.PRNGKey(0))
        oracle, _ = model.apply(params, state, batch, train=False)
        fused = fused_sage_forward(
            params, state, batch.node_features, batch.adj, batch.node_mask,
            num_layers=1, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(oracle), rtol=1e-4, atol=1e-5
        )


class TestVmemRetry:
    def test_falls_back_to_smaller_divisor_and_caches(self):
        """A scoped-VMEM compile rejection retries with the next-smaller
        divisor of B; the proven group is cached per shape."""
        from connectome_gnn_tpu.models import GCNConnectome
        from connectome_gnn_tpu.ops import fused_pallas as fp

        graphs = generate_dataset(num_subjects=8, num_regions=16, seed=3)
        batch = collate_dense(graphs)
        model = GCNConnectome(in_channels=5, hidden_dim=16, num_layers=2)
        params, state = model.init(jax.random.PRNGKey(0))

        calls = []

        def fake_fused(p, s, x, adj, mask, *, num_layers, interpret, group):
            calls.append(group)
            if group > 2:
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED: scoped vmem limit exceeded"
                )
            return fp.fused_gcn_forward(
                p, s, x, adj, mask, num_layers=num_layers,
                interpret=True, group=group,
            )

        fp._PROVEN_GROUPS.clear()
        out = fp._fused_with_vmem_retry(
            fake_fused, params, state, batch, 2, True
        )
        assert out.shape == (8, 2)
        # strictly decreasing divisor chain ending at a working group
        assert calls == sorted(calls, reverse=True)
        assert calls[-1] <= 2 and 8 % calls[-1] == 0
        # proven group cached: second call compiles once, no retries
        calls.clear()
        fp._fused_with_vmem_retry(fake_fused, params, state, batch, 2, True)
        assert len(calls) == 1
        fp._PROVEN_GROUPS.clear()

    def test_non_vmem_errors_propagate(self):
        from connectome_gnn_tpu.models import GCNConnectome
        from connectome_gnn_tpu.ops import fused_pallas as fp

        graphs = generate_dataset(num_subjects=4, num_regions=16, seed=3)
        batch = collate_dense(graphs)
        model = GCNConnectome(in_channels=5, hidden_dim=16, num_layers=2)
        params, state = model.init(jax.random.PRNGKey(0))

        def broken(*a, **k):
            raise RuntimeError("something unrelated")

        fp._PROVEN_GROUPS.clear()
        with pytest.raises(RuntimeError, match="unrelated"):
            fp._fused_with_vmem_retry(broken, params, state, batch, 2, True)
