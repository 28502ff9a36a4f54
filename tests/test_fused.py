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
