"""Activation-parity tests against the PyTorch reference implementation.

These tests load the reference suite from ``/root/reference`` (read-only),
generate identical data, transplant the reference's initialized weights into
this framework via ``params_from_reference_state_dict``, and assert per-layer
``allclose`` on identical batches — the parity gate from BASELINE.json.

Skipped automatically when the reference checkout or torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REFERENCE_PATH, "connectome_gnn")):
    pytest.skip("reference checkout not available", allow_module_level=True)

sys.path.insert(0, REFERENCE_PATH)

from connectome_gnn.graph import collate_graphs as ref_collate  # noqa: E402
from connectome_gnn.models import (  # noqa: E402
    GCNConnectome as RefGCN,
    GraphSAGEConnectome as RefSAGE,
)
from connectome_gnn.synthetic import (  # noqa: E402
    generate_connectome as ref_generate_connectome,
    generate_dataset as ref_generate_dataset,
)

import jax  # noqa: E402

from connectome_gnn_tpu.data import collate_graphs, generate_dataset  # noqa: E402
from connectome_gnn_tpu.models import (  # noqa: E402
    GCNConnectome,
    GraphSAGEConnectome,
    params_from_reference_state_dict,
)


def state_dict_numpy(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def paired_batches():
    """The same 8 subjects, packed by both frameworks."""
    ref_graphs = ref_generate_dataset(num_subjects=8, num_regions=30, seed=42)
    my_graphs = generate_dataset(num_subjects=8, num_regions=30, seed=42)
    return ref_collate(ref_graphs), collate_graphs(my_graphs)


class TestGeneratorParity:
    def test_single_graph_bitwise_topology(self):
        for seed in (0, 7, 42, 987654):
            ref = ref_generate_connectome(seed=seed)
            mine = __import__(
                "connectome_gnn_tpu.data.synthetic", fromlist=["generate_connectome"]
            ).generate_connectome(seed=seed)
            assert np.array_equal(ref.edge_index.numpy(), mine.edge_index)
            assert np.array_equal(ref.edge_weight.numpy(), mine.edge_weight)
            assert np.allclose(
                ref.node_features.numpy(), mine.node_features, atol=1e-5
            )
            assert int(ref.label) == mine.label

    def test_dataset_fanout_parity(self):
        ref = ref_generate_dataset(num_subjects=12, num_regions=25, seed=42)
        mine = generate_dataset(num_subjects=12, num_regions=25, seed=42)
        for r, m in zip(ref, mine):
            assert r.subject_id == m.subject_id
            assert np.array_equal(r.edge_index.numpy(), m.edge_index)
            assert int(r.label) == m.label


class TestActivationParity:
    @pytest.mark.parametrize(
        "ref_cls,my_cls",
        [(RefGCN, GCNConnectome), (RefSAGE, GraphSAGEConnectome)],
        ids=["gcn", "sage"],
    )
    def test_eval_logits_allclose(self, paired_batches, ref_cls, my_cls):
        ref_batch, my_batch = paired_batches
        torch.manual_seed(0)
        ref_model = ref_cls(in_channels=5, hidden_dim=64, num_classes=2, num_layers=3)
        ref_model.eval()
        with torch.no_grad():
            ref_logits = ref_model(ref_batch).numpy()

        model = my_cls(in_channels=5, hidden_dim=64, num_classes=2, num_layers=3)
        params, state = params_from_reference_state_dict(
            state_dict_numpy(ref_model), num_layers=3
        )
        logits, _ = model.apply(params, state, my_batch, train=False)
        np.testing.assert_allclose(
            np.asarray(logits), ref_logits, rtol=1e-4, atol=1e-5
        )

    @pytest.mark.parametrize(
        "ref_cls,my_cls",
        [(RefGCN, GCNConnectome), (RefSAGE, GraphSAGEConnectome)],
        ids=["gcn", "sage"],
    )
    def test_eval_embeddings_allclose(self, paired_batches, ref_cls, my_cls):
        ref_batch, my_batch = paired_batches
        torch.manual_seed(1)
        ref_model = ref_cls(in_channels=5, hidden_dim=64, num_classes=2, num_layers=3)
        ref_model.eval()
        with torch.no_grad():
            ref_emb = ref_model.encode(ref_batch).numpy()

        model = my_cls(in_channels=5, hidden_dim=64, num_classes=2, num_layers=3)
        params, state = params_from_reference_state_dict(
            state_dict_numpy(ref_model), num_layers=3
        )
        emb, _ = model.encode(params, state, my_batch, train=False)
        np.testing.assert_allclose(np.asarray(emb), ref_emb, rtol=1e-4, atol=1e-5)

    def test_train_mode_batchnorm_stats_parity(self, paired_batches):
        """One train-mode forward (dropout off) must update BN running stats
        identically to the reference."""
        ref_batch, my_batch = paired_batches
        torch.manual_seed(2)
        ref_model = RefGCN(
            in_channels=5, hidden_dim=64, num_classes=2, num_layers=3, dropout=0.0
        )
        ref_model.train()
        with torch.no_grad():
            ref_logits = ref_model(ref_batch).numpy()
        ref_sd = state_dict_numpy(ref_model)  # post-forward running stats

        torch.manual_seed(2)
        ref_model_init = RefGCN(
            in_channels=5, hidden_dim=64, num_classes=2, num_layers=3, dropout=0.0
        )
        model = GCNConnectome(
            in_channels=5, hidden_dim=64, num_classes=2, num_layers=3, dropout=0.0
        )
        params, state = params_from_reference_state_dict(
            state_dict_numpy(ref_model_init), num_layers=3
        )
        logits, new_state = model.apply(
            params, state, my_batch, train=True, rng=jax.random.PRNGKey(0)
        )
        np.testing.assert_allclose(
            np.asarray(logits), ref_logits, rtol=1e-3, atol=1e-4
        )
        for i in range(3):
            np.testing.assert_allclose(
                np.asarray(new_state["norms"][i]["mean"]),
                ref_sd[f"batch_norms.{i}.running_mean"],
                rtol=1e-3,
                atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(new_state["norms"][i]["var"]),
                ref_sd[f"batch_norms.{i}.running_var"],
                rtol=1e-3,
                atol=1e-5,
            )


class TestTraitParity:
    @pytest.mark.parametrize("trait_idx", [1, 2, 3, 4])
    def test_other_traits_bitwise(self, trait_idx):
        ref = ref_generate_connectome(seed=11, trait_idx=trait_idx)
        mine = __import__(
            "connectome_gnn_tpu.data.synthetic", fromlist=["generate_connectome"]
        ).generate_connectome(seed=11, trait_idx=trait_idx)
        assert np.array_equal(ref.edge_index.numpy(), mine.edge_index)
        assert int(ref.label) == mine.label
