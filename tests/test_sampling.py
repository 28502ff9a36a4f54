"""Neighbor sampling tests."""

import numpy as np
import pytest

from connectome_gnn_tpu.data import generate_connectome
from connectome_gnn_tpu.data.sampling import sample_subgraph


@pytest.fixture(scope="module")
def graph():
    return generate_connectome(num_regions=100, k=10, seed=5)


class TestSampleSubgraph:
    def test_seeds_come_first(self, graph):
        sub, ids = sample_subgraph(graph, [3, 7, 11], fanout=[5, 5],
                                   rng=np.random.default_rng(0))
        assert ids[:3].tolist() == [3, 7, 11]

    def test_features_relabeled_consistently(self, graph):
        sub, ids = sample_subgraph(graph, [0, 1], fanout=[4],
                                   rng=np.random.default_rng(1))
        np.testing.assert_allclose(sub.node_features, graph.node_features[ids])

    def test_edges_exist_in_original(self, graph):
        sub, ids = sample_subgraph(graph, [2], fanout=[6, 6],
                                   rng=np.random.default_rng(2))
        orig = set(zip(graph.edge_index[0].tolist(), graph.edge_index[1].tolist()))
        for s, d in zip(sub.edge_index[0], sub.edge_index[1]):
            assert (int(ids[s]), int(ids[d])) in orig

    def test_fanout_bounds_edges_per_hop(self, graph):
        fanout = 3
        sub, ids = sample_subgraph(graph, [0], fanout=[fanout],
                                   rng=np.random.default_rng(3))
        # one hop from one seed → at most `fanout` sampled in-edges
        assert sub.num_edges <= fanout
        assert len(ids) <= 1 + fanout

    def test_zero_hop(self, graph):
        sub, ids = sample_subgraph(graph, [5], fanout=[],
                                   rng=np.random.default_rng(4))
        assert len(ids) == 1
        assert sub.num_edges == 0

    def test_duplicate_seeds_deduped(self, graph):
        sub, ids = sample_subgraph(graph, [5, 5, 5], fanout=[2],
                                   rng=np.random.default_rng(5))
        assert (ids == 5).sum() == 1


class TestProfiling:
    def test_trace_writes_profile(self, tmp_path):
        import jax.numpy as jnp

        from connectome_gnn_tpu.utils.profiling import StepTimer, trace

        with trace(str(tmp_path)):
            x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
            x.block_until_ready()
        import os

        produced = []
        for root, _, files in os.walk(tmp_path):
            produced += files
        assert produced  # a trace artifact was written

    def test_step_timer_summary(self):
        from connectome_gnn_tpu.utils.profiling import StepTimer

        t = StepTimer()
        for _ in range(3):
            t.tic()
            t.toc()
        s = t.summary()
        assert s["steps"] == 3
        assert s["total_s"] >= 0
        import pytest as _pytest

        with _pytest.raises(RuntimeError):
            t.toc()
