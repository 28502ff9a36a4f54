#!/usr/bin/env python3
"""Headline benchmark: GCN forward edge-message throughput.

Measures the steady-state inference forward pass of the flagship
GCNConnectome at the reference demo config (batch=16 subjects × 84 regions,
hidden=64, 3 layers) and reports edge-messages/second — directly comparable
to the reference's measured CPU number (BASELINE.md: 8.05 ms/batch ⇒
~3.96 M edge-messages/s, 3 layers × ~10.6k edges per batch).

Uses the fused Pallas inference kernel (whole model in one dispatch over
the dense MXU layout); equivalence vs the XLA oracle is asserted before
timing.

Timing methodology (this TPU sits behind a network tunnel, and
``block_until_ready`` is not a reliable sync on this backend):
iterations are chained in an on-device ``fori_loop`` (index-perturbed
input so XLA cannot hoist the body), synchronization is a scalar value
fetch, and fixed overheads cancel by differencing a full-length against a
quarter-length loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_EDGE_MSGS_PER_S = 3.96e6  # reference torch CPU, BASELINE.md

ITERS = 20000  # loop long enough that per-iter time dominates fetch overhead


def main() -> None:
    from connectome_gnn_tpu.data import collate_dense, generate_dataset
    from connectome_gnn_tpu.models import GCNConnectome
    from connectome_gnn_tpu.ops.fused_pallas import fused_gcn_forward

    graphs = generate_dataset(num_subjects=16, num_regions=84, seed=42)
    batch = collate_dense(graphs)
    real_edges = sum(g.num_edges for g in graphs)

    model = GCNConnectome(in_channels=5, hidden_dim=64, num_classes=2, num_layers=3)
    params, state = model.init(jax.random.PRNGKey(0))

    # Correctness gate: fused kernel must match the XLA oracle on-device.
    oracle, _ = jax.jit(
        lambda p, s, b: model.apply(p, s, b, train=False)
    )(params, state, batch)
    args = (batch.node_features, batch.adj, batch.node_mask)
    fused = np.asarray(fused_gcn_forward(params, state, *args, num_layers=3))
    np.testing.assert_allclose(fused, np.asarray(oracle), rtol=1e-4, atol=1e-5)

    def make(iters):
        def looped(p, s, x, adj, mask):
            def body(i, acc):
                xi = x + i.astype(jnp.float32) * jnp.float32(1e-30)
                logits = fused_gcn_forward(p, s, xi, adj, mask, num_layers=3)
                return acc + logits[0, 0]

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        return jax.jit(looped).lower(params, state, *args).compile()

    k_small = ITERS // 4
    c_full, c_small = make(ITERS), make(k_small)
    float(c_full(params, state, *args))  # warmup, true sync via fetch
    float(c_small(params, state, *args))

    def timed(c):
        t0 = time.perf_counter()
        float(c(params, state, *args))
        return time.perf_counter() - t0

    t_small = min(timed(c_small) for _ in range(2))
    t_full = min(timed(c_full) for _ in range(2))
    dt = max(t_full - t_small, 1e-12) / (ITERS - k_small)

    rate = model.num_layers * real_edges / dt
    print(
        json.dumps(
            {
                "metric": "gcn_fwd_edge_messages_per_s",
                "value": round(rate, 1),
                "unit": "edge-messages/s (bs=16, h=64, L=3, 84-node WS graphs)",
                "vs_baseline": round(rate / BASELINE_EDGE_MSGS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
