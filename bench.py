#!/usr/bin/env python3
"""Headline benchmark: GCN forward edge-message throughput.

Measures the steady-state inference forward pass of the flagship
GCNConnectome at the reference demo config (batch=16 subjects × 84 regions,
hidden=64, 3 layers) and reports edge-messages/second — directly comparable
to the reference's measured CPU number (BASELINE.md: 8.05 ms/batch ⇒
~3.96 M edge-messages/s, 3 layers × ~10.6k edges per batch).

Uses the fused Pallas inference kernel (whole model in one dispatch over
the dense MXU layout) — the fastest verified-equivalent path; equivalence
vs the XLA oracle is asserted before timing.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_EDGE_MSGS_PER_S = 3.96e6  # reference torch CPU, BASELINE.md

WARMUP = 10
ITERS = 2000  # forwards per on-device loop
CALLS = 5  # pipelined loop dispatches in the timed region


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

    # The TPU here sits behind a network tunnel, so per-call host timing is
    # RTT-noise-dominated.  Measure device-side steady state instead: ITERS
    # forwards chained in one on-device fori_loop (input perturbed by the
    # loop index so XLA cannot hoist the body), one dispatch total.
    def loop_forward(p, s, x, a, m):
        def body(i, acc):
            xi = x + i.astype(jnp.float32) * jnp.float32(1e-30)
            logits = fused_gcn_forward(p, s, xi, a, m, num_layers=3)
            return acc + logits[0, 0]

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    compiled = jax.jit(loop_forward).lower(params, state, *args).compile()
    jax.block_until_ready(compiled(params, state, *args))  # warmup

    t0 = time.perf_counter()
    outs = [compiled(params, state, *args) for _ in range(CALLS)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    edge_messages = model.num_layers * real_edges * ITERS * CALLS
    rate = edge_messages / dt
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
