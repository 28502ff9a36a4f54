#!/usr/bin/env python3
"""Headline benchmark: GCN forward edge-message throughput.

Measures the steady-state inference forward pass of the flagship
GCNConnectome at the reference demo config (batch=16 subjects × 84 regions,
hidden=64, 3 layers) and reports edge-messages/second — directly comparable
to the reference's measured CPU number (BASELINE.md: 8.05 ms/batch ⇒
~3.96 M edge-messages/s, 3 layers × ~10.6k edges per batch).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

BASELINE_EDGE_MSGS_PER_S = 3.96e6  # reference torch CPU, BASELINE.md

WARMUP = 10
ITERS = 200


def main() -> None:
    from connectome_gnn_tpu.data import collate_graphs, generate_dataset
    from connectome_gnn_tpu.models import GCNConnectome

    graphs = generate_dataset(num_subjects=16, num_regions=84, seed=42)
    batch = collate_graphs(graphs)
    real_edges = int(np.asarray(batch.edge_mask).sum())

    model = GCNConnectome(in_channels=5, hidden_dim=64, num_classes=2, num_layers=3)
    params, state = model.init(jax.random.PRNGKey(0))

    @jax.jit
    def forward(params, state, batch):
        logits, _ = model.apply(params, state, batch, train=False)
        return logits

    out = forward(params, state, batch)
    jax.block_until_ready(out)
    for _ in range(WARMUP):
        out = forward(params, state, batch)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = forward(params, state, batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    edge_messages = model.num_layers * real_edges * ITERS
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
