#!/usr/bin/env python3
"""Scaling-efficiency harness: throughput vs device count.

Measures the north-star scaling metric (BASELINE.json: edges/s scaling
1 chip → 1 host → N hosts, target >80 % efficiency) for the two
parallel modes:

* ``dp``     — data-parallel training throughput (graphs/s) over the
               ``data`` axis at shard counts 1, 2, 4, ..., D;
* ``banded`` — halo-exchange sharded banded forward (edges/s) over the
               ``edge`` axis.

On this environment only one real TPU chip is visible, so multi-device
rows use virtual CPU devices (run with
``XLA_FLAGS=--xla_force_host_platform_device_count=8 ... --cpu``) —
exercising the exact sharding/collective program that a pod slice would
run, with CPU-grade absolute numbers.  On a real multi-chip slice the same
harness reports honest per-chip scaling.

Usage:
    python benchmarks/scaling.py --cpu --mode dp
    python benchmarks/scaling.py --cpu --mode banded
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(value) -> float:
    import jax.numpy as jnp

    return float(jnp.sum(value))


def bench_dp(devices, graphs_per_shard=32, steps=20):
    import jax
    import numpy as np
    import optax

    from connectome_gnn_tpu.data import ConnectomeDataLoader, generate_dataset
    from connectome_gnn_tpu.models import GCNConnectome
    from connectome_gnn_tpu.parallel import create_mesh, make_dp_train_step, shard_batch

    results = {}
    d = 1
    while d <= len(devices):
        batch_size = graphs_per_shard * d
        dataset = generate_dataset(num_subjects=batch_size, num_regions=84, seed=0)
        loader = ConnectomeDataLoader(
            dataset, batch_size=batch_size, shuffle=False, num_shards=d
        )
        mesh = create_mesh(shape=(d,), devices=devices[:d])
        stacked = shard_batch(next(iter(loader)), mesh)

        model = GCNConnectome(in_channels=5, hidden_dim=64)
        params, state = model.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        step = make_dp_train_step(model, opt, mesh)

        # warmup + timed loop (value-fetch sync; see suite.py methodology)
        key = jax.random.PRNGKey(1)
        p, s, o = params, state, opt_state
        p, s, o, loss, _ = step(p, s, o, key, stacked)
        sync(loss)
        t0 = time.perf_counter()
        for _ in range(steps):
            p, s, o, loss, _ = step(p, s, o, key, stacked)
        sync(loss)
        dt = (time.perf_counter() - t0) / steps
        results[d] = {
            "graphs_per_s": batch_size / dt,
            "per_device": batch_size / dt / d,
        }
        d *= 2

    base = results[1]["per_device"]
    for d, r in results.items():
        r["efficiency"] = r["per_device"] / base
    return results


def bench_banded(devices, nodes_per_shard=16384, band=512, steps=10):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from connectome_gnn_tpu.models import BandedNodeGCN
    from connectome_gnn_tpu.ops import to_banded
    from connectome_gnn_tpu.parallel import (
        ShardedBandedGCN,
        create_mesh,
        partition_banded,
    )

    results = {}
    d = 1
    while d <= len(devices):
        n = nodes_per_shard * d
        rng = np.random.default_rng(0)
        deg = 12
        receivers = np.repeat(np.arange(n), deg)
        senders = np.clip(
            receivers + rng.integers(-band, band + 1, receivers.shape[0]), 0, n - 1
        )
        weights = rng.random(receivers.shape[0]).astype(np.float32)
        x = rng.standard_normal((n, 5)).astype(np.float32)
        a = to_banded(senders.astype(np.int32), receivers.astype(np.int32),
                      weights, n, block=128)
        edges = receivers.shape[0]

        model = ShardedBandedGCN(in_channels=5, hidden_dim=64, num_layers=3)
        params, state = model.init(jax.random.PRNGKey(0))
        mesh = create_mesh(shape=(d,), axis_names=("edge",), devices=devices[:d])
        pb = partition_banded(a, x, d)

        out = model.forward(params, state, pb, mesh)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = model.forward(params, state, pb, mesh)
        sync(out)
        dt = (time.perf_counter() - t0) / steps
        results[d] = {
            "edges_per_s": 3 * edges / dt,  # 3 layers of aggregation
            "per_device": 3 * edges / dt / d,
        }
        d *= 2

    base = results[1]["per_device"]
    for d, r in results.items():
        r["efficiency"] = r["per_device"] / base
    return results


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--mode", choices=["dp", "banded"], default="dp")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    devices = jax.devices()
    print(f"devices: {len(devices)} × {devices[0].platform}", file=sys.stderr)
    if devices[0].platform == "cpu":
        print(
            "NOTE: virtual CPU devices share physical cores — these rows "
            "validate the sharded programs and expose collective overheads, "
            "but 'efficiency' here reflects core contention, NOT "
            "interconnect scaling. Run on a real slice for honest numbers.",
            file=sys.stderr,
        )

    results = (
        bench_dp(devices) if args.mode == "dp" else bench_banded(devices)
    )
    metric = "graphs_per_s" if args.mode == "dp" else "edges_per_s"
    print(f"{'devices':>8} {metric:>16} {'per-device':>14} {'efficiency':>11}")
    for d, r in results.items():
        print(
            f"{d:>8} {r[metric]:>16,.0f} {r['per_device']:>14,.0f} "
            f"{r['efficiency']:>10.1%}"
        )


if __name__ == "__main__":
    main()
