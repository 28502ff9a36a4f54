#!/usr/bin/env python3
"""Sweep the fused-kernel group size G on the packed-512 serving config.

Config 4 (fused GCN, 512 packed 88-node graphs) measures 10.8% MFU.
The padding-aware MXU ceiling at these shapes is ~24% (each graph's
88x88 @ 88x64 aggregation occupies one full 128^3-capacity tile-op at
23.6% useful density; the shared transform matmul runs at ~25% for the
same reason), so roughly 2x headroom is unexplained.  One free variable
is ``graphs_per_block``: the VMEM-budget heuristic picks G=32 (16 grid
steps) — more graphs per step means fewer grid-step boundaries and
larger transform matmuls, fewer means deeper DMA/compute overlap.  This
harness times the REAL kernel at G in {8,16,32,64,128} x VMEM budgets,
plus the XLA dense path on the same batch as the non-Pallas control,
and writes FUSED_SWEEP_r04.json.  The winner (if any) becomes the
heuristic's new operating point.

Reference op being scaled: /root/reference/connectome_gnn/models.py:213
(forward at serving batch sizes).
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))
))

from benchmarks.suite import (  # noqa: E402
    _fused_fwd_bytes,
    _gcn_dense_fwd_flops,
    device_loop_time,
    roofline,
)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="FUSED_SWEEP_r04.json")
    p.add_argument("--subjects", type=int, default=512)
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--groups", default="8,16,32,64,128")
    args = p.parse_args()

    import connectome_gnn_tpu.ops.fused_pallas as fp
    from connectome_gnn_tpu.data import collate_dense, generate_dataset
    from connectome_gnn_tpu.models import GCNConnectome

    B = args.subjects
    graphs = generate_dataset(num_subjects=B, num_regions=84, seed=2)
    batch = collate_dense(graphs)
    edges = sum(g.num_edges for g in graphs)
    model = GCNConnectome(
        in_channels=5, hidden_dim=64, num_classes=2, num_layers=3
    )
    params, state = model.init(jax.random.PRNGKey(0))
    N = int(batch.node_features.shape[1])
    flops = _gcn_dense_fwd_flops(B, N, [5, 64, 64, 64], 2)
    bytes_moved = _fused_fwd_bytes(B, N, 5)

    # correctness oracle once (XLA dense path)
    logits_ref, _ = model.apply(params, state, batch, train=False)

    rows = []

    def time_fused(g_override):
        # G is resolved inside the traced function, so the jit cache
        # must be dropped for the override to take effect
        orig = fp._choose_graphs_per_block
        fp._choose_graphs_per_block = lambda *a, **k: g_override
        fp.fused_gcn_forward.clear_cache()
        try:
            def step(x, adj, mask, eps, i):
                out = fp.fused_gcn_forward(
                    params, state, x + eps, adj, mask, num_layers=3
                )
                return out[0, 0]

            a = (
                batch.node_features,
                batch.adj,
                batch.node_mask.astype(jnp.float32),
            )
            out = fp.fused_gcn_forward(params, state, *a, num_layers=3)
            err = float(
                jnp.max(jnp.abs(out - logits_ref))
                / (jnp.max(jnp.abs(logits_ref)) + 1e-12)
            )
            dt = device_loop_time(step, a, args.iters)
            return dt, err
        finally:
            fp._choose_graphs_per_block = orig
            fp.fused_gcn_forward.clear_cache()

    for g in [int(x) for x in args.groups.split(",")]:
        if B % g:
            continue
        try:
            dt, err = time_fused(g)
        except Exception as e:  # compile failure (e.g. scoped-VMEM OOM)
            msg = str(e)
            rows.append({
                "graphs_per_block": g,
                "grid_steps": B // g,
                "failed": "vmem_oom" if "vmem" in msg else "compile_error",
                "error_head": msg[:200],
            })
            print(f"# G={g:4d}: FAILED ({msg[:80]}...)", file=sys.stderr,
                  flush=True)
            continue
        row = {
            "graphs_per_block": g,
            "grid_steps": B // g,
            "us_per_batch": dt * 1e6,
            "edge_msgs_per_s": 3 * edges / dt,
            "max_rel_err_vs_xla": err,
            **roofline(dt, flops=flops, bytes_moved=bytes_moved),
        }
        rows.append(row)
        print(
            f"# G={g:4d} ({B//g:3d} steps): {dt*1e6:8.1f} us  "
            f"mfu={row['mfu']:.3f} err={err:.2e}",
            file=sys.stderr, flush=True,
        )

    # XLA dense control on the same batch
    import dataclasses

    def xla_step(x, eps, i):
        b = dataclasses.replace(batch, node_features=x + eps)
        logits, _ = model.apply(params, state, b, train=False)
        return logits[0, 0]

    dt = device_loop_time(xla_step, (batch.node_features,), args.iters)
    control = {
        "us_per_batch": dt * 1e6,
        "edge_msgs_per_s": 3 * edges / dt,
        **roofline(dt, flops=flops),
    }
    print(f"# xla dense control: {dt*1e6:.1f} us", file=sys.stderr,
          flush=True)

    out = {
        "round": 4,
        "harness": "benchmarks/fused_block_sweep.py",
        "subjects": B,
        "padded_nodes": N,
        "sweep": rows,
        "xla_dense_control": control,
        "padding_aware_mxu_ceiling": 0.24,
    }
    s = json.dumps(out, indent=2)
    print(s)
    with open(args.out, "w") as f:
        f.write(s + "\n")


if __name__ == "__main__":
    main()
