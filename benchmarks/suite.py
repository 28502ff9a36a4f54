#!/usr/bin/env python3
"""Benchmark suite across the BASELINE.json configurations.

Configs (BASELINE.json):
  1. GCN  bs=16,  84-node WS subjects, hidden=64  (reference demo config)
  2. SAGE bs=16,  84-node WS subjects, hidden=64
  3. 360-node (HCP/Glasser-scale) graphs, hidden=256, bs=64 — larger MXU tiles
  4. packed 512 graphs/chip, hidden=64 — throughput-bound batched aggregation
  5. giant-graph CSR SpMM (segment-sum) edges/s/chip
  T. GCN train step (fwd+bwd+Adam) throughput at bs=512

All timings are device-side steady state: K iterations chained in one
on-device ``fori_loop`` (inputs perturbed by the loop index so XLA cannot
hoist the body), which removes host/tunnel dispatch noise entirely.

Usage:
    python benchmarks/suite.py [--json] [--configs 1,3,4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _fetch(value) -> float:
    """True device synchronization: pull a scalar to host.

    ``jax.block_until_ready`` is NOT a reliable sync on the axon remote
    backend (observed returning before execution finishes); fetching a
    value is.
    """
    return float(jnp.sum(value))


def device_loop_time(step_fn, args, iters: int) -> float:
    """Seconds per iteration of ``step_fn`` on device, dispatch-free.

    ``step_fn(*args, eps, i)`` must return a scalar; iterations are chained
    in one on-device ``fori_loop`` with an input perturbation derived from
    the loop index so XLA cannot hoist the body.  To cancel fixed overheads
    (dispatch RTT, loop setup) the timing is the *difference* between a
    full-length and a quarter-length loop, each synced by a scalar fetch.
    """

    def make(k):
        def looped(*args):
            def body(i, carry):
                eps = i.astype(jnp.float32) * jnp.float32(1e-30)
                return carry + step_fn(*args, eps, i)

            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        return jax.jit(looped).lower(*args).compile()

    k_small = max(iters // 4, 1)
    c_full, c_small = make(iters), make(k_small)
    _fetch(c_full(*args))  # warmup (true sync)
    _fetch(c_small(*args))

    def timed(c):
        t0 = time.perf_counter()
        _fetch(c(*args))
        return time.perf_counter() - t0

    t_small = min(timed(c_small) for _ in range(2))
    t_full = min(timed(c_full) for _ in range(2))
    return max(t_full - t_small, 1e-12) / (iters - k_small)


def chained_loop_time(fn, x0, iters: int, *consts) -> float:
    """Like :func:`device_loop_time` but for LINEAR ``fn`` (e.g. SpMM):
    an additive perturbation would factor out of a linear op and let XLA
    hoist everything (observed), so each iteration feeds the *normalized*
    output back in — a nonlinear true sequential dependence.  Operands go
    via ``consts`` (closure-captured arrays would be inlined as program
    constants and blow up the compile payload)."""

    def make(k):
        def looped(x, *consts):
            def body(_, v):
                out = fn(v, *consts)
                return out * jax.lax.rsqrt(jnp.mean(out * out) + 1e-12)

            return jnp.mean(jax.lax.fori_loop(0, k, body, x))

        return jax.jit(looped).lower(x0, *consts).compile()

    k_small = max(iters // 4, 1)
    c_full, c_small = make(iters), make(k_small)
    _fetch(c_full(x0, *consts))
    _fetch(c_small(x0, *consts))

    def timed(c):
        t0 = time.perf_counter()
        _fetch(c(x0, *consts))
        return time.perf_counter() - t0

    t_small = min(timed(c_small) for _ in range(2))
    t_full = min(timed(c_full) for _ in range(2))
    return max(t_full - t_small, 1e-12) / (iters - k_small)


# ----------------------------------------------------------------------
# Roofline framing: every config reports a %-of-peak figure
# ----------------------------------------------------------------------
# TPU v5e (1 chip) nominal peaks.  ``mfu`` is model flops over the bf16
# MXU peak — the hardware's matmul rate.  (This runtime additionally sets
# --xla_allow_excess_precision=true, which promotes bf16 matmuls back to
# f32, so f32-path MFU here is a conservative figure.)  ``hbm_frac`` is
# the analytic traffic model over nominal HBM bandwidth; large streams
# measure ~608 GB/s effective on this runtime (docs/ARCHITECTURE.md), so
# ~0.74 is the practical ceiling for bandwidth-bound kernels.
PEAK_MXU_FLOPS = 197e12
PEAK_HBM_BPS = 819e9


def roofline(dt: float, *, flops: float = 0, bytes_moved: float = 0) -> dict:
    """%-of-peak fields for a measured per-iteration time ``dt``.

    ``flops``/``bytes_moved`` are the config's ALGORITHMIC per-iteration
    model (useful work on the collated shapes, not padded kernel work) —
    each bench documents its model inline.
    """
    out = {}
    if flops:
        out["model_tflops"] = flops / dt / 1e12
        out["mfu"] = flops / dt / PEAK_MXU_FLOPS
    if bytes_moved:
        out["model_gbps"] = bytes_moved / dt / 1e9
        out["hbm_frac"] = bytes_moved / dt / PEAK_HBM_BPS
    return out


def _gcn_dense_fwd_flops(B: int, N: int, dims: list[int], classes: int) -> float:
    """Forward flops of the dense-adjacency GCN stack, per batch:
    per layer ``h @ W`` (2·B·N·fi·fo) + ``A @ (hW)`` (2·B·N²·fo), plus
    the pooled two-matmul head (hidden → hidden/2 → classes)."""
    f = 0.0
    for fi, fo in zip(dims[:-1], dims[1:]):
        f += 2.0 * B * N * fi * fo + 2.0 * B * N * N * fo
    h = dims[-1]
    f += 2.0 * B * h * (h // 2) + 2.0 * B * (h // 2) * classes
    return f


def _sage_dense_fwd_flops(B: int, N: int, dims: list[int], classes: int) -> float:
    """Forward flops of the dense SAGE stack: per layer the neighbor
    mean ``A @ h`` (2·B·N²·fi) plus self+neighbor transforms
    (2 × 2·B·N·fi·fo), plus the pooled head."""
    f = 0.0
    for fi, fo in zip(dims[:-1], dims[1:]):
        f += 2.0 * B * N * N * fi + 2.0 * 2.0 * B * N * fi * fo
    h = dims[-1]
    f += 2.0 * B * h * (h // 2) + 2.0 * B * (h // 2) * classes
    return f


def _fused_fwd_bytes(B: int, N: int, f_in: int) -> float:
    """HBM bytes of the FUSED forward (configs 1/2/4): the Pallas kernel
    grid-blocks over graph groups and runs ALL layers on the group's
    adjacency while it sits in VMEM (`ops/fused_pallas.py`:82), so the
    algorithmic traffic is one adjacency read + one input read + the
    logits write — inter-layer activations never touch HBM."""
    return 4.0 * (B * N * N + B * N * f_in) + 4.0 * B * 2


def _gcn_dense_train_bytes(B: int, N: int, dims: list[int]) -> float:
    """HBM bytes of one XLA-dense TRAIN step (config T), algorithmic
    minimum.  Forward: per layer read adj + read h_in + write h_out
    (the unfused path materializes inter-layer activations).  Backward:
    the dx chain re-reads adj per layer (`g @ A^T`) and reads/writes the
    activation-sized cotangents; dW re-reads each layer's saved input.
    Optimizer traffic (11k params × few reads/writes) is negligible."""
    fwd = 0.0
    for fi, fo in zip(dims[:-1], dims[1:]):
        fwd += 4.0 * (B * N * N + B * N * fi + B * N * fo)
    bwd = 0.0
    for fi, fo in zip(dims[:-1], dims[1:]):
        # dx: adj re-read + read g_out + write g_in; dW: saved h_in re-read
        bwd += 4.0 * (B * N * N + B * N * fo + B * N * fi + B * N * fi)
    return fwd + bwd


def carried_loop_time(step, carry0, consts: tuple, iters: int, readout) -> float:
    """Device-loop timing for STATEFUL steps (training): ``carry =
    step(carry, *consts, eps, i)`` chained in one on-device fori_loop,
    timed full-vs-quarter like :func:`device_loop_time`.  ``consts`` go
    as explicit args (closure-captured giant arrays would be inlined as
    program constants); ``readout(carry)`` must return a scalar."""

    def make(k):
        def outer(carry, *consts):
            def body(i, c):
                eps = i.astype(jnp.float32) * jnp.float32(1e-30)
                return step(c, *consts, eps, i)

            return readout(jax.lax.fori_loop(0, k, body, carry))

        return jax.jit(outer).lower(carry0, *consts).compile()

    k_small = max(iters // 4, 1)
    c_full, c_small = make(iters), make(k_small)
    _fetch(c_full(carry0, *consts))
    _fetch(c_small(carry0, *consts))

    def timed(c):
        t0 = time.perf_counter()
        _fetch(c(carry0, *consts))
        return time.perf_counter() - t0

    t_small = min(timed(c_small) for _ in range(2))
    t_full = min(timed(c_full) for _ in range(2))
    return max(t_full - t_small, 1e-12) / (iters - k_small)


def bench_small_graph_forward(model_cls=None, fused: bool = True, iters=2000):
    from connectome_gnn_tpu.data import collate_dense, generate_dataset
    from connectome_gnn_tpu.models import GCNConnectome, GraphSAGEConnectome
    from connectome_gnn_tpu.ops.fused_pallas import (
        fused_gcn_forward,
        fused_sage_forward,
    )

    if model_cls is None:
        model_cls = GCNConnectome

    graphs = generate_dataset(num_subjects=16, num_regions=84, seed=42)
    batch = collate_dense(graphs)
    edges = sum(g.num_edges for g in graphs)
    model = model_cls(in_channels=5, hidden_dim=64, num_classes=2, num_layers=3)
    params, state = model.init(jax.random.PRNGKey(0))

    if fused:
        fused_fn = (
            fused_sage_forward
            if issubclass(model_cls, GraphSAGEConnectome)
            else fused_gcn_forward
        )

        def step(x, adj, mask, eps, i):
            logits = fused_fn(
                params, state, x + eps, adj, mask, num_layers=3
            )
            return logits[0, 0]

        args = (batch.node_features, batch.adj, batch.node_mask.astype(jnp.float32))
    else:
        def step(x, adj, mask, eps, i):
            import dataclasses

            b = dataclasses.replace(batch, node_features=x + eps)
            logits, _ = model.apply(params, state, b, train=False)
            return logits[0, 0]

        args = (batch.node_features, batch.adj, batch.node_mask)

    dt = device_loop_time(step, args, iters)
    N = int(batch.node_features.shape[1])
    flops_fn = (
        _sage_dense_fwd_flops
        if issubclass(model_cls, GraphSAGEConnectome)
        else _gcn_dense_fwd_flops
    )
    # tiny-batch finding: both mfu and hbm_frac are low — the config is
    # grid-latency bound (88-node matmuls underfill the MXU; one graph
    # group per grid step), not compute- or bandwidth-bound.
    return {
        "us_per_batch": dt * 1e6,
        "edge_msgs_per_s": 3 * edges / dt,
        "graphs_per_s": 16 / dt,
        **roofline(
            dt,
            flops=flops_fn(16, N, [5, 64, 64, 64], 2),
            bytes_moved=_fused_fwd_bytes(16, N, 5),
        ),
    }


def bench_large_graphs(iters=500):
    """Config 3: 360-node graphs, hidden=256, bs=64 (XLA dense path —
    the auto-dispatch winner at this graph size)."""
    import dataclasses

    from connectome_gnn_tpu.data import collate_dense, generate_dataset
    from connectome_gnn_tpu.models import GCNConnectome

    graphs = generate_dataset(num_subjects=64, num_regions=360, k=16, seed=1)
    batch = collate_dense(graphs)
    edges = sum(g.num_edges for g in graphs)
    model = GCNConnectome(in_channels=5, hidden_dim=256, num_classes=2, num_layers=3)
    params, state = model.init(jax.random.PRNGKey(0))

    def step(x, eps, i):
        b = dataclasses.replace(batch, node_features=x + eps)
        logits, _ = model.apply(params, state, b, train=False)
        return logits[0, 0]

    args = (batch.node_features,)
    dt = device_loop_time(step, args, iters)
    N = int(batch.node_features.shape[1])
    return {
        "us_per_batch": dt * 1e6,
        "edge_msgs_per_s": 3 * edges / dt,
        "graphs_per_s": 64 / dt,
        **roofline(dt, flops=_gcn_dense_fwd_flops(64, N, [5, 256, 256, 256], 2)),
    }


def bench_packed_512(iters=200):
    """Config 4: 512 graphs/chip packed, hidden=64."""
    from connectome_gnn_tpu.data import collate_dense, generate_dataset
    from connectome_gnn_tpu.models import GCNConnectome
    from connectome_gnn_tpu.ops.fused_pallas import fused_gcn_forward

    graphs = generate_dataset(num_subjects=512, num_regions=84, seed=2)
    batch = collate_dense(graphs)
    edges = sum(g.num_edges for g in graphs)
    model = GCNConnectome(in_channels=5, hidden_dim=64, num_classes=2, num_layers=3)
    params, state = model.init(jax.random.PRNGKey(0))

    def step(x, adj, mask, eps, i):
        logits = fused_gcn_forward(params, state, x + eps, adj, mask, num_layers=3)
        return logits[0, 0]

    args = (batch.node_features, batch.adj, batch.node_mask.astype(jnp.float32))
    dt = device_loop_time(step, args, iters)
    N = int(batch.node_features.shape[1])
    return {
        "us_per_batch": dt * 1e6,
        "edge_msgs_per_s": 3 * edges / dt,
        "graphs_per_s": 512 / dt,
        **roofline(
            dt,
            flops=_gcn_dense_fwd_flops(512, N, [5, 64, 64, 64], 2),
            bytes_moved=_fused_fwd_bytes(512, N, 5),
        ),
    }


def bench_spmm_giant(num_nodes=262_144, avg_degree=16, feat=64, iters=8):
    """Config 5 (single-chip core op): CSR segment-sum SpMM edges/s."""
    rng = np.random.default_rng(0)
    num_edges = num_nodes * avg_degree
    receivers = np.sort(rng.integers(0, num_nodes, num_edges)).astype(np.int32)
    senders = rng.integers(0, num_nodes, num_edges).astype(np.int32)
    weights = rng.random(num_edges).astype(np.float32)
    x = rng.standard_normal((num_nodes, feat)).astype(np.float32)

    from connectome_gnn_tpu.ops import coo_spmm

    # SpMM is linear, so an additive input perturbation factors out and
    # XLA hoists the whole computation; chain iterations instead (the
    # output feeds the next input) to force `iters` sequential SpMMs.
    def spmm(x, w, s, r):
        return coo_spmm(w, s, r, x, num_nodes, indices_are_sorted=True)

    dt = chained_loop_time(
        spmm, jnp.asarray(x), iters,
        jnp.asarray(weights), jnp.asarray(senders), jnp.asarray(receivers),
    )
    # traffic model: COO arrays (w 4 + s 4 + r 4 bytes/edge) + per-edge
    # row gather and scatter-accumulate (E·F·4 each) + output rows.  The
    # tiny hbm_frac is the finding: this path is random-row LATENCY
    # bound (~11-14 ns/row, benchmarks/spmm_experiments.py), not
    # bandwidth bound — the reason the banded/hybrid family exists.
    model_bytes = num_edges * 12 + 2 * num_edges * feat * 4 + num_nodes * feat * 4
    return {
        "us_per_spmm": dt * 1e6,
        "edges_per_s": num_edges / dt,
        "num_nodes": num_nodes,
        "num_edges": num_edges,
        **roofline(dt, bytes_moved=model_bytes),
    }


def bench_spmm_banded(num_nodes=65_536, avg_degree=16, band_nodes=512,
                      feat=64, block=128, iters=30):
    """Config 5 (locality path): banded block-dense SpMM edges/s.

    Voxel-level connectomes are spatially local; after spatial/RCM
    ordering, edges live in a ±``band_nodes`` index band, so SpMM becomes
    batched dense matmuls on the MXU (see ops/banded.py).
    """
    from connectome_gnn_tpu.data import generate_spatial_graph
    from connectome_gnn_tpu.ops.banded import banded_spmm, to_banded

    g = generate_spatial_graph(num_nodes, degree=avg_degree, band=band_nodes,
                               num_features=feat, seed=0)
    num_edges = g.num_edges
    x = g.node_features
    a = to_banded(g.edge_index[0], g.edge_index[1], g.edge_weight,
                  num_nodes, block=block)

    from connectome_gnn_tpu.ops.banded import banded_spmm as _spmm

    # chained-iteration timing — see config 5 note on linear-op hoisting
    dt = chained_loop_time(
        lambda v, band: _spmm(a._replace(band=band), v),
        jnp.asarray(x), iters, a.band,
    )
    # traffic model: one band read + D window reads of x + one out write
    D = 2 * a.bandwidth + 1
    padded = a.num_blocks * a.block
    model_bytes = a.band.size * 4 + (D + 1) * padded * feat * 4
    return {
        "us_per_spmm": dt * 1e6,
        "edges_per_s": num_edges / dt,
        "band_blocks": D,
        "num_edges": num_edges,
        **roofline(dt, bytes_moved=model_bytes),
    }


def bench_spmm_banded_giant(num_nodes=1 << 20, degree=38, band_nodes=512,
                            feat=64, block=256, iters=10):
    """Config 5 at FULL north-star scale: ~1M nodes / ~40M edges banded.

    BASELINE.json config 5 names "a single giant voxel-level connectome
    (~1M nodes, ~40M edges)"; this measures the banded MXU SpMM there.
    The ~5.4 GB block band is constructed ON DEVICE (scatter-add of
    host-computed linear indices) — only 160 MB of indices cross the
    host↔device link, not the band itself.
    """
    rng = np.random.default_rng(0)
    E = num_nodes * degree
    receivers = np.repeat(np.arange(num_nodes, dtype=np.int64), degree)
    senders = np.clip(
        receivers + rng.integers(-band_nodes, band_nodes + 1, E), 0,
        num_nodes - 1,
    )
    W = -(-band_nodes // block)
    nb = num_nodes // block
    dcount = 2 * W + 1
    rb = receivers // block
    d = senders // block - rb + W
    lin = (
        ((rb * dcount + d) * block + receivers % block) * block
        + senders % block
    ).astype(np.int32)  # max index nb*dcount*block^2 < 2^31

    from connectome_gnn_tpu.ops.banded import BandedMatrix, banded_spmm

    @jax.jit
    def build(lin_idx, key):
        w = jax.random.uniform(key, (E,), jnp.float32)
        flat = jnp.zeros(nb * dcount * block * block, jnp.float32)
        return flat.at[lin_idx].add(w).reshape(nb, dcount, block, block)

    band = build(jnp.asarray(lin), jax.random.PRNGKey(0))
    a = BandedMatrix(band, num_nodes, W)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (num_nodes, feat), jnp.float32)

    dt = chained_loop_time(
        lambda v, b: banded_spmm(a._replace(band=b), v), x0, iters, band
    )
    band_gb = band.size * 4 / 1e9
    model_bytes = band.size * 4 + (dcount + 1) * nb * block * feat * 4
    return {
        "ms_per_spmm": dt * 1e3,
        "edges_per_s": E / dt,
        "band_traffic_gb_per_s": band_gb / dt,
        "num_nodes": num_nodes,
        "num_edges": E,
        **roofline(dt, bytes_moved=model_bytes),
    }


def bench_spmm_banded_giant_quant(num_nodes=1 << 20, degree=38,
                                  band_nodes=512, feat=64, block=256,
                                  rows_per_step=8, iters=10):
    """Config 5 full scale through the int8-quantized band Pallas kernel.

    Same geometry as 5d; the f32 band is quantized per tile on device
    (ops/banded_quant.py), correctness vs the f32 SpMM is asserted
    (≲1% relative for int8 per-tile quantization; per-entry analytic
    bound in tests/test_banded_quant.py), the f32 band is freed, and the
    kernel is timed with the 5d methodology.  Band traffic is 4× lower
    (int8) and activation traffic 2× lower (bf16) than the f32 path —
    the credible way past its ~88%-of-HBM-peak ceiling.
    """
    import importlib

    quant_exp = importlib.import_module("benchmarks.quant_experiments")
    from connectome_gnn_tpu.ops.banded import banded_spmm
    from connectome_gnn_tpu.ops.banded_quant import (
        QuantizedBandedMatrix,
        banded_spmm_quant,
        quantize_band,
    )

    a, E = quant_exp.build_band(num_nodes, degree, band_nodes, block)
    x0 = jax.random.normal(
        jax.random.PRNGKey(1), (num_nodes, feat), jnp.float32
    )
    q = quantize_band(a)
    ref = banded_spmm(a, x0)
    rel = float(
        jnp.linalg.norm(banded_spmm_quant(q, x0, rows_per_step=rows_per_step)
                        - ref)
        / jnp.linalg.norm(ref)
    )
    assert rel < 2e-2, f"quant kernel error {rel} out of bound"
    del ref
    a.band.delete()

    dt = chained_loop_time(
        lambda v, bq, s: banded_spmm_quant(
            QuantizedBandedMatrix(bq, s, q.num_nodes, q.bandwidth),
            v, rows_per_step=rows_per_step,
        ),
        x0, iters, q.band_q, q.scales,
    )
    # traffic model: int8 band + scales + K shifted bf16 x refs + f32 out
    W = q.bandwidth
    padded = q.num_blocks * q.block
    K = 1 + -(-2 * W // rows_per_step)
    model_bytes = (
        q.band_q.size + q.scales.size * 4
        + K * padded * feat * 2 + padded * feat * 4
    )
    return {
        "ms_per_spmm": dt * 1e3,
        "edges_per_s": E / dt,
        "rel_err_vs_f32": rel,
        "num_nodes": num_nodes,
        "num_edges": E,
        **roofline(dt, bytes_moved=model_bytes),
    }


def bench_spmm_banded_giant_quant_fm(num_nodes=1 << 20, degree=38,
                                     band_nodes=512, feat=64, block=256,
                                     rows_per_step=16, iters=10):
    """5q through the FEATURE-MAJOR manual-DMA kernel
    (ops/banded_quant.py banded_spmm_quant_fm): activations live as
    [F, N] — the layout a persistent serving stack keeps — and the
    kernel drives its own double-buffered HBM→VMEM pipeline, sidestepping
    Mosaic's per-grid-step overhead (QUANT_r02.json).  Timed on the
    feature-major loop state; the one-time tile transpose happens at
    prepare time, outside the loop.
    """
    import importlib

    quant_exp = importlib.import_module("benchmarks.quant_experiments")
    from connectome_gnn_tpu.ops.banded import banded_spmm
    from connectome_gnn_tpu.ops.banded_quant import (
        QuantizedBandedMatrixFM,
        banded_spmm_quant_fm,
        quantize_band,
        to_feature_major,
    )

    a, E = quant_exp.build_band(num_nodes, degree, band_nodes, block)
    x0 = jax.random.normal(
        jax.random.PRNGKey(1), (num_nodes, feat), jnp.float32
    )
    q_fm = to_feature_major(quantize_band(a))
    x0T = jnp.asarray(x0.T)
    ref = banded_spmm(a, x0)
    rel = float(
        jnp.linalg.norm(
            banded_spmm_quant_fm(q_fm, x0T, rows_per_step=rows_per_step).T
            - ref
        )
        / jnp.linalg.norm(ref)
    )
    assert rel < 2e-2, f"fm quant kernel error {rel} out of bound"
    del ref, x0
    a.band.delete()

    dt = chained_loop_time(
        lambda vT, bqT, s: banded_spmm_quant_fm(
            QuantizedBandedMatrixFM(bqT, s, q_fm.num_nodes, q_fm.bandwidth),
            vT, rows_per_step=rows_per_step,
        ),
        x0T, iters, q_fm.band_qT, q_fm.scales,
    )
    # traffic model: int8 band + scales + overlapping bf16 x windows
    # ((R+2W)/R× re-read) + f32 out
    W = q_fm.bandwidth
    padded = q_fm.num_blocks * q_fm.block
    model_bytes = (
        q_fm.band_qT.size + q_fm.scales.size * 4
        + (rows_per_step + 2 * W) / rows_per_step * padded * feat * 2
        + padded * feat * 4
    )
    return {
        "ms_per_spmm": dt * 1e3,
        "edges_per_s": E / dt,
        "rel_err_vs_f32": rel,
        "num_nodes": num_nodes,
        "num_edges": E,
        **roofline(dt, bytes_moved=model_bytes),
    }


def bench_spmm_banded_giant_quant_fm_w8a8(num_nodes=1 << 20, degree=38,
                                          band_nodes=512, feat=64,
                                          block=256, rows_per_step=32,
                                          iters=10):
    """5q8: the w8a8 serving kernel at full config-5 scale — int8 band ×
    per-block int8 activations through native int8 MXU dots
    (ops/banded_quant.banded_spmm_quant_fm_w8a8).  Measured 97% of its
    traffic-ideal: the bf16-activation kernel's dequant relayouts
    contended with the DMA streams; this one has none
    (FM_DIAG_r03.json).  The timed loop re-quantizes the activations
    every iteration — the honest per-SpMM serving cost.
    """
    import importlib

    quant_exp = importlib.import_module("benchmarks.quant_experiments")
    from connectome_gnn_tpu.ops.banded import banded_spmm
    from connectome_gnn_tpu.ops.banded_quant import (
        QuantizedBandedMatrixFM,
        banded_spmm_quant_fm_w8a8,
        quantize_band,
        to_feature_major,
    )

    a, E = quant_exp.build_band(num_nodes, degree, band_nodes, block)
    x0 = jax.random.normal(
        jax.random.PRNGKey(1), (num_nodes, feat), jnp.float32
    )
    q_fm = to_feature_major(quantize_band(a))
    x0T = jnp.asarray(x0.T)
    ref = banded_spmm(a, x0)
    rel = float(
        jnp.linalg.norm(
            banded_spmm_quant_fm_w8a8(
                q_fm, x0T, rows_per_step=rows_per_step
            ).T - ref
        )
        / jnp.linalg.norm(ref)
    )
    assert rel < 3e-2, f"w8a8 kernel error {rel} out of bound"
    del ref, x0
    a.band.delete()

    dt = chained_loop_time(
        lambda vT, bqT, s: banded_spmm_quant_fm_w8a8(
            QuantizedBandedMatrixFM(bqT, s, q_fm.num_nodes, q_fm.bandwidth),
            vT, rows_per_step=rows_per_step,
        ),
        x0T, iters, q_fm.band_qT, q_fm.scales,
    )
    W = q_fm.bandwidth
    padded = q_fm.num_blocks * q_fm.block
    model_bytes = (
        q_fm.band_qT.size + q_fm.scales.size * 4
        + (rows_per_step + 2 * W) / rows_per_step * padded * feat * 1
        + padded * feat * 4
        # plus the in-loop requantization pass (read f32 + write int8)
        + padded * feat * 5
    )
    return {
        "ms_per_spmm": dt * 1e3,
        "edges_per_s": E / dt,
        "rel_err_vs_f32": rel,
        "num_nodes": num_nodes,
        "num_edges": E,
        **roofline(dt, bytes_moved=model_bytes),
    }


def bench_giant_model_serving(num_nodes=1 << 20, degree=38, band_nodes=512,
                              feat=64, hidden=64, num_layers=2, block=256,
                              iters=10, w8a8=False):
    """Whole-model int8 serving at the 1M-node config: BandedNodeGCN
    ``prepare_quantized`` (feature-major) + jitted ``apply_quantized`` —
    the product-level number behind the 5qm kernel row (per step:
    ``num_layers`` fm SpMMs + weight matmuls + eval-BN + head, activations
    kept [F, N] throughout)."""
    import importlib

    quant_exp = importlib.import_module("benchmarks.quant_experiments")
    from connectome_gnn_tpu.models import BandedNodeGCN

    a, E = quant_exp.build_band(num_nodes, degree, band_nodes, block)
    x = jax.random.normal(
        jax.random.PRNGKey(1), (num_nodes, feat), jnp.float32
    )
    model = BandedNodeGCN(
        in_channels=feat, hidden_dim=hidden, num_classes=2,
        num_layers=num_layers,
    )
    params, state = model.init(jax.random.PRNGKey(0))
    adj_q, dinv = model.prepare_quantized(a)
    a.band.delete()

    def step(params, state, adj_band, scales, dinv, x, eps, i):
        from connectome_gnn_tpu.ops.banded_quant import (
            QuantizedBandedMatrixFM,
        )

        q = QuantizedBandedMatrixFM(
            adj_band, scales, adj_q.num_nodes, adj_q.bandwidth
        )
        logits, _ = model.apply_quantized(
            params, state, q, dinv, x + eps, w8a8=w8a8
        )
        return jnp.sum(logits)

    dt = device_loop_time(
        step, (params, state, adj_q.band_qT, adj_q.scales, dinv, x), iters
    )
    # traffic model: per layer one fm-kernel pass (int8 band + bf16 x
    # windows at R=32 + f32 out) — weight matmuls/BN/head fuse into the
    # stream and add no independent HBM traffic at F=64
    W = adj_q.bandwidth
    padded = adj_q.num_blocks * adj_q.block
    R = 32
    xb = 1 if w8a8 else 2  # int8 vs bf16 activation windows
    requant = padded * hidden * 5 if w8a8 else 0  # f32 read + int8 write
    model_bytes = num_layers * (
        adj_q.band_qT.size + adj_q.scales.size * 4
        + (R + 2 * W) / R * padded * hidden * xb + padded * hidden * 4
        + requant
    )
    return {
        "ms_per_forward": dt * 1e3,
        "edge_msgs_per_s": num_layers * E / dt,
        "num_nodes": num_nodes,
        "num_edges": E,
        "num_layers": num_layers,
        **roofline(dt, bytes_moved=model_bytes),
    }


def bench_spmm_hybrid(num_nodes=65_536, avg_degree=16, band_nodes=512,
                      shortcut_frac=0.1, feat=64, block=128, iters=20):
    """Config 5 (realistic locality): hybrid band+remainder SpMM edges/s.

    90% of edges live in a ±``band_nodes`` band (spatial bulk), 10% are
    uniform long-range shortcuts (small-world) — pure banding rejects this
    graph; the hybrid routes the bulk through the MXU and only the
    shortcuts through scatter.
    """
    from connectome_gnn_tpu.data import generate_spatial_graph
    from connectome_gnn_tpu.ops.banded import hybrid_spmm, to_hybrid

    g = generate_spatial_graph(num_nodes, degree=avg_degree, band=band_nodes,
                               num_features=feat, seed=0,
                               shortcut_frac=shortcut_frac)
    num_edges = g.num_edges
    x = g.node_features
    h = to_hybrid(g.edge_index[0], g.edge_index[1], g.edge_weight,
                  num_nodes, block=block, bandwidth=-(-band_nodes // block))
    rem = int((np.asarray(h.remainder_weights) > 0).sum())

    def spmm(v, band, rs, rr, rw):
        h2 = h._replace(band=h.band._replace(band=band),
                        remainder_senders=rs, remainder_receivers=rr,
                        remainder_weights=rw)
        return hybrid_spmm(h2, v)

    dt = chained_loop_time(
        spmm, jnp.asarray(x), iters,
        h.band.band, h.remainder_senders, h.remainder_receivers,
        h.remainder_weights,
    )
    # traffic model: banded bulk (band + D x-windows + out) + remainder
    # COO/gather/scatter bytes.  The remainder is latency-bound, so the
    # composite hbm_frac understates how close the BAND part runs to
    # peak — the remainder fraction is the lever (see auto_layout).
    D = 2 * h.band.bandwidth + 1
    padded = h.band.num_blocks * h.band.block
    rem_cap = int(h.remainder_weights.shape[0])
    model_bytes = (
        h.band.band.size * 4 + (D + 1) * padded * feat * 4
        + rem_cap * 12 + 2 * rem_cap * feat * 4
    )
    return {
        "us_per_spmm": dt * 1e6,
        "edges_per_s": num_edges / dt,
        "remainder_edges": rem,
        "num_edges": num_edges,
        **roofline(dt, bytes_moved=model_bytes),
    }


def bench_train_step(iters=100):
    """Training throughput: GCN fwd+bwd+Adam at bs=512 (dense layout)."""
    from connectome_gnn_tpu.data import collate_dense, generate_dataset
    from connectome_gnn_tpu.models import GCNConnectome

    graphs = generate_dataset(num_subjects=512, num_regions=84, seed=4)
    batch = collate_dense(graphs)
    model = GCNConnectome(in_channels=5, hidden_dim=64, num_classes=2, num_layers=3)
    params, state = model.init(jax.random.PRNGKey(0))
    opt = optax.chain(optax.add_decayed_weights(1e-4), optax.adam(1e-3))
    opt_state = opt.init(params)

    import dataclasses

    def step_fn(params, state, opt_state, x, eps):
        b = dataclasses.replace(batch, node_features=x + eps)

        def loss_fn(p):
            logits, new_state = model.apply(
                p, state, b, train=True, rng=jax.random.PRNGKey(0)
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, b.labels)
            m = b.label_mask.astype(jnp.float32)
            return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0), new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state, new_opt, loss

    # chain steps on-device: carry params/opt_state through the loop
    def looped(params, state, opt_state, x, k):
        def body(i, carry):
            p, s, o = carry
            eps = i.astype(jnp.float32) * jnp.float32(1e-30)
            p, s, o, _ = step_fn(p, s, o, x, eps)
            return (p, s, o)

        return jax.lax.fori_loop(0, k, body, (params, state, opt_state))

    args = (params, state, opt_state, batch.node_features)

    def make(k):
        def outer(*args):
            p, s, o = looped(*args, k)
            return jnp.sum(p["head"]["fc2"]["bias"])

        return jax.jit(outer).lower(*args).compile()

    k_small = max(iters // 4, 1)
    c_full, c_small = make(iters), make(k_small)
    _fetch(c_full(*args))
    _fetch(c_small(*args))

    def timed(c):
        t0 = time.perf_counter()
        _fetch(c(*args))
        return time.perf_counter() - t0

    t_small = min(timed(c_small) for _ in range(2))
    t_full = min(timed(c_full) for _ in range(2))
    dt = max(t_full - t_small, 1e-12) / (iters - k_small)

    # ------------------------------------------------------------------
    # Decomposition (VERDICT r3 #6): attribute the step.  Time the same
    # shapes as (a) forward-only loss and (b) value_and_grad with every
    # grad leaf consumed but no optimizer update; the remainder of the
    # full step is the optimizer.  Same anti-hoist chained-loop
    # discipline as the full step (`device_loop_time`).
    def fwd_only(x, eps, i):
        b = dataclasses.replace(batch, node_features=x + eps)
        logits, _ = model.apply(
            p_const, state, b, train=True, rng=jax.random.PRNGKey(0)
        )
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, b.labels)
        m = b.label_mask.astype(jnp.float32)
        return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)

    def fwd_bwd(x, eps, i):
        b = dataclasses.replace(batch, node_features=x + eps)

        def loss_fn(p):
            logits, new_state = model.apply(
                p, state, b, train=True, rng=jax.random.PRNGKey(0)
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, b.labels)
            m = b.label_mask.astype(jnp.float32)
            return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0), new_state

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p_const)
        # consume EVERY grad leaf so XLA cannot dead-code any backward branch
        gsum = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
        return loss + jnp.float32(1e-12) * gsum

    p_const = params
    x_arg = (batch.node_features,)
    dt_fwd = device_loop_time(fwd_only, x_arg, iters)
    dt_fb = device_loop_time(fwd_bwd, x_arg, iters)

    # flops model: fwd + bwd ≈ 3× the forward matmul work (standard rule:
    # backward does ~2× forward's matmul flops); bytes model in
    # `_gcn_dense_train_bytes` (unfused XLA-dense path, algorithmic min)
    N = int(batch.node_features.shape[1])
    fwd = _gcn_dense_fwd_flops(512, N, [5, 64, 64, 64], 2)
    return {
        "us_per_step": dt * 1e6,
        "graphs_per_s": 512 / dt,
        "us_fwd": dt_fwd * 1e6,
        "us_bwd": max(dt_fb - dt_fwd, 0.0) * 1e6,
        "us_opt": max(dt - dt_fb, 0.0) * 1e6,
        **roofline(
            dt,
            flops=3 * fwd,
            bytes_moved=_gcn_dense_train_bytes(512, N, [5, 64, 64, 64]),
        ),
    }


def bench_banded_train_giant(num_nodes=1 << 20, degree=38, band_nodes=512,
                             feat=64, hidden=64, num_layers=2, block=256,
                             iters=6):
    """Config 5t: giant-graph TRAINING step at full north-star scale.

    The missing headline VERDICT r2 #2 named: fwd+bwd+Adam on a
    node-level :class:`BandedNodeGCN` over the 1M-node / 40M-edge band
    (same geometry as 5d), GCN normalization hoisted once via
    ``prepare``/``apply_normalized``.  XLA derives dx as the
    transposed-band einsum, so each step streams the 5.4 GB f32 band
    ~2·L times — HBM-bound like 5d, with BN/ReLU/CE riding along.
    Reference loop being scaled: `/root/reference/connectome_gnn/
    train.py:41-54`.
    """
    import importlib

    quant_exp = importlib.import_module("benchmarks.quant_experiments")
    from connectome_gnn_tpu.models import BandedNodeGCN
    from connectome_gnn_tpu.ops.banded import BandedMatrix

    a, E = quant_exp.build_band(num_nodes, degree, band_nodes, block)
    model = BandedNodeGCN(in_channels=feat, hidden_dim=hidden,
                          num_classes=2, num_layers=num_layers)
    params, state = model.init(jax.random.PRNGKey(0))
    adj_norm, dinv = model.prepare(a)
    a.band.delete()
    W = adj_norm.bandwidth
    x = jax.random.normal(
        jax.random.PRNGKey(1), (num_nodes, feat), jnp.float32
    )
    labels = jax.random.bernoulli(
        jax.random.PRNGKey(2), 0.5, (num_nodes,)
    ).astype(jnp.int32)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def step(carry, band, dinv, x, labels, eps, i):
        p, s, o = carry
        adj = BandedMatrix(band, num_nodes, W)

        def loss_fn(p):
            logits, new_s = model.apply_normalized(
                p, s, adj, dinv, x + eps, train=True
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            )
            return jnp.mean(ce), new_s

        (_, new_s), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, new_o = opt.update(grads, o, p)
        return (optax.apply_updates(p, updates), new_s, new_o)

    dt = carried_loop_time(
        step, (params, state, opt_state),
        (adj_norm.band, dinv, x, labels), iters,
        lambda c: jnp.sum(c[0]["head"]["kernel"]),
    )
    # traffic model: per layer, fwd reads band + D x-windows + writes out;
    # bwd re-reads the band (transposed einsum) + writes the windowed
    # cotangent + segment-sums it back — band traffic dominates at 5.4 GB/pass
    D = 2 * W + 1
    padded = adj_norm.num_blocks * adj_norm.block
    model_bytes = num_layers * (
        2 * adj_norm.band.size * 4 + 3 * (D + 1) * padded * hidden * 4
    )
    return {
        "ms_per_step": dt * 1e3,
        "edges_per_s": num_layers * E / dt,
        "band_passes_per_step": 2 * num_layers,
        "num_nodes": num_nodes,
        "num_edges": E,
        **roofline(dt, bytes_moved=model_bytes),
    }


def bench_banded_train_giant_quant(num_nodes=1 << 20, degree=38,
                                   band_nodes=512, feat=64, hidden=64,
                                   num_layers=2, block=256, iters=6,
                                   interpret=False):
    """Config 5tq: giant-graph training through the int8-band custom-VJP
    path — forward reads the quantized band, backward reads the quantized
    TRANSPOSE (``ops/banded_quant.banded_spmm_quant_fm_grad``), both via
    the feature-major manual-DMA kernel; 4× less band HBM traffic each
    way than 5t.  Gradient error carries the ~1% quantization bound
    (tests/test_banded_quant.py); the 8-step Adam trajectory tracks f32
    within 0.05 loss.
    """
    import importlib

    quant_exp = importlib.import_module("benchmarks.quant_experiments")
    from connectome_gnn_tpu.models import BandedNodeGCN
    from connectome_gnn_tpu.ops.banded import gcn_normalize_banded
    from connectome_gnn_tpu.ops.banded_quant import (
        QuantizedBandedMatrixFM,
        quantize_band,
        to_feature_major,
        transpose_quantized,
    )

    a, E = quant_exp.build_band(num_nodes, degree, band_nodes, block)
    model = BandedNodeGCN(in_channels=feat, hidden_dim=hidden,
                          num_classes=2, num_layers=num_layers)
    params, state = model.init(jax.random.PRNGKey(0))
    adj_norm, dinv = gcn_normalize_banded(a)
    a.band.delete()
    # quantize once, transpose the int8 band — peak HBM ~7 GB instead of
    # ~16 (transposing the f32 band does not co-fit the normalized band)
    q_row = quantize_band(adj_norm)
    _fetch(q_row.scales)
    adj_norm.band.delete()
    q = to_feature_major(q_row)
    qT = to_feature_major(transpose_quantized(q_row))
    _fetch(qT.scales)
    q_row.band_q.delete()

    x = jax.random.normal(
        jax.random.PRNGKey(1), (num_nodes, feat), jnp.float32
    )
    labels = jax.random.bernoulli(
        jax.random.PRNGKey(2), 0.5, (num_nodes,)
    ).astype(jnp.int32)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    nn_, bw_ = q.num_nodes, q.bandwidth

    def step(carry, band_qT, scales, bandT_qT, scalesT, dinv, x, labels,
             eps, i):
        p, s, o = carry
        adj_q = QuantizedBandedMatrixFM(band_qT, scales, nn_, bw_)
        adj_qT = QuantizedBandedMatrixFM(bandT_qT, scalesT, nn_, bw_)

        def loss_fn(p):
            logits, new_s = model.apply_quant_trainable(
                p, s, adj_q, adj_qT, dinv, x + eps, train=True,
                interpret=interpret,
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            )
            return jnp.mean(ce), new_s

        (_, new_s), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, new_o = opt.update(grads, o, p)
        return (optax.apply_updates(p, updates), new_s, new_o)

    dt = carried_loop_time(
        step, (params, state, opt_state),
        (q.band_qT, q.scales, qT.band_qT, qT.scales, dinv, x, labels),
        iters,
        lambda c: jnp.sum(c[0]["head"]["kernel"]),
    )
    # traffic model: per layer one int8 fwd pass + one int8 bwd pass
    # (band + bf16 x windows at R=32 + f32 out each) + BN/act residuals
    W = bw_
    D = 2 * W + 1
    padded = q.num_blocks * q.block
    R = 32
    pass_bytes = (
        q.band_qT.size + q.scales.size * 4
        + (R + 2 * W) / R * padded * hidden * 2 + padded * hidden * 4
    )
    model_bytes = num_layers * (2 * pass_bytes + 4 * padded * hidden * 4)
    return {
        "ms_per_step": dt * 1e3,
        "edges_per_s": num_layers * E / dt,
        "band_passes_per_step": 2 * num_layers,
        "num_nodes": num_nodes,
        "num_edges": E,
        **roofline(dt, bytes_moved=model_bytes),
    }


def bench_banded_train_giant_quant_blocked(num_nodes=1 << 20, degree=38,
                                           band_nodes=512, feat=64,
                                           hidden=64, num_layers=2,
                                           block=256, iters=6):
    """Config 5tqb: the int8-band train step through the BLOCKED
    contiguous-DMA kernels (``apply_quant_trainable_blocked``): all four
    band passes run FM_DIAG_r03's ``fm_blocked`` layout ([NB, F, block]
    leading-dim DMA slabs instead of F-segment strided copies) via the
    same transposed-band custom VJP, activations staying blocked between
    layers.  Zero extra quantization error vs 5tq; the per-pass win is
    ~1.25× (TRAIN_DIAG_r04.json carries the full step attribution).
    """
    import importlib

    quant_exp = importlib.import_module("benchmarks.quant_experiments")
    from connectome_gnn_tpu.models import BandedNodeGCN
    from connectome_gnn_tpu.ops.banded import gcn_normalize_banded
    from connectome_gnn_tpu.ops.banded_quant import (
        QuantizedBandedMatrixFM,
        quantize_band,
        to_feature_major,
        transpose_quantized,
    )

    a, E = quant_exp.build_band(num_nodes, degree, band_nodes, block)
    model = BandedNodeGCN(in_channels=feat, hidden_dim=hidden,
                          num_classes=2, num_layers=num_layers)
    params, state = model.init(jax.random.PRNGKey(0))
    adj_norm, dinv = gcn_normalize_banded(a)
    a.band.delete()
    q_row = quantize_band(adj_norm)
    _fetch(q_row.scales)
    adj_norm.band.delete()
    q = to_feature_major(q_row)
    qT = to_feature_major(transpose_quantized(q_row))
    _fetch(qT.scales)
    q_row.band_q.delete()

    x = jax.random.normal(
        jax.random.PRNGKey(1), (num_nodes, feat), jnp.float32
    )
    labels = jax.random.bernoulli(
        jax.random.PRNGKey(2), 0.5, (num_nodes,)
    ).astype(jnp.int32)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    nn_, bw_ = q.num_nodes, q.bandwidth

    def step(carry, band_qT, scales, bandT_qT, scalesT, dinv, x, labels,
             eps, i):
        p, s, o = carry
        adj_q = QuantizedBandedMatrixFM(band_qT, scales, nn_, bw_)
        adj_qT = QuantizedBandedMatrixFM(bandT_qT, scalesT, nn_, bw_)

        def loss_fn(p):
            logits, new_s = model.apply_quant_trainable_blocked(
                p, s, adj_q, adj_qT, dinv, x + eps, train=True,
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            )
            return jnp.mean(ce), new_s

        (_, new_s), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, new_o = opt.update(grads, o, p)
        return (optax.apply_updates(p, updates), new_s, new_o)

    dt = carried_loop_time(
        step, (params, state, opt_state),
        (q.band_qT, q.scales, qT.band_qT, qT.scales, dinv, x, labels),
        iters,
        lambda c: jnp.sum(c[0]["head"]["kernel"]),
    )
    W = bw_
    padded = q.num_blocks * q.block
    R = 32
    pass_bytes = (
        q.band_qT.size + q.scales.size * 4
        + (R + 2 * W) / R * padded * hidden * 2 + padded * hidden * 4
    )
    model_bytes = num_layers * (2 * pass_bytes + 4 * padded * hidden * 4)
    return {
        "ms_per_step": dt * 1e3,
        "edges_per_s": num_layers * E / dt,
        "band_passes_per_step": 2 * num_layers,
        "num_nodes": num_nodes,
        "num_edges": E,
        **roofline(dt, bytes_moved=model_bytes),
    }


def _sampled_graph(num_nodes, degree):
    """Spatial+shortcut giant graph with a learnable neighborhood-mean
    label (shared by the S benches)."""
    import numpy as np

    from connectome_gnn_tpu.data import generate_spatial_graph

    g = generate_spatial_graph(num_nodes, degree=degree, band=512, seed=0,
                               shortcut_frac=0.1)
    src, dst = g.edge_index
    num = np.zeros(num_nodes)
    den = np.zeros(num_nodes)
    np.add.at(num, dst, g.edge_weight * g.node_features[src, 0])
    np.add.at(den, dst, g.edge_weight)
    labels = ((num / (den + 1e-8)) > 0).astype(np.int32)
    return g, labels


def bench_sampled_train(num_nodes=262_144, degree=16, batch=1024,
                        fanout=(10, 10), steps=30, compare_prefetch=True):
    """Config S: TRUE end-to-end sampled-minibatch training throughput.

    This measures the Trainer's real epoch path, host work INCLUDED in
    the timed region: per step the native C++ neighbor sampler draws a
    fanout subgraph, collation packs it to static shapes, the batch
    crosses host→device, and the jitted train step runs.  The loader is
    wrapped in the product ``PrefetchIterator`` exactly as
    ``Trainer.fit`` wraps it, so sampling/collation of step k+1 overlap
    step k's device compute.  With ``compare_prefetch`` the synchronous
    (depth-0) time is also reported — the delta is the measured overlap
    win (VERDICT r2 weak #1).
    """
    import numpy as np

    from connectome_gnn_tpu.data import SampledNodeLoader
    from connectome_gnn_tpu.models import NodeGCN
    from connectome_gnn_tpu.train import Trainer

    g, labels = _sampled_graph(num_nodes, degree)

    def run(prefetch_depth, measure_steps):
        loader = SampledNodeLoader(
            g, labels, batch_size=batch, fanout=fanout, seed=0,
            drop_last=True, shuffle=True,
        )
        trainer = Trainer(
            NodeGCN(in_channels=5, hidden_dim=64, num_layers=len(fanout)),
            prefetch_depth=prefetch_depth,
        )
        it = trainer._iterate(loader)

        def one(b):
            (trainer.params, trainer.state, trainer.opt_state,
             trainer._rng, loss, _, _) = trainer._train_step(
                trainer.params, trainer.state, trainer.opt_state,
                trainer._rng, b,
            )
            return loss

        edges = 0.0
        for _ in range(3):  # compile + warm the prefetch pipeline
            b = next(it)
            # real-edge count from the warmup batches only (a per-step
            # host count inside the timed region would force a sync)
            edges += float((np.asarray(b.edge_weight) > 0).sum())
            _fetch(one(b))
        t0 = time.perf_counter()
        loss = None
        for _ in range(measure_steps):
            loss = one(next(it))
        _fetch(loss)  # epoch-level sync, like Trainer.train_epoch
        dt = (time.perf_counter() - t0) / measure_steps
        if hasattr(it, "close"):
            it.close()
        return dt, edges / 3.0

    steps = min(steps, num_nodes // batch - 4)
    dt, real_edges = run(2, steps)
    out = {
        "ms_per_step": dt * 1e3,
        "steps_per_s": 1.0 / dt,
        "seed_nodes_per_s": batch / dt,
        "sampled_edges_per_s": real_edges / dt,
        "avg_sampled_edges": real_edges,
        "num_nodes": num_nodes,
    }
    if compare_prefetch:
        dt0, _ = run(0, steps)
        out["ms_per_step_no_prefetch"] = dt0 * 1e3
        out["prefetch_speedup"] = dt0 / dt
    return out


def bench_device_sampled_train(num_nodes=262_144, degree=16, batch=1024,
                               fanout=(10, 10), steps=30, family="gcn",
                               dedup=True):
    """Config SD: end-to-end sampled training with DEVICE-SIDE sampling.

    The graph (CSR + features) is resident in HBM
    (`data/device_sampling.py`); per step only an ~8 KB SeedBatch crosses
    the link, and sampling fuses into the jitted train step.  Same
    protocol as config S (host work INCLUDED, epoch-level sync) — the
    delta vs S is the measured cost of host-built batches on this
    link-constrained runtime.  ``family`` picks the blocked GCN or SAGE
    stack (config SDS)."""
    import numpy as np

    from connectome_gnn_tpu.data import (device_sampled_gcn,
                                         device_sampled_sage)
    from connectome_gnn_tpu.train import Trainer

    g, labels = _sampled_graph(num_nodes, degree)
    if family == "gcn":
        model = device_sampled_gcn(g, hidden_dim=64, fanout=fanout)
    else:
        model = device_sampled_sage(
            g, hidden_dim=64, fanout=fanout, dedup=dedup
        )
    loader = model.make_loader(
        np.arange(num_nodes), labels, batch_size=batch, seed=0,
        drop_last=True,
    )
    trainer = Trainer(model, prefetch_depth=2)
    it = trainer._iterate(loader)

    def one(b):
        (trainer.params, trainer.state, trainer.opt_state,
         trainer._rng, loss, _, _) = trainer._train_step(
            trainer.params, trainer.state, trainer.opt_state,
            trainer._rng, b,
        )
        return loss

    # real sampled-edge count: draw a few batches through the sampler
    # alone (outside the timed loop) and count weight>0 edges.  MUST be
    # jitted — eager device_sample dispatches every sort/top_k/gather as
    # its own tunnel round-trip on this runtime and takes minutes.
    from connectome_gnn_tpu.data import device_sample
    import jax as _jax

    @_jax.jit
    def _count(csr, seeds, key_data):
        s = device_sample(
            csr, seeds, _jax.random.wrap_key_data(key_data), fanout,
            dedup=dedup,
        )
        return (s.edge_weight > 0).sum()

    edges = 0.0
    for k in range(3):
        sb = next(iter(model.make_loader(
            np.arange(num_nodes), labels, batch_size=batch, seed=k,
            drop_last=True,
        )))
        edges += _fetch(_count(model.csr, sb.seeds, sb.key_data))
    edges /= 3.0

    for _ in range(3):  # compile + warm
        _fetch(one(next(it)))
    steps = min(steps, num_nodes // batch - 4)
    t0 = time.perf_counter()
    loss = None
    for _ in range(steps):
        loss = one(next(it))
    _fetch(loss)
    dt = (time.perf_counter() - t0) / steps
    if hasattr(it, "close"):
        it.close()
    return {
        "ms_per_step": dt * 1e3,
        "steps_per_s": 1.0 / dt,
        "seed_nodes_per_s": batch / dt,
        "sampled_edges_per_s": edges / dt,
        "avg_sampled_edges": edges,
        "num_nodes": num_nodes,
    }


def bench_device_sampled_dp(num_nodes=262_144, degree=16, batch=1024,
                            fanout=(10, 10), steps=30, family="gcn",
                            dedup=True):
    """Config SDP: device-sampled training COMPOSED with the DP mesh
    layer (VERDICT r3 #1): CSR replicated over a ``("data",)`` mesh of
    every visible device, stacked seed rows sharded, sampling fused into
    the shard_map step (`parallel/sampled_dp.py`), driven through the
    mesh-mode Trainer exactly as a user would.  On this rig the mesh has
    ONE real chip — the number measures the composed path's overhead vs
    config SD (shard_map + stacked loader + replicated-csr plumbing);
    the N>1 numerics/comm side is proven in benchmarks/multiprocess.py
    (device_sampled_dp program, gloo).  ``family``/``dedup`` compose the
    SAGE multiset mode through the mesh (config SDMP)."""
    import numpy as np

    from connectome_gnn_tpu.data import (device_sampled_gcn,
                                         device_sampled_sage)
    from connectome_gnn_tpu.parallel import create_mesh
    from connectome_gnn_tpu.train import Trainer

    g, labels = _sampled_graph(num_nodes, degree)
    if family == "gcn":
        model = device_sampled_gcn(g, hidden_dim=64, fanout=fanout)
    else:
        model = device_sampled_sage(
            g, hidden_dim=64, fanout=fanout, dedup=dedup
        )
    mesh = create_mesh(axis_names=("data",))
    D = int(mesh.shape["data"])
    loader = model.make_loader(
        np.arange(num_nodes), labels, batch_size=batch, seed=0,
        num_shards=D, drop_last=True,
    )
    trainer = Trainer(model, mesh=mesh, prefetch_depth=2)
    it = trainer._iterate(loader)

    def one(b):
        step = trainer._device_sampled_dp_step(b.labeled, train=True)
        trainer._rng, key = jax.random.split(trainer._rng)
        (trainer.params, trainer.state, trainer.opt_state, loss, _, _,
         ) = step(
            trainer.params, trainer.state, trainer.opt_state, key,
            b.packed, trainer._replicated_csr(b),
        )
        return loss

    # sampled-edge count: same jitted counter as SD, per shard row
    from connectome_gnn_tpu.data import device_sample
    from connectome_gnn_tpu.data.device_sampling import SeedBatch

    @jax.jit
    def _count(csr, seeds, key_data):
        s = device_sample(
            csr, seeds, jax.random.wrap_key_data(key_data), fanout,
            dedup=dedup,
        )
        return (s.edge_weight > 0).sum()

    edges = 0.0
    sb = next(iter(model.make_loader(
        np.arange(num_nodes), labels, batch_size=batch, seed=9,
        num_shards=D, drop_last=True,
    )))
    for row in np.asarray(sb.packed):
        rb = SeedBatch(packed=jnp.asarray(row), num_seeds=sb.num_seeds)
        edges += _fetch(_count(model.csr, rb.seeds, rb.key_data))

    for _ in range(3):  # compile + warm
        _fetch(one(next(it)))
    steps = min(steps, num_nodes // batch - 4)
    t0 = time.perf_counter()
    loss = None
    for _ in range(steps):
        loss = one(next(it))
    _fetch(loss)
    dt = (time.perf_counter() - t0) / steps
    if hasattr(it, "close"):
        it.close()
    return {
        "ms_per_step": dt * 1e3,
        "steps_per_s": 1.0 / dt,
        "seed_nodes_per_s": batch / dt,
        "sampled_edges_per_s": edges / dt,
        "avg_sampled_edges": edges,
        "mesh_devices": D,
        "num_nodes": num_nodes,
    }


def bench_device_sampled_epoch(num_nodes=262_144, degree=16, batch=1024,
                               fanout=(10, 10), max_steps=256,
                               family="gcn", dedup=True):
    """Config SE: WHOLE-EPOCH-on-device sampled training.

    ``make_epoch_runner`` scans the fused sample+train step over a
    packed ``[steps, 3+2S]`` seed buffer — one host transfer and one
    dispatch per EPOCH (`data/device_sampling.py`).  Timing is honest
    end-to-end: pack (host numpy) + transfer + scanned program + final
    fetch.  Marginal per-step cost is the full-vs-quarter difference
    (removes the fixed dispatch RTT that dominates config SD on this
    tunnelled runtime).  ``family``/``dedup`` compose the SAGE multiset
    mode (config SME = cheapest sampler × cheapest dispatch)."""
    import numpy as np

    from connectome_gnn_tpu.data import (device_sampled_gcn,
                                         device_sampled_sage,
                                         make_epoch_runner, pack_epoch)
    from connectome_gnn_tpu.train import reference_adam

    g, labels = _sampled_graph(num_nodes, degree)
    if family == "gcn":
        model = device_sampled_gcn(g, hidden_dim=64, fanout=fanout)
    else:
        model = device_sampled_sage(
            g, hidden_dim=64, fanout=fanout, dedup=dedup
        )
    loader = model.make_loader(
        np.arange(num_nodes), labels, batch_size=batch, seed=0,
        drop_last=True,
    )
    optimizer = reference_adam()
    runner = make_epoch_runner(model, optimizer)
    params, state = model.init(jax.random.key(0))
    opt_state = optimizer.init(params)
    rng = jax.random.key(1)

    packed = pack_epoch(loader)[:max_steps]
    steps = int(packed.shape[0])
    quarter = packed[: steps // 4]

    def run_epoch(buf):
        t0 = time.perf_counter()
        _, _, _, _, losses, _ = runner(
            params, state, opt_state, rng, buf, model.csr
        )
        _fetch(losses)
        return time.perf_counter() - t0

    run_epoch(packed)   # compile + warm (full length)
    run_epoch(quarter)  # compile + warm (quarter length)
    t_full = min(run_epoch(packed) for _ in range(2))
    t_quarter = min(run_epoch(quarter) for _ in range(2))
    dt = (t_full - t_quarter) / (steps - steps // 4)

    # honest end-to-end: pack the NEXT epoch on host + transfer + run
    t0 = time.perf_counter()
    buf = pack_epoch(loader)[:max_steps]
    _, _, _, _, losses, _ = runner(
        params, state, opt_state, rng, buf, model.csr
    )
    _fetch(losses)
    epoch_s = time.perf_counter() - t0

    # measured sampled-edge count (same jitted counter as config SD)
    from connectome_gnn_tpu.data import device_sample

    @jax.jit
    def _count(csr, seeds, key_data):
        s = device_sample(
            csr, seeds, jax.random.wrap_key_data(key_data), fanout,
            dedup=dedup,
        )
        return (s.edge_weight > 0).sum()

    edges = 0.0
    for k in range(3):
        sb = next(iter(model.make_loader(
            np.arange(num_nodes), labels, batch_size=batch, seed=k,
            drop_last=True,
        )))
        edges += _fetch(_count(model.csr, sb.seeds, sb.key_data))
    edges /= 3.0

    # the PRODUCT path (VERDICT r3 #7): Trainer(scan_epochs=True) drives
    # the same scanned program through train_epoch — pack + transfer +
    # dispatch + epoch-end sync, measured as a user would hit it
    from connectome_gnn_tpu.train import Trainer

    trainer = Trainer(model, scan_epochs=True)
    t_loader = model.make_loader(
        np.arange(steps * batch), labels, batch_size=batch, seed=0,
        drop_last=True,
    )
    trainer.train_epoch(t_loader)  # compile + warm
    t0 = time.perf_counter()
    trainer.train_epoch(t_loader)
    trainer_s = time.perf_counter() - t0

    return {
        "ms_per_step": dt * 1e3,
        "steps_per_s": 1.0 / dt,
        "seed_nodes_per_s": batch / dt,
        "sampled_edges_per_s": edges / dt,
        "avg_sampled_edges": edges,
        "epoch_ms_end_to_end": epoch_s * 1e3,
        "epoch_steps": steps,
        "ms_per_step_end_to_end": epoch_s * 1e3 / steps,
        "trainer_epoch_ms": trainer_s * 1e3,
        "trainer_ms_per_step": trainer_s * 1e3 / steps,
        "num_nodes": num_nodes,
    }


def bench_device_sampled_epoch_mesh(num_nodes=262_144, degree=16,
                                    batch=1024, fanout=(10, 10),
                                    max_steps=256, family="sage",
                                    dedup=False):
    """Config SMEP: the whole-epoch scan COMPOSED with the DP mesh
    (VERDICT r4 #4): ``make_device_sampled_dp_epoch_runner`` runs the
    entire epoch as ONE shard_map program — one dispatch per epoch per
    device, stacked packed-seed chunks, sync-BN/psummed-grad semantics
    bitwise equal to the stepwise mesh loop
    (tests/test_device_sampled_dp.py).  On this rig the mesh has ONE
    real chip, so the number measures the composed path's overhead vs
    config SME; on a pod, one dispatch per epoch is exactly what DCN
    dispatch latency wants (MULTIPROC_r04: 0.115 s/step of gloo
    dispatch overhead is what this amortizes)."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from connectome_gnn_tpu.data import (device_sampled_gcn,
                                         device_sampled_sage,
                                         pack_epoch_sharded)
    from connectome_gnn_tpu.parallel import (
        create_mesh,
        make_device_sampled_dp_epoch_runner,
        replicate_csr,
    )
    from connectome_gnn_tpu.train import Trainer, reference_adam

    g, labels = _sampled_graph(num_nodes, degree)
    if family == "gcn":
        model = device_sampled_gcn(g, hidden_dim=64, fanout=fanout)
    else:
        model = device_sampled_sage(
            g, hidden_dim=64, fanout=fanout, dedup=dedup
        )
    mesh = create_mesh(axis_names=("data",))
    D = int(mesh.shape["data"])
    loader = model.make_loader(
        np.arange(num_nodes), labels, batch_size=batch, seed=0,
        num_shards=D, drop_last=True,
    )
    optimizer = reference_adam()
    runner = make_device_sampled_dp_epoch_runner(model, optimizer, mesh)
    params, state = model.init(jax.random.key(0))
    opt_state = optimizer.init(params)
    rng = jax.random.key(1)
    csr_r = replicate_csr(model.csr, mesh)
    sh = NamedSharding(mesh, P(None, "data"))

    packed = jax.device_put(
        pack_epoch_sharded(loader)[:max_steps], sh
    )
    steps = int(packed.shape[0])
    quarter = jax.device_put(np.asarray(packed)[: steps // 4], sh)

    def run_epoch(buf):
        t0 = time.perf_counter()
        _, _, _, _, losses, _ = runner(
            params, state, opt_state, rng, buf, csr_r
        )
        _fetch(losses)
        return time.perf_counter() - t0

    run_epoch(packed)   # compile + warm (full length)
    run_epoch(quarter)  # compile + warm (quarter length)
    t_full = min(run_epoch(packed) for _ in range(2))
    t_quarter = min(run_epoch(quarter) for _ in range(2))
    dt = (t_full - t_quarter) / (steps - steps // 4)

    # honest end-to-end through the PRODUCT path:
    # Trainer(mesh=..., scan_epochs=True).train_epoch
    trainer = Trainer(model, mesh=mesh, scan_epochs=True)
    t_loader = model.make_loader(
        np.arange(steps * batch), labels, batch_size=batch, seed=0,
        num_shards=D, drop_last=True,
    )
    trainer.train_epoch(t_loader)  # compile + warm
    t0 = time.perf_counter()
    trainer.train_epoch(t_loader)
    trainer_s = time.perf_counter() - t0

    # measured sampled-edge count (same jitted counter as config SD)
    from connectome_gnn_tpu.data import device_sample
    from connectome_gnn_tpu.data.device_sampling import SeedBatch

    @jax.jit
    def _count(csr, seeds, key_data):
        s = device_sample(
            csr, seeds, jax.random.wrap_key_data(key_data), fanout,
            dedup=dedup,
        )
        return (s.edge_weight > 0).sum()

    edges = 0.0
    sb = next(iter(model.make_loader(
        np.arange(num_nodes), labels, batch_size=batch, seed=9,
        num_shards=D, drop_last=True,
    )))
    for row in np.asarray(sb.packed):
        rb = SeedBatch(packed=jnp.asarray(row), num_seeds=sb.num_seeds)
        edges += _fetch(_count(model.csr, rb.seeds, rb.key_data))

    return {
        "ms_per_step": dt * 1e3,
        "steps_per_s": 1.0 / dt,
        "seed_nodes_per_s": batch / dt,
        "sampled_edges_per_s": edges / dt,
        "avg_sampled_edges": edges,
        "epoch_steps": steps,
        "trainer_epoch_ms": trainer_s * 1e3,
        "trainer_ms_per_step": trainer_s * 1e3 / steps,
        "mesh_devices": D,
        "num_nodes": num_nodes,
    }


def bench_sampled_train_giant(steps=30):
    """Config S2: end-to-end sampled training ON the full north-star
    graph — 1M nodes / ~44M edges (spatial + 10% shortcuts), 1024 seeds
    per step, fanout 10×10, native sampler + prefetch overlap.  The
    on-chip half of BASELINE config 5 ("giant connectome with neighbor
    sampling"); the multi-host half is proven in
    ``benchmarks/multiprocess.py`` (sampled_dp program)."""
    return bench_sampled_train(
        num_nodes=1 << 20, degree=38, batch=1024, fanout=(10, 10),
        steps=steps, compare_prefetch=False,
    )


BENCHES = {
    "1": ("GCN fwd fused, bs=16 n=84 h=64",
          lambda: bench_small_graph_forward(fused=True)),
    "2": ("SAGE fwd fused, bs=16 n=84 h=64",
          lambda: _sage()),
    "3": ("GCN fwd XLA-dense, bs=64 n=360 h=256",
          bench_large_graphs),
    "4": ("GCN fwd fused, packed 512 graphs n=84 h=64",
          bench_packed_512),
    "5": ("CSR segment-sum SpMM, 262k nodes / 4.2M edges, F=64",
          bench_spmm_giant),
    "5b": ("banded block-dense SpMM, 65k nodes / 1.0M edges (±512 band), F=64",
           bench_spmm_banded),
    "5c": ("hybrid band+remainder SpMM, 65k nodes / 1.0M edges (90% local), F=64",
           bench_spmm_hybrid),
    "5d": ("banded SpMM at FULL config-5 scale, 1M nodes / 40M edges (±512 band), F=64",
           bench_spmm_banded_giant),
    "5q": ("int8-quantized banded SpMM at FULL config-5 scale (Pallas panels)",
           bench_spmm_banded_giant_quant),
    "5qm": ("int8 banded SpMM, FEATURE-MAJOR manual-DMA kernel, config-5 "
            "scale",
            bench_spmm_banded_giant_quant_fm),
    "5q8": ("w8a8 banded SpMM (int8 MXU dots, per-block int8 activations), "
            "config-5 scale",
            bench_spmm_banded_giant_quant_fm_w8a8),
    "5qs": ("whole-model int8 serving (BandedNodeGCN fm), 1M nodes, "
            "2 layers",
            bench_giant_model_serving),
    "5qs8": ("whole-model w8a8 serving (BandedNodeGCN fm, int8 MXU), "
             "1M nodes, 2 layers",
             lambda: bench_giant_model_serving(w8a8=True)),
    "T": ("GCN train step (fwd+bwd+Adam), bs=512 dense",
          bench_train_step),
    "5t": ("giant-graph TRAIN step (fwd+bwd+Adam), BandedNodeGCN 2-layer, "
           "1M nodes / 40M edges, f32 band",
           bench_banded_train_giant),
    "5tq": ("giant-graph TRAIN step through the int8-band custom-VJP "
            "manual-DMA kernels, 1M nodes / 40M edges",
            bench_banded_train_giant_quant),
    "5tqb": ("giant-graph TRAIN step through the BLOCKED contiguous-DMA "
             "int8-band kernels (activations [NB, F, block] end-to-end), "
             "1M nodes / 40M edges",
             bench_banded_train_giant_quant_blocked),
    "S": ("sampled-minibatch node-GCN training END-TO-END (sampling+collate+"
          "transfer+step, prefetch overlap), 262k-node graph, 1024 seeds/"
          "step, fanout 10x10",
          bench_sampled_train),
    "SD": ("sampled training END-TO-END with DEVICE-SIDE sampling "
           "(graph resident in HBM, ~8KB SeedBatch/step), 262k-node graph, "
           "1024 seeds/step, fanout 10x10",
           bench_device_sampled_train),
    "SDS": ("device-side sampled training, GraphSAGE family (blocked "
            "aggregation), 262k-node graph, 1024 seeds/step, fanout 10x10",
            lambda: bench_device_sampled_train(family="sage")),
    "SDM": ("device-side sampled training, GraphSAGE MULTISET mode "
            "(dedup=False: no relabel table / dedup sort, all locals "
            "arithmetic), 262k-node graph, 1024 seeds/step, fanout 10x10",
            lambda: bench_device_sampled_train(family="sage", dedup=False)),
    "SD2": ("device-side sampled training on the FULL north-star graph, "
            "1M nodes / 44M edges, 1024 seeds/step, fanout 10x10",
            lambda: bench_device_sampled_train(
                num_nodes=1 << 20, degree=38)),
    "SDP": ("device-sampled training through the DP MESH composition "
            "(stacked seed shards, replicated CSR, shard_map step via "
            "mesh-mode Trainer), 262k-node graph, 1024 seeds/step, "
            "fanout 10x10",
            bench_device_sampled_dp),
    "SDP2": ("device-sampled DP-mesh training on the FULL north-star "
             "graph, 1M nodes / 44M edges, 1024 seeds/step, fanout 10x10",
             lambda: bench_device_sampled_dp(
                 num_nodes=1 << 20, degree=38)),
    "SDMP": ("device-sampled MULTISET training through the DP mesh "
             "composition (SAGE dedup=False, stacked seed rows, "
             "replicated CSR), 262k-node graph, 1024 seeds/step, "
             "fanout 10x10",
             lambda: bench_device_sampled_dp(
                 family="sage", dedup=False)),
    "SE": ("WHOLE-EPOCH-on-device sampled training (lax.scan over packed "
           "seed chunks, one transfer + one dispatch per epoch), 262k-node "
           "graph, 1024 seeds/step, fanout 10x10",
           bench_device_sampled_epoch),
    "SE2": ("whole-epoch-on-device sampled training on the FULL north-star "
            "graph, 1M nodes / 44M edges, 1024 seeds/step, fanout 10x10",
            lambda: bench_device_sampled_epoch(
                num_nodes=1 << 20, degree=38)),
    "SME": ("whole-epoch-on-device MULTISET sampled training (cheapest "
            "sampler x cheapest dispatch: SAGE dedup=False through the "
            "scanned epoch runner), 262k-node graph, 1024 seeds/step, "
            "fanout 10x10",
            lambda: bench_device_sampled_epoch(
                family="sage", dedup=False)),
    "SME2": ("whole-epoch-on-device MULTISET sampled training on the FULL "
             "north-star graph, 1M nodes / 44M edges, 1024 seeds/step, "
             "fanout 10x10",
             lambda: bench_device_sampled_epoch(
                 num_nodes=1 << 20, degree=38, family="sage",
                 dedup=False)),
    "SMEP": ("whole-epoch MULTISET sampled training THROUGH THE DP MESH "
             "(one shard_map dispatch per epoch; bitwise = the stepwise "
             "mesh loop), 262k-node graph, 1024 seeds/step, fanout 10x10",
             bench_device_sampled_epoch_mesh),
    "SMEP2": ("whole-epoch MULTISET mesh-scanned training on the FULL "
              "north-star graph, 1M nodes / 44M edges, 1024 seeds/step, "
              "fanout 10x10",
              lambda: bench_device_sampled_epoch_mesh(
                  num_nodes=1 << 20, degree=38)),
    "S2": ("sampled-minibatch training END-TO-END on the FULL north-star "
           "graph, 1M nodes / 44M edges, 1024 seeds/step, fanout 10x10",
           bench_sampled_train_giant),
}


def _sage():
    from connectome_gnn_tpu.models import GraphSAGEConnectome

    return bench_small_graph_forward(GraphSAGEConnectome, fused=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--configs",
        default="1,2,3,4,5,5b,5c,5d,5q,5qm,5q8,5qs,5qs8,T,5t,5tq,5tqb,S,S2,SD,SDS,SDM,SD2,SDP,SDP2,SDMP,SE,SE2,SME,SME2,SMEP,SMEP2",
    )
    parser.add_argument("--json", action="store_true")
    args = parser.parse_args()

    results = {}
    for key in args.configs.split(","):
        key = key.strip()
        name, fn = BENCHES[key]
        print(f"# running [{key}] {name} ...", file=sys.stderr, flush=True)
        results[key] = {"name": name, **fn()}

    if args.json:
        print(json.dumps(results, indent=2))
    else:
        for key, r in results.items():
            metrics = ", ".join(
                f"{k}={v:,.1f}" for k, v in r.items() if k != "name"
            )
            print(f"[{key}] {r['name']}\n    {metrics}")


if __name__ == "__main__":
    main()
