#!/usr/bin/env python3
"""Random-row gather: many-outstanding Pallas DMAs vs the XLA gather
(VERDICT r3 #4 — attack-or-retire the ~11-14 ns/row latency wall with an
EXPERIMENT, not an argument).

Two walls in this repo sit on the same measured floor: the irregular
giant-graph SpMM (~70 M edges/s, `benchmarks/spmm_experiments.py`) and
the device sampler's random-access residual (~5 ms/step,
SAMPLE_DECOMP_r03.json).  Both reduce to "fetch L random rows of an
[N, F] HBM table".  docs/ARCHITECTURE.md previously asserted that a
Pallas per-row-DMA gather could not beat the bound; this harness
measures it: a kernel that keeps K single-row HBM→VMEM copies in flight
(sliding window of K DMA semaphores), swept over K and the row width,
against the XLA gather on the same shapes:

  (a) irregular-SpMM shapes — 262k-node table, F=64 (256 B rows),
      4M-ish index streams (uniform random);
  (b) sampler table shapes — [E, 2] packed int32 rows (8 B) gathered at
      ~100k indices (the per-hop fetch), and the [N, F] feature gather.

If K-deep pipelining buys row concurrency, the win lifts both floors;
if not, the floor is a property of the memory system and the assertion
becomes a measured retirement (QUANT_r02 style).  Writes
GATHER_DMA_r04.json.

Methodology: chained on-device loops with normalized feedback where the
op is linear, value-fetch sync, full-vs-quarter differencing
(benchmarks/suite.py).  Reference op being attacked:
/root/reference/connectome_gnn/models.py:45-54 (gather half of the
scatter aggregation).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.suite import chained_loop_time


def dma_gather(table, idx, *, k_outstanding=8, chunk=512, interpret=False):
    """Gather ``table[idx]`` with a Pallas kernel that keeps
    ``k_outstanding`` single-row HBM→VMEM DMAs in flight.

    Grid walks ``chunk``-index blocks; the index block rides in SMEM
    (scalar-addressable), each row copy lands directly in the
    auto-pipelined VMEM out block, and a sliding window of K DMA
    semaphores bounds the number of in-flight copies.
    """
    L = int(idx.shape[0])
    F = int(table.shape[1])
    C = min(chunk, L)
    while L % C:
        C -= 1
    K = int(k_outstanding)

    def kernel(idx_ref, table_hbm, out_ref, sems):
        def row_dma(j):
            return pltpu.make_async_copy(
                table_hbm.at[idx_ref[j]],
                out_ref.at[j],
                sems.at[jax.lax.rem(j, K)],
            )

        # fill the window
        for j in range(min(K, C)):
            row_dma(j).start()

        def body(j, _):
            row_dma(j).wait()

            @pl.when(j + K < C)
            def _():
                row_dma(j + K).start()

            return ()

        jax.lax.fori_loop(0, C, body, ())

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(L // C,),
            in_specs=[
                pl.BlockSpec((C,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((C, F), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((K,))],
        ),
        out_shape=jax.ShapeDtypeStruct((L, F), table.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(idx, table)
    return out


def time_gather(gather_fn, table, idx, iters):
    """Chain gathers with a nonlinear feedback THROUGH THE INDICES so
    XLA cannot hoist the body: each iteration re-derives the index
    stream from the previous output's checksum (cheap scalar work)."""
    L = int(idx.shape[0])
    N = int(table.shape[0])

    def step(carry, table, idx):
        # perturb indices by a data-dependent scalar (keeps every
        # iteration's gather distinct and sequentially dependent)
        shift = (carry.astype(jnp.int32) & 0x7FFF) + 1
        idx2 = (idx + shift) % N
        out = gather_fn(table, idx2)
        return jnp.sum(out[0]).astype(jnp.float32)

    import time

    def make(k):
        def looped(carry0, table, idx):
            def body(_, c):
                return step(c, table, idx)

            return jax.lax.fori_loop(0, k, body, carry0)

        return jax.jit(looped).lower(
            jnp.float32(0), table, idx
        ).compile()

    k_small = max(iters // 4, 1)
    c_full, c_small = make(iters), make(k_small)
    float(c_full(jnp.float32(0), table, idx))
    float(c_small(jnp.float32(0), table, idx))

    def timed(c):
        t0 = time.perf_counter()
        float(c(jnp.float32(0), table, idx))
        return time.perf_counter() - t0

    t_small = min(timed(c_small) for _ in range(2))
    t_full = min(timed(c_full) for _ in range(2))
    return max(t_full - t_small, 1e-12) / (iters - k_small)


def run_case(name, N, F, L, dtype, *, iters, ks, chunk, interpret):
    rng = np.random.default_rng(0)
    if dtype == "int32":
        table = jnp.asarray(
            rng.integers(0, 2**30, (N, F)).astype(np.int32)
        )
    else:
        table = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, L).astype(np.int32))

    # Mosaic constraint (MEASURED, first finding of this harness): an
    # HBM memref slice must be 128-lane aligned, so a single-row DMA
    # cannot move fewer than 128 elements of the minor dim — F=64 f32
    # rows (256 B) and [E, 2] int32 rows (8 B) are below the DMA
    # granularity.  The DMA path therefore runs on a 128-lane padded
    # table (row_bytes_physical); the XLA gather is timed on BOTH the
    # logical and the padded table so the padded row is the
    # apples-to-apples comparison and the logical row stays the
    # product-shape number.
    F_pad = ((F + 127) // 128) * 128
    table_pad = (
        table if F_pad == F
        else jnp.pad(table, ((0, 0), (0, F_pad - F)))
    )

    out = {"case": name, "num_rows": N, "row_width": F,
           "row_bytes": F * 4, "row_bytes_physical": F_pad * 4,
           "num_indices": L}

    dt = time_gather(lambda t, i: t[i], table, idx, iters)
    out["xla_gather"] = {
        "ms": dt * 1e3, "ns_per_row": dt / L * 1e9,
        "rows_per_s": L / dt, "gbytes_per_s": L * F * 4 / dt / 1e9,
    }
    print(f"# {name} xla: {dt/L*1e9:.1f} ns/row", file=sys.stderr,
          flush=True)
    if F_pad != F:
        dt = time_gather(lambda t, i: t[i], table_pad, idx, iters)
        out["xla_gather_padded"] = {
            "ms": dt * 1e3, "ns_per_row": dt / L * 1e9,
            "rows_per_s": L / dt,
            "gbytes_per_s": L * F_pad * 4 / dt / 1e9,
        }
        print(f"# {name} xla padded({F_pad}): {dt/L*1e9:.1f} ns/row",
              file=sys.stderr, flush=True)

    correctness_checked = False
    for K in ks:
        fn = functools.partial(
            dma_gather, k_outstanding=K, chunk=chunk, interpret=interpret
        )
        if not correctness_checked:
            small = min(L, 4 * chunk)
            want = np.asarray(table[idx[:small]])
            got = np.asarray(fn(table_pad, idx[:small]))[:, :F]
            np.testing.assert_array_equal(got, want)
            correctness_checked = True
        dt = time_gather(fn, table_pad, idx, iters)
        out[f"dma_k{K}"] = {
            "ms": dt * 1e3, "ns_per_row": dt / L * 1e9,
            "rows_per_s": L / dt,
            "gbytes_per_s": L * F_pad * 4 / dt / 1e9,
        }
        print(f"# {name} dma K={K}: {dt/L*1e9:.1f} ns/row",
              file=sys.stderr, flush=True)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="GATHER_DMA_r04.json")
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--ks", default="4,8,16,32")
    # 1024, not 512: XLA lays out long 1-D s32 operands with a T(1024)
    # tile and Mosaic requires the SMEM index block to match it
    p.add_argument("--chunk", type=int, default=1024)
    p.add_argument("--interpret", action="store_true")
    p.add_argument("--small", action="store_true",
                   help="tiny shapes for CPU smoke-testing")
    args = p.parse_args()
    ks = [int(k) for k in args.ks.split(",")]

    if args.small:
        cases = [
            ("spmm_feature_gather", 4096, 64, 8192, "f32"),
            ("sampler_pair_gather", 16384, 2, 4096, "int32"),
        ]
    else:
        cases = [
            # (a) irregular-SpMM shapes: 262k-node F=64 table, 4.2M rows
            ("spmm_feature_gather", 262_144, 64, 1 << 22, "f32"),
            # (b) sampler shapes: packed [E, 2] pair fetch at ~100k rows
            ("sampler_pair_gather", 4_194_304, 2, 1 << 17, "int32"),
            # (b') sampler feature gather: [N, F] at ~100k rows
            ("sampler_feature_gather", 262_144, 64, 1 << 17, "f32"),
        ]

    results = {
        "round": 4,
        "harness": "benchmarks/gather_dma_experiments.py",
        "k_outstanding_swept": ks,
        "chunk": args.chunk,
        "cases": [],
    }
    for name, N, F, L, dt_ in cases:
        results["cases"].append(run_case(
            name, N, F, L, dt_, iters=args.iters, ks=ks,
            chunk=args.chunk, interpret=args.interpret,
        ))

    out = json.dumps(results, indent=2)
    print(out)
    with open(args.out, "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
