#!/usr/bin/env python3
"""Where do the int8-band kernel's milliseconds go? (round-2 follow-up)

The shipped int8-band Pallas kernel (`banded_spmm_quant`) measures
~7.3 ms at the 1M-node config while its HBM traffic (~1.9 GB) would
allow ~3 ms — and the panel-size sweep says R=8 is already optimal, so
the gap is not pipeline amortization.  The two suspects:

* the int8→bf16 **conversion** of every band tile on the VPU
  (1.34 G elements per pass), and
* the **narrow dots** ([256,256]@[256,64] — N=64 underfills the MXU's
  128-lane output tile).

This script times controlled variants at the exact 5d geometry:

  f32_xla     f32 band, XLA einsum             (traffic 5.9 GB)
  bf16_xla    bf16 band, XLA einsum            (traffic 3.1 GB, no kernel)
  int8_pallas shipped kernel                   (traffic 1.9 GB + convert)
  bf16_pallas same kernel, bf16 band, no scale (traffic 3.2 GB, no convert)
  w8a8_pallas int8 band AND int8 activations, int8×int8→int32 MXU dots,
              per-(tile, x-block) scale applied to the f32 result
              (traffic 1.7 GB, 4× less VPU conversion work)

plus a correctness check of each quant variant against the f32 oracle.
Timing methodology = benchmarks/suite.py (chained normalized-feedback
fori_loops, value-fetch sync, full-vs-quarter differencing).

Usage: python benchmarks/quant_kernel_diag.py [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from benchmarks.quant_experiments import build_band  # noqa: E402
from benchmarks.suite import chained_loop_time  # noqa: E402

from connectome_gnn_tpu.ops.banded import BandedMatrix, banded_spmm  # noqa: E402
from connectome_gnn_tpu.ops.banded_quant import (  # noqa: E402
    QuantizedBandedMatrix,
    banded_spmm_quant,
    quantize_band,
)


def banded_spmm_bf16_pallas(
    band_bf16: jnp.ndarray, num_nodes: int, W: int, x: jnp.ndarray,
    rows_per_step: int = 8,
) -> jnp.ndarray:
    """The shipped panel kernel with a bf16 band and no scales —
    isolates the cost of the int8→bf16 tile conversion."""
    nb, D, block, _ = band_bf16.shape
    padded = nb * block
    F = x.shape[1]
    R = max(1, min(int(rows_per_step), nb))
    while nb % R:
        R -= 1
    K = 1 + -(-2 * W // R)

    x_pad = jnp.zeros(((nb // R + K) * R * block, F), jnp.bfloat16)
    x_pad = jax.lax.dynamic_update_slice(
        x_pad, x[:num_nodes].astype(jnp.bfloat16), (W * block, 0)
    ).reshape(-1, block, F)

    def kernel(band_ref, *refs):
        x_refs, out_ref = refs[:-1], refs[-1]
        for r in range(R):
            acc = jnp.zeros((block, F), jnp.float32)
            for d in range(D):
                k, row = divmod(r + d, R)
                acc += jnp.dot(
                    band_ref[r, d], x_refs[k][row],
                    preferred_element_type=jnp.float32,
                )
            out_ref[r] = acc

    def x_spec(k):
        return pl.BlockSpec(
            (R, block, F), lambda i, k=k: (i + k, 0, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        kernel,
        grid=(nb // R,),
        in_specs=[
            pl.BlockSpec(
                (R, D, block, block), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [x_spec(k) for k in range(K)],
        out_specs=pl.BlockSpec(
            (R, block, F), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb, block, F), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(band_bf16, *([x_pad] * K))
    return out.reshape(padded, F)[:num_nodes]


def quantize_x_blocks(x_pad_blocks: jnp.ndarray):
    """Per-row-block symmetric int8 quantization of activations.

    ``x_pad_blocks`` is ``[NBP, block, F]`` f32; returns int8 blocks and
    ``[NBP]`` f32 scales.
    """
    maxabs = jnp.max(jnp.abs(x_pad_blocks), axis=(1, 2))
    scales = jnp.where(maxabs > 0, maxabs / 127.0, 1.0)
    q = jnp.clip(
        jnp.round(x_pad_blocks / scales[:, None, None]), -127, 127
    ).astype(jnp.int8)
    return q, scales


def banded_spmm_w8a8(
    q: QuantizedBandedMatrix, x: jnp.ndarray, rows_per_step: int = 8
) -> jnp.ndarray:
    """int8 band × int8 activations on the MXU, int32 accumulate, one
    f32 scale product per (tile, x-block) applied to the dot result."""
    block, nb, W = q.block, q.num_blocks, q.bandwidth
    D = 2 * W + 1
    padded = nb * block
    F = x.shape[1]
    R = max(1, min(int(rows_per_step), nb))
    while nb % R:
        R -= 1
    K = 1 + -(-2 * W // R)
    nbp = (nb // R + K) * R

    x_pad = jnp.zeros((nbp * block, F), jnp.float32)
    x_pad = jax.lax.dynamic_update_slice(
        x_pad, x[: q.num_nodes], (W * block, 0)
    ).reshape(nbp, block, F)
    xq, sx = quantize_x_blocks(x_pad)

    def kernel(sw_ref, sx_ref, band_ref, *refs):
        x_refs, out_ref = refs[:-1], refs[-1]
        i = pl.program_id(0)
        for r in range(R):
            acc = jnp.zeros((block, F), jnp.float32)
            for d in range(D):
                k, row = divmod(r + d, R)
                dot_i32 = jax.lax.dot_general(
                    band_ref[r, d], x_refs[k][row],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                scale = (
                    sw_ref[(i * R + r) * D + d] * sx_ref[i * R + r + d]
                )
                acc += scale * dot_i32.astype(jnp.float32)
            out_ref[r] = acc

    def x_spec(k):
        return pl.BlockSpec(
            (R, block, F), lambda i, sw, sx, k=k: (i + k, 0, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb // R,),
            in_specs=[
                pl.BlockSpec(
                    (R, D, block, block), lambda i, sw, sx: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
            + [x_spec(k) for k in range(K)],
            out_specs=pl.BlockSpec(
                (R, block, F), lambda i, sw, sx: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((nb, block, F), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q.scales.reshape(-1), sx, q.band_q, *([xq] * K))
    return out.reshape(padded, F)[: q.num_nodes]


def banded_spmm_quant_fused_dot(
    q: QuantizedBandedMatrix, x: jnp.ndarray, rows_per_step: int = 8,
    wrow_bf16: bool = False,
) -> jnp.ndarray:
    """One wide dot per row block: the D per-diagonal tiles are scaled
    during int8→bf16 conversion and concatenated along K into a
    [block, D·block] operand, so each row block issues ONE MXU dot
    ([block, D·block] @ [D·block, F]) instead of D narrow ones —
    attacking the fixed per-dot cost the diagnostics exposed."""
    block, nb, W = q.block, q.num_blocks, q.bandwidth
    D = 2 * W + 1
    padded = nb * block
    F = x.shape[1]
    R = max(1, min(int(rows_per_step), nb))
    while nb % R:
        R -= 1
    K = 1 + -(-2 * W // R)

    x_pad = jnp.zeros(((nb // R + K) * R * block, F), jnp.bfloat16)
    x_pad = jax.lax.dynamic_update_slice(
        x_pad, x[: q.num_nodes].astype(jnp.bfloat16), (W * block, 0)
    ).reshape(-1, block, F)

    def kernel(scales_ref, band_ref, *refs):
        x_refs, out_ref = refs[:-1], refs[-1]
        i = pl.program_id(0)
        for r in range(R):
            wrow = jnp.concatenate(
                [
                    scales_ref[(i * R + r) * D + d]
                    * band_ref[r, d].astype(jnp.bfloat16)
                    for d in range(D)
                ],
                axis=1,
            )
            if wrow_bf16:
                wrow = wrow.astype(jnp.bfloat16)
            xwin = jnp.concatenate(
                [x_refs[(r + d) // R][(r + d) % R] for d in range(D)],
                axis=0,
            )
            out_ref[r] = jnp.dot(
                wrow, xwin, preferred_element_type=jnp.float32
            )

    def x_spec(k):
        return pl.BlockSpec(
            (R, block, F), lambda i, s_ref, k=k: (i + k, 0, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb // R,),
            in_specs=[
                pl.BlockSpec(
                    (R, D, block, block), lambda i, s_ref: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
            + [x_spec(k) for k in range(K)],
            out_specs=pl.BlockSpec(
                (R, block, F), lambda i, s_ref: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((nb, block, F), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q.scales.reshape(-1), q.band_q, *([x_pad] * K))
    return out.reshape(padded, F)[: q.num_nodes]


def banded_spmm_quant_manual(
    q: QuantizedBandedMatrix, x: jnp.ndarray, rows_per_step: int = 8
) -> jnp.ndarray:
    """Row-major wrapper over the production feature-major manual-DMA
    kernel (promoted to ``ops/banded_quant.py banded_spmm_quant_fm``
    after this diagnostic proved it out) — kept for the checks phase."""
    from connectome_gnn_tpu.ops.banded_quant import (
        banded_spmm_quant_fm,
        to_feature_major,
    )

    q_fm = to_feature_major(q)
    return banded_spmm_quant_fm(
        q_fm, x[: q.num_nodes].T, rows_per_step=rows_per_step
    ).T


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--nodes", type=int, default=1 << 20)
    p.add_argument("--feat", type=int, default=64)
    p.add_argument(
        "--phases",
        default="checks,f32,bf16_xla,int8,bf16_pallas,w8a8,fused_dot",
    )
    p.add_argument("--rows", type=int, nargs="*", default=[8])
    args = p.parse_args()
    phases = set(args.phases.split(","))

    a, E = build_band(args.nodes, 38, 512, 256)
    W = a.bandwidth
    x0 = jax.random.normal(
        jax.random.PRNGKey(1), (args.nodes, args.feat), jnp.float32
    )
    q = quantize_band(a)
    band_bf16 = a.band.astype(jnp.bfloat16)

    if "checks" in phases:
        ref = banded_spmm(a, x0)
        ref_norm = float(jnp.linalg.norm(ref))
        for name, fn in [
            ("bf16_pallas",
             lambda: banded_spmm_bf16_pallas(band_bf16, args.nodes, W, x0)),
            ("w8a8_pallas", lambda: banded_spmm_w8a8(q, x0)),
            ("fused_dot", lambda: banded_spmm_quant_fused_dot(q, x0)),
            ("manual", lambda: banded_spmm_quant_manual(q, x0)),
        ]:
            err = float(jnp.linalg.norm(fn() - ref)) / ref_norm
            print(json.dumps({"check": name, "rel_frobenius_err": err}),
                  flush=True)
            assert err < 3e-2, f"{name} error {err} out of bound"
        del ref

    def record(name, dt):
        print(json.dumps({
            "timing": name, "ms_per_spmm": dt * 1e3, "edges_per_s": E / dt,
        }), flush=True)

    if "f32" in phases:
        record("f32_xla", chained_loop_time(
            lambda v, b: banded_spmm(a._replace(band=b), v),
            x0, args.iters, a.band,
        ))
    a.band.delete()

    if "bf16_xla" in phases:
        record("bf16_xla", chained_loop_time(
            lambda v, b: banded_spmm(
                BandedMatrix(b, args.nodes, W), v
            ),
            x0, args.iters, band_bf16,
        ))

    if "bf16_pallas" in phases:
        record("bf16_pallas", chained_loop_time(
            lambda v, b: banded_spmm_bf16_pallas(b, args.nodes, W, v),
            x0, args.iters, band_bf16,
        ))
    band_bf16.delete()

    if "int8" in phases:
        record("int8_pallas", chained_loop_time(
            lambda v, bq, s: banded_spmm_quant(
                QuantizedBandedMatrix(bq, s, q.num_nodes, q.bandwidth), v
            ),
            x0, args.iters, q.band_q, q.scales,
        ))

    if "w8a8" in phases:
        record("w8a8_pallas", chained_loop_time(
            lambda v, bq, s: banded_spmm_w8a8(
                QuantizedBandedMatrix(bq, s, q.num_nodes, q.bandwidth), v
            ),
            x0, args.iters, q.band_q, q.scales,
        ))

    if "fused_dot" in phases:
        for r in args.rows:
            record(f"fused_dot_r{r}", chained_loop_time(
                lambda v, bq, s, r=r: banded_spmm_quant_fused_dot(
                    QuantizedBandedMatrix(bq, s, q.num_nodes, q.bandwidth),
                    v, rows_per_step=r,
                ),
                x0, args.iters, q.band_q, q.scales,
            ))

    if "manual" in phases:
        # production feature-major kernel timed in its persistent layout:
        # xT loop state, band pre-transposed once outside the loop
        from connectome_gnn_tpu.ops.banded_quant import (
            QuantizedBandedMatrixFM,
            banded_spmm_quant_fm,
            to_feature_major,
        )

        q_fm = to_feature_major(q)
        x0T = jnp.asarray(x0.T)
        for r in args.rows:
            record(f"manual_fm_r{r}", chained_loop_time(
                lambda vT, bqT, s, r=r: banded_spmm_quant_fm(
                    QuantizedBandedMatrixFM(
                        bqT, s, q.num_nodes, q.bandwidth
                    ),
                    vT, rows_per_step=r,
                ),
                x0T, args.iters, q_fm.band_qT, q.scales,
            ))

    if "fused_dot_bf16" in phases:
        for r in args.rows:
            record(f"fused_dot_bf16_r{r}", chained_loop_time(
                lambda v, bq, s, r=r: banded_spmm_quant_fused_dot(
                    QuantizedBandedMatrix(bq, s, q.num_nodes, q.bandwidth),
                    v, rows_per_step=r, wrow_bf16=True,
                ),
                x0, args.iters, q.band_q, q.scales,
            ))


if __name__ == "__main__":
    main()
