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
    """Manually double-buffered int8-band SpMM in FEATURE-MAJOR layout:
    one grid step, explicit async HBM→VMEM DMA for band panels and x
    windows, compute overlapped with the next panel's copies, out panels
    DMA'd back while the next panel computes.  Tests whether Mosaic's
    automatic per-step pipeline (the ~8 µs/step fixed cost the
    diagnostics exposed) can be beaten.

    Layout: manual DMA slices must be 128-lane aligned, which F=64
    row-major buffers are not — so activations travel as ``[F, N]``
    (feature-major, last dim = node blocks of 256) and band tiles are
    pre-transposed (``accT = xT_window @ tileT``).  A layout-persistent
    serving stack would keep activations feature-major across layers and
    never pay a transpose; this wrapper transposes at the boundary for
    the equivalence check.
    """
    block, nb, W = q.block, q.num_blocks, q.bandwidth
    R = max(1, min(int(rows_per_step), nb))
    while nb % R:
        R -= 1

    band_qT = jnp.swapaxes(q.band_q, 2, 3)  # one-time prep, outside serving
    outT = _manual_fm_core(
        band_qT, q.scales, x[: q.num_nodes].T, nb, W, block, R
    )
    return outT[:, : q.num_nodes].T


def _manual_fm_core(band_qT, scales, xT, nb, W, block, R):
    """Feature-major core: ``xT`` is ``[F, num_nodes]``; returns
    ``[F, nb·block]`` — the shape a layout-persistent stack chains."""
    D = 2 * W + 1
    padded = nb * block
    F = xT.shape[0]
    num_chunks = nb // R
    win = R + 2 * W

    xT_pad = jnp.zeros((F, (nb + 2 * W) * block), jnp.bfloat16)
    xT_pad = jax.lax.dynamic_update_slice(
        xT_pad, xT.astype(jnp.bfloat16), (0, W * block)
    )

    def kernel(scales_ref, band_hbm, x_hbm, out_hbm,
               band_buf, x_buf, out_buf, band_sem, x_sem, out_sem):
        def band_dma(slot, i):
            return pltpu.make_async_copy(
                band_hbm.at[pl.ds(i * R, R)], band_buf.at[slot],
                band_sem.at[slot],
            )

        def x_dma(slot, i):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(i * R * block, win * block)],
                x_buf.at[slot], x_sem.at[slot],
            )

        def out_dma(slot, i):
            return pltpu.make_async_copy(
                out_buf.at[slot],
                out_hbm.at[:, pl.ds(i * R * block, R * block)],
                out_sem.at[slot],
            )

        band_dma(0, 0).start()
        x_dma(0, 0).start()

        def body(i, _):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < num_chunks)
            def _():
                band_dma(1 - slot, i + 1).start()
                x_dma(1 - slot, i + 1).start()

            band_dma(slot, i).wait()
            x_dma(slot, i).wait()

            # out_buf[slot] still drains chunk i-2's store
            @pl.when(i >= 2)
            def _():
                out_dma(slot, i - 2).wait()

            for r in range(R):
                acc = jnp.zeros((F, block), jnp.float32)
                for d in range(D):
                    tileT = band_buf[slot, r, d].astype(jnp.bfloat16)
                    xw = x_buf[slot, :, (r + d) * block:(r + d + 1) * block]
                    acc += scales_ref[(i * R + r) * D + d] * jnp.dot(
                        xw, tileT, preferred_element_type=jnp.float32,
                    )
                out_buf[slot, :, r * block:(r + 1) * block] = acc
            out_dma(slot, i).start()

        jax.lax.fori_loop(0, num_chunks, body, None)
        if num_chunks >= 2:
            out_dma((num_chunks - 2) % 2, num_chunks - 2).wait()
        out_dma((num_chunks - 1) % 2, num_chunks - 1).wait()

    outT = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, R, D, block, block), jnp.int8),
                pltpu.VMEM((2, F, win * block), jnp.bfloat16),
                pltpu.VMEM((2, F, R * block), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((F, padded), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(scales.reshape(-1), band_qT, xT_pad)
    return outT


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
        # feature-major core timed in its persistent layout: xT loop
        # state, band pre-transposed once outside the loop
        band_qT = jnp.swapaxes(q.band_q, 2, 3)
        nb, W, block = q.num_blocks, q.bandwidth, q.block
        x0T = jnp.asarray(x0.T)
        for r in args.rows:
            record(f"manual_fm_r{r}", chained_loop_time(
                lambda vT, bqT, s, r=r: _manual_fm_core(
                    bqT, s, vT, nb, W, block, r
                ),
                x0T, args.iters, band_qT, q.scales,
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
