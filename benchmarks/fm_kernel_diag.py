#!/usr/bin/env python3
"""Close or retire the fm kernel's residual ~1.4 ms (VERDICT r2 #7).

QUANT_r02.json left the feature-major manual-DMA int8 kernel at 4.66 ms
vs a ~3.2 ms traffic-ideal, attributing the gap to "x-window re-reads
plus VPU dequant work overlapped imperfectly with DMA" — a hypothesis,
not a retired one.  This harness separates the suspects with controlled
kernel variants at the exact 5qm geometry (1M nodes, ±512 band,
block 256, F=64):

  fm_shipped      the shipped kernel (ops/banded_quant.banded_spmm_quant_fm)
  fm_dma_only     same manual double-buffered DMA pipeline, compute body
                  replaced by a trivial copy — the pure DMA floor
  fm_compute_only DMA one panel, compute EVERY chunk from resident VMEM
                  (loop-variant indexing so nothing hoists) — the pure
                  VPU(convert)+MXU floor
  fm_bf16_band    band stored bf16: 2x the band DMA, ZERO int8→bf16
                  conversion — if this lands at its own (higher) traffic
                  floor, conversion was the binding constraint
  fm_w8a8         int8 band AND per-block int8 activations, native
                  int8×int8→int32 MXU dots, f32 scale fixup — no
                  conversion at all and ~half the x traffic
  r_sweep         measured ms vs the x-re-read traffic prediction for
                  R ∈ {8,16,32,64} — the re-read hypothesis is only
                  worth ~0.1 ms by the model; confirm or refute

Timing methodology = benchmarks/suite.py (chained normalized-feedback
fori_loops, value-fetch sync, full-vs-quarter differencing).  Writes a
QUANT_r03-style JSON with --json.

Usage: python benchmarks/fm_kernel_diag.py [--json] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np  # noqa: F401 (used by callers/tests)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from benchmarks.quant_experiments import build_band  # noqa: E402
from benchmarks.suite import chained_loop_time, device_loop_time  # noqa: E402

from connectome_gnn_tpu.ops.banded import banded_spmm  # noqa: E402
from connectome_gnn_tpu.ops.banded_quant import (  # noqa: E402
    QuantizedBandedMatrixFM,
    banded_spmm_quant_fm,
    quantize_band,
    to_feature_major,
)

# effective streaming bandwidth measured on this chip (docs/ARCHITECTURE.md)
EFFECTIVE_BPS = 608e9


def _pad_xT(xT, num_nodes, nb, W, block, dtype=jnp.bfloat16):
    F = xT.shape[0]
    xT_pad = jnp.zeros((F, (nb + 2 * W) * block), dtype)
    return jax.lax.dynamic_update_slice(
        xT_pad, xT[:, :num_nodes].astype(dtype), (0, W * block)
    )


def _fm_pipeline(kernel_body, *, nb, D, W, R, block, F, band_dtype,
                 x_dtype, num_chunks, extra_scalars=0, interpret=False):
    """Shared manual double-buffered DMA pipeline scaffold: returns a
    pallas_call taking ``(scales..., band, xT_pad) -> outT`` with the
    given per-chunk ``kernel_body(i, slot, scalar_refs, band_buf, x_buf,
    out_buf)``."""
    win = R + 2 * W

    def kernel(*refs):
        scalar_refs = refs[:1 + extra_scalars]
        band_hbm, x_hbm, out_hbm = refs[1 + extra_scalars:4 + extra_scalars]
        band_buf, x_buf, out_buf, band_sem, x_sem, out_sem = (
            refs[4 + extra_scalars:]
        )

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

            @pl.when(i >= 2)
            def _():
                out_dma(slot, i - 2).wait()

            kernel_body(i, slot, scalar_refs, band_buf, x_buf, out_buf)
            out_dma(slot, i).start()

        jax.lax.fori_loop(0, num_chunks, body, None)
        if num_chunks >= 2:
            out_dma((num_chunks - 2) % 2, num_chunks - 2).wait()
        out_dma((num_chunks - 1) % 2, num_chunks - 1).wait()

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1 + extra_scalars,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, R, D, block, block), band_dtype),
                pltpu.VMEM((2, F, win * block), x_dtype),
                pltpu.VMEM((2, F, R * block), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((F, nb * block), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )


def fm_dma_only(q: QuantizedBandedMatrixFM, xT, *, rows_per_step=32,
                interpret=False):
    """All three DMA streams of the shipped kernel, compute replaced by a
    trivial per-row copy (+ one tile-slice read so the band DMA has a
    consumer) — times the pure pipeline/DMA floor."""
    block, nb, W = q.block, q.num_blocks, q.bandwidth
    D = 2 * W + 1
    F = xT.shape[0]
    R = rows_per_step
    num_chunks = nb // R

    def body(i, slot, scalar_refs, band_buf, x_buf, out_buf):
        for r in range(R):
            out_buf[slot, :, r * block:(r + 1) * block] = (
                x_buf[slot, :, r * block:(r + 1) * block].astype(jnp.float32)
                + band_buf[slot, r, 0, :F, :].astype(jnp.float32)
            )

    call = _fm_pipeline(
        body, nb=nb, D=D, W=W, R=R, block=block, F=F,
        band_dtype=jnp.int8, x_dtype=jnp.bfloat16, num_chunks=num_chunks,
        interpret=interpret,
    )
    xT_pad = _pad_xT(xT, q.num_nodes, nb, W, block)
    return call(q.scales.reshape(-1), q.band_qT, xT_pad)[:, : q.num_nodes]


def fm_compute_only(q: QuantizedBandedMatrixFM, xT, *, rows_per_step=32,
                    interpret=False):
    """DMA ONE panel, then run every chunk's full compute (int8→bf16
    conversion + MXU dots + scale fixup) against resident VMEM, with
    loop-variant tile/window indexing so nothing hoists — times the pure
    compute floor."""
    block, nb, W = q.block, q.num_blocks, q.bandwidth
    D = 2 * W + 1
    F = xT.shape[0]
    R = rows_per_step
    win = R + 2 * W
    num_chunks = nb // R

    def body(i, slot, scalar_refs, band_buf, x_buf, out_buf):
        scales_ref = scalar_refs[0]
        for r in range(R):
            acc = jnp.zeros((F, block), jnp.float32)
            for d in range(D):
                # loop-variant indices (same work, nothing invariant)
                rr = jax.lax.rem(r + i, R)
                kk = jax.lax.rem(r + d + i, win)
                tileT = band_buf[0, rr, d].astype(jnp.bfloat16)
                xw = x_buf[0, :, pl.ds(kk * block, block)]
                acc += scales_ref[(i * R + r) * D + d] * jnp.dot(
                    xw, tileT, preferred_element_type=jnp.float32,
                )
            out_buf[slot, :, r * block:(r + 1) * block] = acc

    win_ = win

    def kernel(scales_ref, band_hbm, x_hbm, out_hbm,
               band_buf, x_buf, out_buf, band_sem, x_sem, out_sem):
        pltpu.make_async_copy(
            band_hbm.at[pl.ds(0, R)], band_buf.at[0], band_sem.at[0]
        ).start()
        pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(0, win_ * block)], x_buf.at[0], x_sem.at[0]
        ).start()
        pltpu.make_async_copy(
            band_hbm.at[pl.ds(0, R)], band_buf.at[0], band_sem.at[0]
        ).wait()
        pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(0, win_ * block)], x_buf.at[0], x_sem.at[0]
        ).wait()

        def loop_body(i, _):
            slot = jax.lax.rem(i, 2)
            body(i, slot, (scales_ref,), band_buf, x_buf, out_buf)

        jax.lax.fori_loop(0, num_chunks, loop_body, None)
        # one out DMA at the end (out traffic excluded from this floor)
        pltpu.make_async_copy(
            out_buf.at[0], out_hbm.at[:, pl.ds(0, R * block)], out_sem.at[0]
        ).start()
        pltpu.make_async_copy(
            out_buf.at[0], out_hbm.at[:, pl.ds(0, R * block)], out_sem.at[0]
        ).wait()

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, R, D, block, block), jnp.int8),
                pltpu.VMEM((2, F, win * block), jnp.bfloat16),
                pltpu.VMEM((2, F, R * block), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((F, R * block), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    xT_pad = _pad_xT(xT, q.num_nodes, nb, W, block)
    return call(q.scales.reshape(-1), q.band_qT, xT_pad)


def fm_bf16_band(band_bf16T, scales, num_nodes, W, xT, *, rows_per_step=32,
                 interpret=False):
    """Shipped pipeline with a bf16-stored band: 2x the band DMA bytes,
    zero conversion work (scale fixup kept, it is negligible)."""
    nb, D, block = (
        band_bf16T.shape[0], band_bf16T.shape[1], band_bf16T.shape[2]
    )
    F = xT.shape[0]
    R = rows_per_step
    num_chunks = nb // R

    def body(i, slot, scalar_refs, band_buf, x_buf, out_buf):
        scales_ref = scalar_refs[0]
        for r in range(R):
            acc = jnp.zeros((F, block), jnp.float32)
            for d in range(D):
                tileT = band_buf[slot, r, d]
                xw = x_buf[slot, :, (r + d) * block:(r + d + 1) * block]
                acc += scales_ref[(i * R + r) * D + d] * jnp.dot(
                    xw, tileT, preferred_element_type=jnp.float32,
                )
            out_buf[slot, :, r * block:(r + 1) * block] = acc

    call = _fm_pipeline(
        body, nb=nb, D=D, W=W, R=R, block=block, F=F,
        band_dtype=jnp.bfloat16, x_dtype=jnp.bfloat16,
        num_chunks=num_chunks, interpret=interpret,
    )
    xT_pad = _pad_xT(xT, num_nodes, nb, W, block)
    return call(scales.reshape(-1), band_bf16T, xT_pad)[:, :num_nodes]


def fm_deep(q: QuantizedBandedMatrixFM, xT, *, rows_per_step=32, depth=4,
            band_splits=1, interpret=False):
    """The shipped fm kernel generalized to pipeline depth ``depth``
    (S-way buffering, S-1 chunks of DMA lookahead instead of 1) with the
    band panel copy optionally SPLIT into ``band_splits`` concurrent
    sub-DMAs (more DMA streams in flight → more HBM queue parallelism).

    Motivated by the fm_dma_only finding: the 2-deep pipeline's DMA
    streams sustain only ~380 GB/s while XLA's own pipelining reaches
    ~608 GB/s on the same chip — compute is fully hidden, so pipeline
    depth/stream-parallelism is the whole residual.
    """
    block, nb, W = q.block, q.num_blocks, q.bandwidth
    D = 2 * W + 1
    F = xT.shape[0]
    R = max(1, min(int(rows_per_step), nb))
    while nb % R:
        R -= 1
    S = depth
    num_chunks = nb // R
    win = R + 2 * W
    K = band_splits
    assert R % K == 0
    Rk = R // K

    def kernel(scales_ref, band_hbm, x_hbm, out_hbm,
               band_buf, x_buf, out_buf, band_sem, x_sem, out_sem):
        def band_dmas(slot, i):
            return [
                pltpu.make_async_copy(
                    band_hbm.at[pl.ds(i * R + k * Rk, Rk)],
                    band_buf.at[slot, pl.ds(k * Rk, Rk)],
                    band_sem.at[slot, k],
                )
                for k in range(K)
            ]

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

        # prologue: fill S-1 slots of input lookahead
        for j in range(min(S - 1, num_chunks)):
            for dma in band_dmas(j % S, j):
                dma.start()
            x_dma(j % S, j).start()

        def body(i, _):
            slot = jax.lax.rem(i, S)

            @pl.when(i + S - 1 < num_chunks)
            def _():
                nxt = jax.lax.rem(i + S - 1, S)
                for dma in band_dmas(nxt, i + S - 1):
                    dma.start()
                x_dma(nxt, i + S - 1).start()

            for dma in band_dmas(slot, i):
                dma.wait()
            x_dma(slot, i).wait()

            # out_buf[slot] may still be draining chunk i-S's store
            @pl.when(i >= S)
            def _():
                out_dma(slot, i - S).wait()

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
        for j in range(max(0, num_chunks - S), num_chunks):
            out_dma(j % S, j).wait()

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((S, R, D, block, block), jnp.int8),
                pltpu.VMEM((S, F, win * block), jnp.bfloat16),
                pltpu.VMEM((S, F, R * block), jnp.float32),
                pltpu.SemaphoreType.DMA((S, K)),
                pltpu.SemaphoreType.DMA((S,)),
                pltpu.SemaphoreType.DMA((S,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((F, nb * block), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    xT_pad = _pad_xT(xT, q.num_nodes, nb, W, block)
    return call(q.scales.reshape(-1), q.band_qT, xT_pad)[:, : q.num_nodes]


def fm_blocked(q: QuantizedBandedMatrixFM, xb, *, rows_per_step=32, depth=2,
               interpret=False):
    """Blocked-feature-major activations: ``xb`` is ``[nb+2W, F, block]``
    (block-major chunks of the padded feature-major array), so the x
    window AND the out panel are CONTIGUOUS leading-dim DMA slabs instead
    of 64-segment strided copies — the strided-DMA-overhead hypothesis
    test.  Same dots as the shipped kernel; returns ``[nb, F, block]``
    (the layout a blocked serving stack would keep end-to-end).
    """
    block, nb, W = q.block, q.num_blocks, q.bandwidth
    D = 2 * W + 1
    F = xb.shape[1]
    R = max(1, min(int(rows_per_step), nb))
    while nb % R:
        R -= 1
    S = depth
    num_chunks = nb // R
    win = R + 2 * W

    def kernel(scales_ref, band_hbm, x_hbm, out_hbm,
               band_buf, x_buf, out_buf, band_sem, x_sem, out_sem):
        def band_dma(slot, i):
            return pltpu.make_async_copy(
                band_hbm.at[pl.ds(i * R, R)], band_buf.at[slot],
                band_sem.at[slot],
            )

        def x_dma(slot, i):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * R, win)], x_buf.at[slot], x_sem.at[slot],
            )

        def out_dma(slot, i):
            return pltpu.make_async_copy(
                out_buf.at[slot], out_hbm.at[pl.ds(i * R, R)],
                out_sem.at[slot],
            )

        for j in range(min(S - 1, num_chunks)):
            band_dma(j % S, j).start()
            x_dma(j % S, j).start()

        def body(i, _):
            slot = jax.lax.rem(i, S)

            @pl.when(i + S - 1 < num_chunks)
            def _():
                nxt = jax.lax.rem(i + S - 1, S)
                band_dma(nxt, i + S - 1).start()
                x_dma(nxt, i + S - 1).start()

            band_dma(slot, i).wait()
            x_dma(slot, i).wait()

            @pl.when(i >= S)
            def _():
                out_dma(slot, i - S).wait()

            for r in range(R):
                acc = jnp.zeros((F, block), jnp.float32)
                for d in range(D):
                    tileT = band_buf[slot, r, d].astype(jnp.bfloat16)
                    xw = x_buf[slot, r + d]
                    acc += scales_ref[(i * R + r) * D + d] * jnp.dot(
                        xw, tileT, preferred_element_type=jnp.float32,
                    )
                out_buf[slot, r] = acc
            out_dma(slot, i).start()

        jax.lax.fori_loop(0, num_chunks, body, None)
        for j in range(max(0, num_chunks - S), num_chunks):
            out_dma(j % S, j).wait()

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((S, R, D, block, block), jnp.int8),
                pltpu.VMEM((S, win, F, block), jnp.bfloat16),
                pltpu.VMEM((S, R, F, block), jnp.float32),
                pltpu.SemaphoreType.DMA((S,)),
                pltpu.SemaphoreType.DMA((S,)),
                pltpu.SemaphoreType.DMA((S,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nb, F, block), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    return call(q.scales.reshape(-1), q.band_qT, xb)


def to_blocked(xT_pad, block):
    """``[F, NBwin·block]`` feature-major → ``[NBwin, F, block]`` blocked
    (one-time layout prep; a blocked serving stack keeps this layout)."""
    F, total = xT_pad.shape
    return jnp.swapaxes(xT_pad.reshape(F, total // block, block), 0, 1)


def quantize_xT_blocks(xT_pad_bf16, block):
    """Per-column-block symmetric int8 quantization of the padded
    feature-major activations: ``[F, NBwin·block]`` → int8 + one f32
    scale per block (max-abs / 127; all-zero blocks get scale 1)."""
    F, total = xT_pad_bf16.shape
    nbw = total // block
    xb = xT_pad_bf16.astype(jnp.float32).reshape(F, nbw, block)
    maxabs = jnp.max(jnp.abs(xb), axis=(0, 2))
    scale = jnp.where(maxabs > 0, maxabs / 127.0, 1.0)
    xq = jnp.clip(
        jnp.round(xb / scale[None, :, None]), -127, 127
    ).astype(jnp.int8)
    return xq.reshape(F, total), scale.astype(jnp.float32)


def fm_w8a8(q: QuantizedBandedMatrixFM, xqT_pad, xscales, *,
            rows_per_step=32, interpret=False):
    """int8 band × int8 activations through native int8 MXU dots
    (int32 accumulate), f32 scale fixup per (tile, x-block) — ZERO
    conversion of the band, half the x DMA bytes."""
    block, nb, W = q.block, q.num_blocks, q.bandwidth
    D = 2 * W + 1
    F = xqT_pad.shape[0]
    R = rows_per_step
    num_chunks = nb // R

    def body(i, slot, scalar_refs, band_buf, x_buf, out_buf):
        scales_ref, xscale_ref = scalar_refs
        for r in range(R):
            acc = jnp.zeros((F, block), jnp.float32)
            for d in range(D):
                tileT = band_buf[slot, r, d]
                xw = x_buf[slot, :, (r + d) * block:(r + d + 1) * block]
                dot_i32 = jnp.dot(
                    xw, tileT, preferred_element_type=jnp.int32
                )
                s = (
                    scales_ref[(i * R + r) * D + d]
                    * xscale_ref[i * R + r + d]
                )
                acc += s * dot_i32.astype(jnp.float32)
            out_buf[slot, :, r * block:(r + 1) * block] = acc

    call = _fm_pipeline(
        body, nb=nb, D=D, W=W, R=R, block=block, F=F,
        band_dtype=jnp.int8, x_dtype=jnp.int8, num_chunks=num_chunks,
        extra_scalars=1, interpret=interpret,
    )
    return call(
        q.scales.reshape(-1), xscales, q.band_qT, xqT_pad
    )[:, : q.num_nodes]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--json", action="store_true")
    p.add_argument(
        "--variants",
        default="fm_shipped,fm_dma_only,fm_deep_sweep,fm_compute_only,"
                "fm_bf16_band,fm_w8a8,r_sweep",
    )
    args = p.parse_args()

    num_nodes, degree, band_nodes, block, F = 1 << 20, 38, 512, 256, 64
    a, E = build_band(num_nodes, degree, band_nodes, block)
    nb, W = a.band.shape[0], a.bandwidth
    D = 2 * W + 1
    xT = jax.random.normal(
        jax.random.PRNGKey(1), (F, num_nodes), jnp.float32
    )
    ref = banded_spmm(a, jnp.asarray(xT.T))
    q = to_feature_major(quantize_band(a))
    band_bf16T = jnp.swapaxes(
        (a.band * (1.0 / jnp.maximum(q.scales, 1e-30))[:, :, None, None])
        .astype(jnp.bfloat16), 2, 3,
    )  # same scale structure as the int8 kernel, bf16 payload
    a.band.delete()

    results = {"config": f"{num_nodes} nodes / {E} edges, W={W} blocks of "
                         f"{block}, F={F}"}
    band_bytes = q.band_qT.size
    out_bytes = nb * block * F * 4

    def traffic_ms(Rv, band_scale=1.0, x_bytes_per_el=2):
        x_bytes = (Rv + 2 * W) / Rv * nb * block * F * x_bytes_per_el
        return (
            (band_bytes * band_scale + x_bytes + out_bytes) / EFFECTIVE_BPS
            * 1e3
        )

    variants = [v.strip() for v in args.variants.split(",")]

    if "fm_shipped" in variants:
        rel = float(
            jnp.linalg.norm(banded_spmm_quant_fm(q, xT).T - ref)
            / jnp.linalg.norm(ref)
        )
        dt = chained_loop_time(
            lambda v, bq, s: banded_spmm_quant_fm(
                QuantizedBandedMatrixFM(bq, s, num_nodes, W), v
            ),
            xT, args.iters, q.band_qT, q.scales,
        )
        results["fm_shipped"] = {
            "ms": dt * 1e3, "edges_per_s": E / dt, "rel_err": rel,
            "traffic_ideal_ms": traffic_ms(32),
        }
        print("fm_shipped", results["fm_shipped"], file=sys.stderr)

    if "fm_dma_only" in variants:
        dt = chained_loop_time(
            lambda v, bq, s: fm_dma_only(
                QuantizedBandedMatrixFM(bq, s, num_nodes, W), v
            ),
            xT, args.iters, q.band_qT, q.scales,
        )
        results["fm_dma_only"] = {
            "ms": dt * 1e3, "traffic_ideal_ms": traffic_ms(32),
        }
        print("fm_dma_only", results["fm_dma_only"], file=sys.stderr)

    if "fm_deep_sweep" in variants:
        sweep = {}
        for (R, S, K) in [
            (32, 2, 1),  # shipped geometry through the generalized kernel
            (32, 3, 1), (32, 4, 1), (32, 4, 4),
            (16, 6, 1), (16, 8, 2), (64, 3, 1),
        ]:
            out = fm_deep(q, xT, rows_per_step=R, depth=S, band_splits=K)
            rel = float(jnp.linalg.norm(out.T - ref) / jnp.linalg.norm(ref))
            dt = chained_loop_time(
                lambda v, bq, s, R=R, S=S, K=K: fm_deep(
                    QuantizedBandedMatrixFM(bq, s, num_nodes, W), v,
                    rows_per_step=R, depth=S, band_splits=K,
                ),
                xT, args.iters, q.band_qT, q.scales,
            )
            key = f"r{R}_depth{S}_split{K}"
            sweep[key] = {
                "ms": dt * 1e3, "edges_per_s": E / dt, "rel_err": rel,
                "traffic_ideal_ms": traffic_ms(R),
            }
            print(f"fm_deep {key}", sweep[key], file=sys.stderr)
        results["fm_deep_sweep"] = sweep

    if "fm_blocked" in variants:
        sweep = {}
        xb0 = to_blocked(_pad_xT(xT, num_nodes, nb, W, block), block)
        for (R, S) in [(32, 2), (32, 4), (16, 4), (64, 2)]:
            out_b = fm_blocked(q, xb0, rows_per_step=R, depth=S)
            outT = jnp.swapaxes(out_b, 0, 1).reshape(F, nb * block)
            rel = float(
                jnp.linalg.norm(outT[:, :num_nodes].T - ref)
                / jnp.linalg.norm(ref)
            )

            def fn(v, bq, s, R=R, S=S):
                o = fm_blocked(
                    QuantizedBandedMatrixFM(bq, s, num_nodes, W), v,
                    rows_per_step=R, depth=S,
                )
                return jax.lax.dynamic_update_slice(
                    jnp.zeros_like(v), o.astype(v.dtype), (W, 0, 0)
                )

            dt = chained_loop_time(fn, xb0, args.iters, q.band_qT, q.scales)
            key = f"r{R}_depth{S}"
            sweep[key] = {
                "ms": dt * 1e3, "edges_per_s": E / dt, "rel_err": rel,
                "traffic_ideal_ms": traffic_ms(R),
            }
            print(f"fm_blocked {key}", sweep[key], file=sys.stderr)
        results["fm_blocked"] = sweep

    if "fm_compute_only" in variants:
        # perturb the (tiny) scales per iteration: the pallas_call cannot
        # be hoisted out of the timing loop, and no giant re-pad is paid
        def step(bq, s, v, eps, i):
            out = fm_compute_only(
                QuantizedBandedMatrixFM(bq, s + eps, num_nodes, W), v
            )
            return jnp.sum(out)

        dt = device_loop_time(
            step, (q.band_qT, q.scales, xT), args.iters
        )
        results["fm_compute_only"] = {"ms": dt * 1e3}
        print("fm_compute_only", results["fm_compute_only"], file=sys.stderr)

    if "fm_bf16_band" in variants:
        out = fm_bf16_band(band_bf16T, q.scales, num_nodes, W, xT)
        rel = float(jnp.linalg.norm(out.T - ref) / jnp.linalg.norm(ref))
        dt = chained_loop_time(
            lambda v, b, s: fm_bf16_band(b, s, num_nodes, W, v),
            xT, args.iters, band_bf16T, q.scales,
        )
        results["fm_bf16_band"] = {
            "ms": dt * 1e3, "rel_err": rel,
            "traffic_ideal_ms": traffic_ms(32, band_scale=2.0),
        }
        print("fm_bf16_band", results["fm_bf16_band"], file=sys.stderr)

    if "fm_w8a8" in variants:
        xT_pad = _pad_xT(xT, num_nodes, nb, W, block)
        xq, xs = quantize_xT_blocks(xT_pad, block)
        out = fm_w8a8(q, xq, xs)
        rel = float(jnp.linalg.norm(out.T - ref) / jnp.linalg.norm(ref))

        # kernel-only: perturb the band scales (re-quantizing 268 MB of
        # activations per iteration would swamp the measurement)
        def step(bq, s, xqv, xsv, eps, i):
            return jnp.sum(
                fm_w8a8(
                    QuantizedBandedMatrixFM(bq, s + eps, num_nodes, W),
                    xqv, xsv,
                )
            )

        dt = device_loop_time(
            step, (q.band_qT, q.scales, xq, xs), args.iters
        )

        # the activation re-quantization a layer boundary would pay,
        # measured separately (fusable into the previous layer's epilogue
        # in whole-model serving)
        def qstep(xp, eps, i):
            xqv, xsv = quantize_xT_blocks(xp + eps, block)
            return jnp.sum(xsv) + jnp.float32(xqv[0, 0])

        dt_q = device_loop_time(qstep, (xT_pad,), args.iters)
        results["fm_w8a8"] = {
            "kernel_ms": dt * 1e3, "edges_per_s": E / dt, "rel_err": rel,
            "quantize_x_ms": dt_q * 1e3,
            "end_to_end_ms": (dt + dt_q) * 1e3,
            "traffic_ideal_ms": traffic_ms(32, x_bytes_per_el=1),
        }
        print("fm_w8a8", results["fm_w8a8"], file=sys.stderr)

    if "r_sweep" in variants:
        sweep = {}
        for R in (8, 16, 32, 64):
            dt = chained_loop_time(
                lambda v, bq, s, R=R: banded_spmm_quant_fm(
                    QuantizedBandedMatrixFM(bq, s, num_nodes, W), v,
                    rows_per_step=R,
                ),
                xT, args.iters, q.band_qT, q.scales,
            )
            sweep[f"r{R}"] = {
                "ms": dt * 1e3, "traffic_ideal_ms": traffic_ms(R),
            }
            print(f"r_sweep r{R}", sweep[f"r{R}"], file=sys.stderr)
        results["r_sweep"] = sweep

    if args.json:
        print(json.dumps(results, indent=2))
    else:
        print(results)


if __name__ == "__main__":
    main()
