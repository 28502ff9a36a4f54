"""Pallas TPU kernel for banded block-dense SpMM (alternative path).

The grid walks row blocks; the padded feature array is passed ``2W+1``
times with *shifted* block index maps so Mosaic double-buffers the band
slab and the sender blocks from HBM, and the per-step compute is
``2W+1`` MXU matmuls accumulated in VMEM f32.  Verified bitwise-close to
the XLA path (``tests/test_banded.py::TestBandedPallas``).

**Measured outcome (v5e, 1M nodes / 40M edges, F=64): the XLA einsum
path WINS** — XLA fuses the shifted-window ``take`` into the contraction
and runs at ~88% of HBM peak (9.8 ms), while this kernel's pipeline
sustains only ~350-450 GB/s (15.5 ms f32, 10.5 ms with a bf16 band; a
single wide ``[block, (2W+1)·block]`` matmul variant measured the same).
:func:`~connectome_gnn_tpu.ops.banded.banded_spmm` therefore remains the
production path; this kernel is kept as the starting point for cases
XLA cannot fuse (e.g. future quantized bands or fused epilogues) and as
evidence the comparison was actually made.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from connectome_gnn_tpu.ops.banded import BandedMatrix


def banded_spmm_pallas(
    a: BandedMatrix, x: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """``A @ x`` over the block band in one fused Pallas kernel.

    Same math and layout as :func:`banded_spmm` (returns f32
    ``[num_nodes, F]``); the band's dtype drives the matmul operand
    dtype.  ``interpret=True`` runs the Pallas interpreter (CPU tests).
    """
    block, nb, W = a.block, a.num_blocks, a.bandwidth
    D = 2 * W + 1
    padded = nb * block
    F = x.shape[1]
    dtype = a.band.dtype

    x_pad = jnp.pad(
        x[: a.num_nodes].astype(dtype),
        ((W * block, padded - a.num_nodes + W * block), (0, 0)),
    ).reshape(nb + 2 * W, block, F)

    def kernel(band_ref, *refs):
        x_refs, out_ref = refs[:-1], refs[-1]
        acc = jnp.zeros((block, F), jnp.float32)
        for d in range(D):
            acc += jnp.dot(
                band_ref[0, d], x_refs[d][0],
                preferred_element_type=jnp.float32,
            )
        out_ref[0] = acc

    def x_spec(d):
        return pl.BlockSpec(
            (1, block, F), lambda i, d=d: (i + d, 0, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(
                (1, D, block, block), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        + [x_spec(d) for d in range(D)],
        out_specs=pl.BlockSpec(
            (1, block, F), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb, block, F), jnp.float32),
        interpret=interpret,
    )(a.band, *([x_pad] * D))
    return out.reshape(padded, F)[: a.num_nodes]
