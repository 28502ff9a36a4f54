"""Fused Pallas TPU kernel: whole-model GCN inference in one dispatch.

At connectome scale (tens of 84-360-node graphs per batch), a jitted
forward pass is ~30 small XLA ops and is dispatch-latency-bound, not
compute-bound: the math itself is microseconds on the MXU.  This kernel
runs the ENTIRE GCNConnectome inference forward — L symmetric-normalized
convolutions with folded BatchNorm (eval mode) + ReLU, masked mean-pool,
and the 2-layer MLP head — inside a single ``pallas_call``, keeping every
intermediate in VMEM.  One dispatch, zero HBM round-trips between layers.

Eval-mode BatchNorm and the conv bias fold into one affine per layer
(computed on host at call time from params/state):

    BN(z + b_conv) = z * s' + t',   s' = scale / sqrt(var + eps)
                                    t' = (b_conv - mean) * s' + bias

Numerics match :meth:`GCNConnectome.apply` on a dense batch to f32
round-off (validated in ``tests/test_fused.py``).

Current scope: inference (eval) path, hidden-width-uniform models (all
conv layers ``H → H`` after the input layer), dense batch layout.
Training and the CSR giant-graph path use the XLA ops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-8


def _fused_gcn_kernel(
    x_ref,        # [B, n, F]   input node features
    adj_ref,      # [B, n, n]   receiver-major weighted adjacency
    mask_ref,     # [B, n]      1.0 for real nodes
    w_in_ref,     # [F, H]      first conv kernel
    w_h_ref,      # [L-1, H, H] remaining conv kernels
    bn_scale_ref, # [L, H]      folded affine scale  s'
    bn_shift_ref, # [L, H]      folded affine shift  t'
    w_f1_ref,     # [H, H2]     head layer 1
    b_f1_ref,     # [1, H2]
    w_f2_ref,     # [H2, C]     head layer 2
    b_f2_ref,     # [1, C]
    out_ref,      # [B, C]      logits
    pooled_ref,   # scratch [B, H]
    *,
    num_layers: int,
):
    B = x_ref.shape[0]

    def per_graph(b, _):
        adj = adj_ref[b]                      # [n, n]
        mask = mask_ref[b]                    # [n]

        # Symmetric normalization with self-loop weight 1.0
        # (reference models.py:94-108; column sums = sender degrees).
        deg = jnp.sum(adj, axis=0) + 1.0
        dinv = jax.lax.rsqrt(deg + EPS)       # [n]
        adj_n = dinv[:, None] * adj * dinv[None, :]
        self_n = (dinv * dinv)[:, None]       # [n, 1]

        h = x_ref[b]                          # [n, F]
        for layer in range(num_layers):
            w = w_in_ref[:] if layer == 0 else w_h_ref[layer - 1]
            hw = jnp.dot(h, w, preferred_element_type=jnp.float32)
            agg = (
                jnp.dot(adj_n, hw, preferred_element_type=jnp.float32)
                + self_n * hw
            )
            h = agg * bn_scale_ref[layer] + bn_shift_ref[layer]
            h = jnp.maximum(h, 0.0)

        # Masked mean-pool (same +1e-8 denominator as segment-mean).
        m = mask[:, None]
        pooled_ref[b, :] = jnp.sum(h * m, axis=0) / (jnp.sum(m) + EPS)
        return 0

    jax.lax.fori_loop(0, B, per_graph, 0)

    # MLP head over all graphs at once.
    hidden = jnp.maximum(
        jnp.dot(pooled_ref[:], w_f1_ref[:], preferred_element_type=jnp.float32)
        + b_f1_ref[0],
        0.0,
    )
    out_ref[:] = (
        jnp.dot(hidden, w_f2_ref[:], preferred_element_type=jnp.float32)
        + b_f2_ref[0]
    )


def fold_bn_affine(params: dict, state: dict, num_layers: int, eps: float = 1e-5):
    """Fold conv bias + eval-mode BatchNorm into per-layer (scale, shift)."""
    scales, shifts = [], []
    for i in range(num_layers):
        bn_p = params["norms"][i]
        bn_s = state["norms"][i]
        inv = jax.lax.rsqrt(bn_s["var"] + eps)
        s = bn_p["scale"] * inv
        t = (params["convs"][i]["bias"] - bn_s["mean"]) * s + bn_p["bias"]
        scales.append(s)
        shifts.append(t)
    return jnp.stack(scales), jnp.stack(shifts)


@partial(jax.jit, static_argnames=("num_layers", "interpret"))
def fused_gcn_forward(
    params: dict,
    state: dict,
    x: jnp.ndarray,
    adj: jnp.ndarray,
    node_mask: jnp.ndarray,
    *,
    num_layers: int = 3,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the fused GCN inference kernel.  Returns logits ``[B, C]``.

    ``params``/``state`` are the standard :class:`GCNConnectome` pytrees;
    ``x``/``adj``/``node_mask`` come from a :class:`DenseConnectomeBatch`.
    """
    B, n, _ = x.shape
    H = params["convs"][-1]["kernel"].shape[1]
    H2 = params["head"]["fc1"]["kernel"].shape[1]
    C = params["head"]["fc2"]["kernel"].shape[1]

    for i in range(1, num_layers):
        if params["convs"][i]["kernel"].shape != (H, H):
            raise ValueError(
                "fused kernel requires uniform hidden width across layers"
            )

    bn_scale, bn_shift = fold_bn_affine(params, state, num_layers)
    w_in = params["convs"][0]["kernel"]
    # zero-size arrays break pallas block handling → keep ≥1 (unused) slab
    w_h = (
        jnp.stack([params["convs"][i]["kernel"] for i in range(1, num_layers)])
        if num_layers > 1
        else jnp.zeros((1, H, H), jnp.float32)
    )

    kernel = partial(_fused_gcn_kernel, num_layers=num_layers)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(
        x,
        adj,
        node_mask.astype(jnp.float32),
        w_in,
        w_h,
        bn_scale,
        bn_shift,
        params["head"]["fc1"]["kernel"],
        params["head"]["fc1"]["bias"][None, :],
        params["head"]["fc2"]["kernel"],
        params["head"]["fc2"]["bias"][None, :],
    )
