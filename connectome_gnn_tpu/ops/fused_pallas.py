"""Fused Pallas TPU kernel: whole-model GCN inference in one dispatch.

At connectome scale (tens to hundreds of 84-360-node graphs per batch), a
jitted forward pass is ~30 small XLA ops; the math itself is microseconds
on the MXU, so both dispatch latency and inter-op HBM traffic dominate.
This kernel runs the ENTIRE GCNConnectome inference forward — L
symmetric-normalized convolutions with folded BatchNorm (eval mode) + ReLU,
masked mean-pool, and the 2-layer MLP head — inside a single
``pallas_call``, keeping every intermediate in VMEM.

Blocking strategy: the grid iterates over *groups of G graphs*; each step
DMAs a ``[G, n, n]`` adjacency slab + features into VMEM (double-buffered
by the Pallas pipeline, so DMA overlaps compute) and loops over the G
graphs locally.  ``G`` is chosen at call time as the largest batch divisor
whose working set fits a VMEM budget — small batches collapse to a single
grid step (minimum latency), giant packed batches stream through VMEM
without ever materializing whole-batch intermediates in HBM.

Eval-mode BatchNorm and the conv bias fold into one affine per layer
(computed on host at call time from params/state):

    BN(z + b_conv) = z * s' + t',   s' = scale / sqrt(var + eps)
                                    t' = (b_conv - mean) * s' + bias

Numerics match :meth:`GCNConnectome.apply` on a dense batch to f32
round-off (validated in ``tests/test_fused.py``; bitwise-identical on TPU
in practice).

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

#: VMEM budget for the double-buffered per-step operand slabs.
# Sized from the round-4 sweep (benchmarks/fused_block_sweep.py,
# FUSED_SWEEP_r04.json): at the packed-512 config G=64 is the fastest
# group (104.5 vs 109.2 us at G=32), while G=128 exceeds the compiler's
# 16 MB scoped-VMEM limit (25.6 MB requested — hard compile error, not
# a spill).  11 MB lands the heuristic on G=64 for the 88-node/H=64
# shape with ~20% headroom under the scoped limit (the estimate below
# undercounts the compiler's accounting by about that much at G=128).
_VMEM_BLOCK_BUDGET = 11 * 1024 * 1024


def _fused_gcn_kernel(
    x_ref,        # [G, n, F]   this group's node features (grid-blocked)
    adj_ref,      # [G, n, n]   this group's adjacencies (grid-blocked)
    mask_ref,     # [G, n, 1]   1.0 for real nodes
    w_in_ref,     # [F, H]      first conv kernel
    w_h_ref,      # [L-1, H, H] remaining conv kernels
    bn_scale_ref, # [L, H]      folded affine scale  s'
    bn_shift_ref, # [L, H]      folded affine shift  t'
    w_f1_ref,     # [H, H2]     head layer 1
    b_f1_ref,     # [1, H2]
    w_f2_ref,     # [H2, C]     head layer 2
    b_f2_ref,     # [1, C]
    out_ref,      # [B, C]      logits (full block, written in last step)
    pooled_ref,   # scratch [S, G, H] — persists across grid steps
    *,
    num_layers: int,
    graphs_per_block: int,
):
    step = pl.program_id(0)
    num_steps = pl.num_programs(0)
    G = graphs_per_block

    adj = adj_ref[:]                          # [G, n, n]
    m = mask_ref[:]                           # [G, n, 1]

    # Symmetric normalization with self-loop weight 1.0, batched over the
    # group (reference models.py:94-108; column sums = sender degrees).
    deg = jnp.sum(adj, axis=1) + 1.0          # [G, n]
    dinv = jax.lax.rsqrt(deg + EPS)
    adj_n = dinv[:, :, None] * adj * dinv[:, None, :]
    self_n = (dinv * dinv)[:, :, None]        # [G, n, 1]

    h = x_ref[:]                              # [G, n, F]
    for layer in range(num_layers):
        w = w_in_ref[:] if layer == 0 else w_h_ref[layer - 1]
        # [G, n, D] @ [D, H] — plain contraction, one big MXU matmul.
        hw = jax.lax.dot_general(
            h, w,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # [G, n, n] @ [G, n, H] — batched aggregation on the MXU.
        agg = (
            jax.lax.dot_general(
                adj_n, hw,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            + self_n * hw
        )
        h = agg * bn_scale_ref[layer] + bn_shift_ref[layer]
        h = jnp.maximum(h, 0.0)

    # Masked mean-pool (same +1e-8 denominator as segment-mean).
    pooled = jnp.sum(h * m, axis=1) / (jnp.sum(m, axis=1) + EPS)  # [G, H]
    pooled_ref[step] = pooled

    # MLP head over all graphs once every pool is in scratch.
    @pl.when(step == num_steps - 1)
    def _():
        B = num_steps * G
        flat = pooled_ref[:].reshape(B, pooled.shape[-1])
        hidden = jnp.maximum(
            jnp.dot(flat, w_f1_ref[:], preferred_element_type=jnp.float32)
            + b_f1_ref[0],
            0.0,
        )
        out_ref[:] = (
            jnp.dot(hidden, w_f2_ref[:], preferred_element_type=jnp.float32)
            + b_f2_ref[0]
        )


def fold_bn_affine(
    params: dict,
    state: dict,
    num_layers: int,
    eps: float = 1e-5,
    include_conv_bias: bool = True,
):
    """Fold eval-mode BatchNorm into per-layer (scale, shift).

    With ``include_conv_bias`` the conv bias is folded in too (valid when
    the bias is added *before* BN, as in GCN); SAGE's bias sits inside the
    ReLU and must stay separate.
    """
    scales, shifts = [], []
    for i in range(num_layers):
        bn_p = params["norms"][i]
        bn_s = state["norms"][i]
        inv = jax.lax.rsqrt(bn_s["var"] + eps)
        s = bn_p["scale"] * inv
        pre = params["convs"][i]["bias"] if include_conv_bias else 0.0
        t = (pre - bn_s["mean"]) * s + bn_p["bias"]
        scales.append(s)
        shifts.append(t)
    return jnp.stack(scales), jnp.stack(shifts)


def _choose_graphs_per_block(B: int, n: int, F: int, H: int) -> int:
    """Largest divisor of ``B`` whose working set fits the VMEM budget.

    Counts the double-buffered input slabs (adj, x, mask) plus the
    in-kernel intermediates: the normalized-adjacency copy (``n×n``) and
    the activation/aggregate buffers at hidden width (~3·``n×H``).
    """
    bytes_per_graph = 4 * (
        2 * (n * n + n * max(F, 8) + n)  # double-buffered input slabs
        + n * n                          # adj_n
        + 3 * n * max(H, F)              # h / hw / agg
    )
    max_g = max(int(_VMEM_BLOCK_BUDGET // bytes_per_graph), 1)
    g = min(B, max_g)
    while B % g:
        g -= 1
    return g


@partial(jax.jit, static_argnames=("num_layers", "interpret", "group"))
def fused_gcn_forward(
    params: dict,
    state: dict,
    x: jnp.ndarray,
    adj: jnp.ndarray,
    node_mask: jnp.ndarray,
    *,
    num_layers: int = 3,
    interpret: bool = False,
    group: int | None = None,
) -> jnp.ndarray:
    """Run the fused GCN inference kernel.  Returns logits ``[B, C]``.

    ``params``/``state`` are the standard :class:`GCNConnectome` pytrees;
    ``x``/``adj``/``node_mask`` come from a :class:`DenseConnectomeBatch`.
    """
    B, n, F = x.shape
    H = params["convs"][-1]["kernel"].shape[1]
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

    G = group if group is not None else _choose_graphs_per_block(B, n, F, H)
    kernel = partial(
        _fused_gcn_kernel, num_layers=num_layers, graphs_per_block=G
    )
    per_group = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b: (b,) + (0,) * (len(shape) - 1), memory_space=pltpu.VMEM
    )
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // G,),
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        in_specs=[
            per_group((G, n, F)),       # x
            per_group((G, n, n)),       # adj
            per_group((G, n, 1)),       # mask
            whole,                      # w_in
            whole,                      # w_h
            whole,                      # bn_scale
            whole,                      # bn_shift
            whole,                      # w_f1
            whole,                      # b_f1
            whole,                      # w_f2
            whole,                      # b_f2
        ],
        out_specs=pl.BlockSpec((B, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B // G, G, H), jnp.float32)],
        interpret=interpret,
    )(
        x,
        adj,
        node_mask.astype(jnp.float32)[:, :, None],
        w_in,
        w_h,
        bn_scale,
        bn_shift,
        params["head"]["fc1"]["kernel"],
        params["head"]["fc1"]["bias"][None, :],
        params["head"]["fc2"]["kernel"],
        params["head"]["fc2"]["bias"][None, :],
    )


def _uniform_hidden_width(model, params: dict) -> bool:
    """Whether every post-input conv layer is ``H → H`` (the fused kernels'
    weight-stacking precondition); ``2H → H`` for SAGE's concat kernels."""
    H = params["convs"][-1]["kernel"].shape[1]
    in_mult = params["convs"][-1]["kernel"].shape[0] // H if model.num_layers > 1 else 1
    return all(
        params["convs"][i]["kernel"].shape == (in_mult * H, H)
        for i in range(1, model.num_layers)
    )


def forward_auto(
    model, params: dict, state: dict, batch, *, interpret: bool = False
) -> jnp.ndarray:
    """Inference forward choosing the fastest verified-equivalent path,
    dispatched on the model family (GCN → :func:`fused_gcn_forward`,
    GraphSAGE → :func:`fused_sage_forward`).

    Measured on v5e (device-side steady state): the fused kernels match
    XLA's batched-matmul dense path for small graphs (n ≲ 128) while
    collapsing ~30 dispatches into one (≈10× lower serving latency through
    a remote runtime); for large graphs (n=360, h=256) XLA's pipelined
    batched matmul wins.  This helper picks per batch shape and model; the
    fused kernels require the TPU backend unless ``interpret`` forces the
    Pallas interpreter (how CPU tests exercise this exact path).  Falls
    back to ``model.apply`` for COO-layout batches, non-uniform hidden
    widths, or model families without a fused kernel.
    """
    from connectome_gnn_tpu.models import GCNConnectome, GraphSAGEConnectome

    if isinstance(model, GCNConnectome):
        fused_fn = fused_gcn_forward
    elif isinstance(model, GraphSAGEConnectome):
        fused_fn = fused_sage_forward
    else:
        fused_fn = None
    if (
        fused_fn is not None
        and hasattr(batch, "adj")
        and batch.node_features.shape[1] <= 128
        and _uniform_hidden_width(model, params)
        and (interpret or jax.default_backend() == "tpu")
    ):
        return _fused_with_vmem_retry(
            fused_fn, params, state, batch, model.num_layers, interpret
        )
    logits, _ = model.apply(params, state, batch, train=False)
    return logits


#: (fn, B, n, F, H, L) -> group size proven to compile under the
#: 16 MB scoped-VMEM limit on this backend
_PROVEN_GROUPS: dict = {}


def _fused_with_vmem_retry(fused_fn, params, state, batch, num_layers,
                           interpret):
    """Call a fused kernel, retrying with the next-smaller divisor group
    when the compiler rejects the heuristic's pick for scoped VMEM.

    The `_choose_graphs_per_block` estimate undercounts the compiler's
    scoped accounting by ~23% at the swept shape (see
    ``_VMEM_BLOCK_BUDGET``); for unswept (n, F, H) combinations the
    chosen ``G`` may exceed the 16 MB limit — a hard compile error, not
    a spill.  Each shape's first proven group is cached so the fallback
    compiles are paid once.  (Under an outer trace — mesh serving —
    the error surfaces at the caller's compile as before.)
    """
    B, n, F = batch.node_features.shape
    H = params["convs"][-1]["kernel"].shape[1]
    key = (fused_fn, B, n, F, H, num_layers)
    g = _PROVEN_GROUPS.get(key)
    if g is None:
        g = _choose_graphs_per_block(B, n, F, H)
    args = (params, state, batch.node_features, batch.adj,
            batch.node_mask)
    while True:
        try:
            out = fused_fn(*args, num_layers=num_layers,
                           interpret=interpret, group=g)
            _PROVEN_GROUPS[key] = g
            return out
        except Exception as e:
            msg = str(e).lower()
            if g <= 1 or ("vmem" not in msg and "resource" not in msg):
                raise
            g -= 1
            while g > 1 and B % g:
                g -= 1


def gcn_forward_auto(
    model, params: dict, state: dict, batch, *, interpret: bool = False
) -> jnp.ndarray:
    """Back-compat alias of :func:`forward_auto` (GCN-only call sites)."""
    return forward_auto(model, params, state, batch, interpret=interpret)


def _fused_sage_kernel(
    x_ref,         # [G, n, F]
    adj_ref,       # [G, n, n]
    mask_ref,      # [G, n, 1]
    w_self_in_ref, # [F, H]
    w_agg_in_ref,  # [F, H]
    w_self_h_ref,  # [L-1, H, H]
    w_agg_h_ref,   # [L-1, H, H]
    b_ref,         # [L, H]     conv bias (inside the ReLU)
    bn_scale_ref,  # [L, H]     eval-BN affine scale (applied after ReLU)
    bn_shift_ref,  # [L, H]
    w_f1_ref,      # [H, H2]
    b_f1_ref,      # [1, H2]
    w_f2_ref,      # [H2, C]
    b_f2_ref,      # [1, C]
    out_ref,       # [B, C]
    pooled_ref,    # scratch [S, G, H]
    *,
    num_layers: int,
    graphs_per_block: int,
):
    """Whole-model GraphSAGE inference for one group of graphs.

    Per layer (reference models.py:136-152, 256-262): weighted-mean
    aggregate → split-matmul concat projection → ReLU, then the folded
    eval-BatchNorm affine (SAGE's encode has no post-BN ReLU).  The concat
    ``[h, agg] @ W`` is computed as ``h @ W_self + agg @ W_agg`` to stay
    concat-free in VMEM.
    """
    step = pl.program_id(0)
    num_steps = pl.num_programs(0)
    G = graphs_per_block

    adj = adj_ref[:]                          # [G, n, n]
    m = mask_ref[:]                           # [G, n, 1]
    w_sum = jnp.sum(adj, axis=2, keepdims=True) + EPS  # [G, n, 1]

    h = x_ref[:]
    for layer in range(num_layers):
        w_self = w_self_in_ref[:] if layer == 0 else w_self_h_ref[layer - 1]
        w_agg = w_agg_in_ref[:] if layer == 0 else w_agg_h_ref[layer - 1]
        msum = jax.lax.dot_general(
            adj, h,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        agg = msum / w_sum
        z = (
            jax.lax.dot_general(
                h, w_self,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                agg, w_agg,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b_ref[layer]
        )
        h = jnp.maximum(z, 0.0) * bn_scale_ref[layer] + bn_shift_ref[layer]

    pooled = jnp.sum(h * m, axis=1) / (jnp.sum(m, axis=1) + EPS)
    pooled_ref[step] = pooled

    @pl.when(step == num_steps - 1)
    def _():
        B = num_steps * G
        flat = pooled_ref[:].reshape(B, pooled.shape[-1])
        hidden = jnp.maximum(
            jnp.dot(flat, w_f1_ref[:], preferred_element_type=jnp.float32)
            + b_f1_ref[0],
            0.0,
        )
        out_ref[:] = (
            jnp.dot(hidden, w_f2_ref[:], preferred_element_type=jnp.float32)
            + b_f2_ref[0]
        )


@partial(jax.jit, static_argnames=("num_layers", "interpret", "group"))
def fused_sage_forward(
    params: dict,
    state: dict,
    x: jnp.ndarray,
    adj: jnp.ndarray,
    node_mask: jnp.ndarray,
    *,
    num_layers: int = 3,
    interpret: bool = False,
    group: int | None = None,
) -> jnp.ndarray:
    """Fused GraphSAGE inference kernel.  Returns logits ``[B, C]``.

    ``params``/``state`` are :class:`GraphSAGEConnectome` pytrees;
    ``x``/``adj``/``node_mask`` come from a :class:`DenseConnectomeBatch`.
    """
    B, n, F = x.shape
    H = params["convs"][-1]["kernel"].shape[1]
    C = params["head"]["fc2"]["kernel"].shape[1]
    for i in range(1, num_layers):
        if params["convs"][i]["kernel"].shape != (2 * H, H):
            raise ValueError(
                "fused kernel requires uniform hidden width across layers"
            )

    # eval-BN affine (applied AFTER the in-layer ReLU; conv bias cannot be
    # folded through the nonlinearity, so it stays separate)
    bn_scale, bn_shift = fold_bn_affine(
        params, state, num_layers, include_conv_bias=False
    )

    k0 = params["convs"][0]["kernel"]  # [2F, H]
    w_self_in, w_agg_in = k0[:F], k0[F:]
    if num_layers > 1:
        w_self_h = jnp.stack(
            [params["convs"][i]["kernel"][:H] for i in range(1, num_layers)]
        )
        w_agg_h = jnp.stack(
            [params["convs"][i]["kernel"][H:] for i in range(1, num_layers)]
        )
    else:
        w_self_h = jnp.zeros((1, H, H), jnp.float32)
        w_agg_h = jnp.zeros((1, H, H), jnp.float32)
    biases = jnp.stack(
        [params["convs"][i]["bias"] for i in range(num_layers)]
    )

    G = group if group is not None else _choose_graphs_per_block(B, n, F, H)
    kernel = partial(
        _fused_sage_kernel, num_layers=num_layers, graphs_per_block=G
    )
    per_group = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b: (b,) + (0,) * (len(shape) - 1), memory_space=pltpu.VMEM
    )
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // G,),
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        in_specs=[
            per_group((G, n, F)),
            per_group((G, n, n)),
            per_group((G, n, 1)),
        ]
        + [whole] * 11,
        out_specs=pl.BlockSpec((B, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B // G, G, H), jnp.float32)],
        interpret=interpret,
    )(
        x,
        adj,
        node_mask.astype(jnp.float32)[:, :, None],
        w_self_in,
        w_agg_in,
        w_self_h,
        w_agg_h,
        biases,
        bn_scale,
        bn_shift,
        params["head"]["fc1"]["kernel"],
        params["head"]["fc1"]["bias"][None, :],
        params["head"]["fc2"]["kernel"],
        params["head"]["fc2"]["bias"][None, :],
    )
