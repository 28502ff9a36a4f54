"""Counted (not modeled) collective payload accounting.

Traces a jitted/shard_map program with abstract values and walks the
jaxpr for collective primitives, summing the bytes each one moves —
so the number reflects what the PROGRAM actually exchanges, including
collectives autodiff inserted in the backward pass, not what a
closed-form model says it should.  Tracing is abstract: counting a
1M-node 8-device program costs milliseconds and no memory.

Per-device RECEIVED-bytes conventions (device count ``D`` read from
each equation's own axis):

* ``all_gather``: operand bytes × (D-1) — every other shard's block
  arrives (the local block does not cross a link);
* ``all_to_all``: operand bytes × (D-1)/D — the block kept for self
  stays local;
* ``psum`` / ``psum_invariant`` (allreduce): operand bytes × 2·(D-1)/D
  — the ring reduce-scatter + all-gather lower bound;
* ``ppermute``: operand bytes — one block in, one out.

``lax.scan`` bodies multiply by trip count; ``cond`` branches take the
max; ``while_loop`` bodies count ONCE (trip count is dynamic — callers
timing steady-state loops should trace the body instead).

The reference has nothing to count (SURVEY §0: zero parallelism); this
is the measurement side of scaling
`/root/reference/connectome_gnn/train.py:41-54` across devices.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np

#: primitive name -> f(operand_bytes, axis_size) = per-device received bytes
_COLLECTIVES = {
    "all_gather": lambda b, d: b * (d - 1),
    "all_to_all": lambda b, d: b * (d - 1) / d,
    "psum": lambda b, d: b * 2 * (d - 1) / d,
    "psum_invariant": lambda b, d: b * 2 * (d - 1) / d,
    "psum2": lambda b, d: b * 2 * (d - 1) / d,
    "reduce_scatter": lambda b, d: b * (d - 1) / d,
    "ppermute": lambda b, d: b,
}


def _aval_bytes(aval) -> int:
    try:
        return int(np.prod(aval.shape)) * aval.dtype.itemsize
    except Exception:
        return 0


def _axis_size(eqn, mesh_axis_sizes) -> int:
    names = eqn.params.get("axis_name", eqn.params.get("axes", ()))
    if not isinstance(names, (tuple, list)):
        names = (names,)
    size = 1
    for n in names:
        size *= int(mesh_axis_sizes.get(n, eqn.params.get("axis_size", 1)))
    return max(size, eqn.params.get("axis_size", 1) if not names else 1)


def _walk(jaxpr, mesh_axis_sizes, totals, mult=1.0):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in _COLLECTIVES:
            d = _axis_size(eqn, mesh_axis_sizes)
            if d > 1:
                b = sum(_aval_bytes(v.aval) for v in eqn.invars)
                totals[name] = totals.get(name, 0.0) + mult * _COLLECTIVES[
                    name
                ](b, d)
            continue
        sub_mult = mult
        if name == "scan":
            sub_mult = mult * int(eqn.params.get("length", 1))
        axes = dict(mesh_axis_sizes)
        if name == "shard_map":
            mesh = eqn.params.get("mesh")
            if mesh is not None:
                axes.update(
                    dict(zip(mesh.axis_names, mesh.axis_sizes))
                    if hasattr(mesh, "axis_sizes")
                    else dict(mesh.shape)
                )
        if name == "cond":
            branches = eqn.params.get("branches", ())
            branch_totals = []
            for br in branches:
                bt: dict = {}
                _walk(br.jaxpr, axes, bt, mult)
                branch_totals.append(bt)
            if branch_totals:
                worst = max(
                    branch_totals, key=lambda t: sum(t.values())
                )
                for k, v in worst.items():
                    totals[k] = totals.get(k, 0.0) + v
            continue
        for v in eqn.params.values():
            if hasattr(v, "eqns"):  # raw jaxpr
                _walk(v, axes, totals, sub_mult)
            elif hasattr(v, "jaxpr"):  # ClosedJaxpr
                _walk(v.jaxpr, axes, totals, sub_mult)
            elif isinstance(v, (tuple, list)):
                for w in v:
                    if hasattr(w, "jaxpr"):
                        _walk(w.jaxpr, axes, totals, sub_mult)
                    elif hasattr(w, "eqns"):
                        _walk(w, axes, totals, sub_mult)


def count_collective_bytes(fn: Callable, *args, **kwargs) -> dict:
    """Trace ``fn(*args, **kwargs)`` abstractly and return per-device
    received-bytes totals per collective primitive, plus ``"total"``.

    ``fn`` may be jitted and/or wrap ``shard_map``; args can be real
    arrays or ``jax.ShapeDtypeStruct``s.
    """
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    totals: dict = {}
    _walk(jaxpr.jaxpr, {}, totals)
    out = {k: int(round(v)) for k, v in totals.items()}
    out["total"] = int(round(sum(totals.values())))
    return out
