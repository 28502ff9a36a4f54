"""Shared machinery for shard_map-based node-level models.

Both giant-graph model families (:class:`EdgePartitionedGCN`,
:class:`ShardedBandedGCN`) expose the same surface: an ``apply_shard``
that runs one shard inside ``shard_map``, wrapped by a cached jitted
``forward`` over the whole mesh.  The mixin hosts the wrapper and its
compile cache; the gradient-update helper centralizes the exactness rules
shared by every distributed train step.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P


class ShardMapForwardMixin:
    """Adds a cached, jitted ``forward`` around a model's ``apply_shard``.

    Requires ``apply_shard(params, state, shard, *, axis_name, train, rng)
    -> (logits, new_state)`` where ``shard`` is the local (leading-axis-
    dropped) view of the sharded input pytree.
    """

    def forward(
        self,
        params: dict,
        state: dict,
        sharded_input,
        mesh: Mesh,
        *,
        axis_name: str = "edge",
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Jitted shard_map forward; returns per-shard outputs stacked on
        the leading (mesh) axis.  Compiled once per (mesh, axis, train)."""
        cache = self.__dict__.setdefault("_fwd_cache", {})
        cache_key = (mesh, axis_name, train)
        _fwd = cache.get(cache_key)
        if _fwd is None:
            model = self

            @jax.jit
            @partial(
                jax.shard_map,
                mesh=mesh,
                in_specs=(P(), P(), P(), P(axis_name)),
                out_specs=P(axis_name),
            )
            def _fwd(params, state, rng, stacked):
                shard = jax.tree_util.tree_map(lambda a: a[0], stacked)
                logits, _ = model.apply_shard(
                    params, state, shard, axis_name=axis_name, train=train, rng=rng
                )
                return logits[None]

            cache[cache_key] = _fwd

        if rng is None:
            rng = jax.random.PRNGKey(0)
        return _fwd(params, state, rng, sharded_input)


def apply_global_update(
    optimizer: optax.GradientTransformation,
    axis_name: str,
    params,
    opt_state,
    local_sum: jnp.ndarray,
    local_n: jnp.ndarray,
    grads,
):
    """Globally-normalized optimizer update inside ``shard_map``.

    Under shard_map's varying-manual-axes autodiff the cotangent of a
    replicated (axis-invariant) input arrives already psummed across the
    axis, so ``grads`` is the GLOBAL gradient of the summed loss — an
    explicit psum here would double-count.  Only the global example-count
    normalization is applied, keeping gradients exact even when shards
    hold unequal numbers of real examples.

    Returns ``(new_params, new_opt_state, loss, n)``.
    """
    n = jnp.maximum(jax.lax.psum(local_n, axis_name), 1.0)
    grads = jax.tree_util.tree_map(lambda g: g / n, grads)
    loss = jax.lax.psum(local_sum, axis_name) / n
    updates, new_opt_state = optimizer.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    return new_params, new_opt_state, loss, n
