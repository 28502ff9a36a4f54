"""Weight initializers matching the reference's PyTorch init schemes.

The reference initializes conv-layer weights with ``nn.init.xavier_uniform_``
(reference ``connectome_gnn/models.py:82,134``) and leaves head/bias params
on PyTorch's Linear default (Kaiming-uniform weight with ``a=√5`` plus
``U(±1/√fan_in)`` bias).  Reproducing both distributions keeps freshly
initialized models statistically interchangeable with the reference, which
matters for hitting the same accuracy band under the same training recipe.

JAX convention: kernels are stored ``[in_features, out_features]`` (the
transpose of torch's ``[out, in]``) so forward passes are ``x @ W``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_uniform(
    key: jax.Array, in_features: int, out_features: int, dtype=jnp.float32
) -> jnp.ndarray:
    """Glorot/Xavier uniform kernel ``[in, out]``: U(±√(6/(fan_in+fan_out)))."""
    bound = math.sqrt(6.0 / (in_features + out_features))
    return jax.random.uniform(
        key, (in_features, out_features), dtype, minval=-bound, maxval=bound
    )


def torch_linear_kernel(
    key: jax.Array, in_features: int, out_features: int, dtype=jnp.float32
) -> jnp.ndarray:
    """PyTorch ``nn.Linear`` default kernel ``[in, out]``: U(±1/√fan_in)."""
    bound = 1.0 / math.sqrt(in_features)
    return jax.random.uniform(
        key, (in_features, out_features), dtype, minval=-bound, maxval=bound
    )


def torch_linear_bias(
    key: jax.Array, in_features: int, out_features: int, dtype=jnp.float32
) -> jnp.ndarray:
    """PyTorch ``nn.Linear`` default bias: U(±1/√fan_in)."""
    bound = 1.0 / math.sqrt(in_features)
    return jax.random.uniform(
        key, (out_features,), dtype, minval=-bound, maxval=bound
    )
