"""Interop with the reference PyTorch implementation.

``params_from_reference_state_dict`` maps a reference model's
``state_dict()`` (``GCNConnectome`` / ``GraphSAGEConnectome``,
reference ``connectome_gnn/models.py:159-266``) onto this framework's
parameter/state pytrees.  Used by the activation-parity test suite: load
identical weights, feed identical batches, assert per-layer ``allclose``.

Only numpy is required here — tensors are expected to be converted with
``{k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}``
by the caller, keeping torch out of the framework's dependency set.

Key mapping (torch → ours):

==============================  =======================================
``convs.{i}.linear.weight``     ``params["convs"][i]["kernel"].T``
``convs.{i}.bias`` (GCN)        ``params["convs"][i]["bias"]``
``convs.{i}.linear.bias``(SAGE) ``params["convs"][i]["bias"]``
``batch_norms.{i}.weight``      ``params["norms"][i]["scale"]``
``batch_norms.{i}.bias``        ``params["norms"][i]["bias"]``
``batch_norms.{i}.running_*``   ``state["norms"][i]["mean"/"var"]``
``classifier.0.*``              ``params["head"]["fc1"]`` (transposed)
``classifier.3.*``              ``params["head"]["fc2"]`` (transposed)
==============================  =======================================
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np


def params_from_reference_state_dict(
    state_dict: Mapping[str, np.ndarray], num_layers: int
) -> tuple[dict, dict]:
    """Convert a reference ``state_dict`` (as numpy arrays) to
    ``(params, state)`` pytrees for the matching model class."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    convs = []
    for i in range(num_layers):
        conv: dict = {
            "kernel": jnp.asarray(sd[f"convs.{i}.linear.weight"].T),
        }
        if f"convs.{i}.bias" in sd:  # GCN: separate post-aggregation bias
            conv["bias"] = jnp.asarray(sd[f"convs.{i}.bias"])
        elif f"convs.{i}.linear.bias" in sd:  # SAGE: bias inside the linear
            conv["bias"] = jnp.asarray(sd[f"convs.{i}.linear.bias"])
        convs.append(conv)

    norm_params = [
        {
            "scale": jnp.asarray(sd[f"batch_norms.{i}.weight"]),
            "bias": jnp.asarray(sd[f"batch_norms.{i}.bias"]),
        }
        for i in range(num_layers)
    ]
    norm_states = [
        {
            "mean": jnp.asarray(sd[f"batch_norms.{i}.running_mean"]),
            "var": jnp.asarray(sd[f"batch_norms.{i}.running_var"]),
        }
        for i in range(num_layers)
    ]

    head = {
        "fc1": {
            "kernel": jnp.asarray(sd["classifier.0.weight"].T),
            "bias": jnp.asarray(sd["classifier.0.bias"]),
        },
        "fc2": {
            "kernel": jnp.asarray(sd["classifier.3.weight"].T),
            "bias": jnp.asarray(sd["classifier.3.bias"]),
        },
    }

    params = {"convs": convs, "norms": norm_params, "head": head}
    state = {"norms": norm_states}
    return params, state
