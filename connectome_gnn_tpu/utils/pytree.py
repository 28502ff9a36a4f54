"""Pytree dataclass utilities.

The framework keeps all device-resident containers (batches, model params,
optimizer state) as JAX pytrees so they flow through ``jit`` / ``grad`` /
``shard_map`` transparently.  ``pytree_dataclass`` is a tiny decorator that
turns a dataclass into a registered pytree node: array fields become pytree
leaves, and fields declared with ``static_field()`` become hashable aux data
(part of the jit cache key, e.g. a batch's static graph count).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax


def static_field(**kwargs: Any) -> dataclasses.Field:
    """A dataclass field treated as static (non-traced) pytree metadata."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type) -> type:
    """Class decorator: dataclass + pytree registration.

    Fields created with :func:`static_field` are registered as meta fields
    (static, hashable); everything else is a data leaf.
    """
    cls = dataclasses.dataclass(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=tuple(data_fields), meta_fields=tuple(meta_fields)
    )
    return cls
