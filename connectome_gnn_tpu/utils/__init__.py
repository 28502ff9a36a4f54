"""Utilities: pytree dataclasses, profiling, PRNG helpers."""

from connectome_gnn_tpu.utils.pytree import pytree_dataclass, static_field

__all__ = ["pytree_dataclass", "static_field"]
