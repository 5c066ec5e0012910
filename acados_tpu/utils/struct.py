"""Pytree dataclass helper.

Small wrapper over `jax.tree_util.register_dataclass` so core data structures
(OCP-QP, solver state, iterates) are plain frozen dataclasses that JAX treats
as pytrees — the TPU-native replacement for the reference's arena memory model
(/root/reference/acados/utils/mem.h:48-53): instead of calculate_size/assign
into one contiguous C buffer, each module's state is a typed pytree whose
buffers XLA lays out and donates.
"""
from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

_T = TypeVar("_T")


def pytree_dataclass(cls: type[_T]) -> type[_T]:
    """Register a (frozen) dataclass as a JAX pytree.

    Fields annotated with ``static=True`` metadata are treated as aux data
    (hashable, trigger recompilation on change); everything else is a leaf.
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    if "replace" not in cls.__dict__:
        cls.replace = lambda self, **ch: dataclasses.replace(self, **ch)
    return cls


def static_field(**kwargs):
    """A dataclass field treated as static aux data in the pytree."""
    metadata = dict(kwargs.pop("metadata", {}))
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def replace(obj, **changes):
    """dataclasses.replace that works on pytree dataclasses."""
    return dataclasses.replace(obj, **changes)
