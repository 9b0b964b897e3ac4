"""Pytree dataclass helper.

Every framework object (distributions, models, filter/sampler states) is a frozen
dataclass registered as a JAX pytree, so it can flow through ``jit``/``vmap``/``scan``
and be sharded with ``jax.sharding``. Fields marked ``static=True`` become aux data
(hashable, trigger recompilation when changed) — e.g. particle counts and dims.
"""
from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

T = TypeVar("T")


def static_field(**kwargs):
    """A dataclass field treated as static (non-traced) pytree metadata."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type[T]) -> type[T]:
    """Decorator: frozen dataclass registered with jax.tree_util.

    Data fields are traced leaves; fields created with :func:`static_field`
    are static aux data.
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
    return cls


def replace(obj: T, **changes) -> T:
    """dataclasses.replace that works on any pytree_dataclass."""
    return dataclasses.replace(obj, **changes)
