"""Tiny helper: dataclasses registered as JAX pytrees.

Fields annotated in ``meta_fields`` are static (hashed into the jit
cache key); everything else is a traced leaf/subtree.
"""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta_fields: tuple = ()):
    """Decorator: freeze a dataclass and register it as a JAX pytree."""

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = tuple(
            f.name for f in dataclasses.fields(c) if f.name not in meta_fields
        )
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=tuple(meta_fields)
        )
        return c

    return wrap if cls is None else wrap(cls)
