"""Pytree dataclass helper.

All engine state (rays, interactions, scene banks, film) is held in frozen
dataclasses registered as JAX pytrees so they flow through jit/vmap/scan
untouched. Static (non-array) configuration goes in ``meta_fields`` so it
participates in the jit cache key instead of being traced.

Reference parity: plays the role of Adapt.adapt_structure in Hikari.jl
(/root/reference/src/kernel-abstractions.jl:9-190) — but in JAX there is no
host/device boundary to adapt across; pytrees are device-ready by
construction.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, TypeVar

import jax

_T = TypeVar("_T")


def pytree_dataclass(cls: type | None = None, *, static: tuple[str, ...] = ()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields named in ``static`` are metadata (hashable, not traced).
    """

    def wrap(c: type[_T]) -> type[_T]:
        c = dataclasses.dataclass(frozen=True)(c)
        field_names = [f.name for f in dataclasses.fields(c)]
        data_fields = [f for f in field_names if f not in static]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(static)
        )

        def _replace(self, **kw: Any):
            return dataclasses.replace(self, **kw)

        c.replace = _replace  # type: ignore[attr-defined]
        return c

    return wrap(cls) if cls is not None else wrap
