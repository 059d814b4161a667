"""Pytree dataclass helper.

The reference renderer threads state through C++ structs (RayWorkItem,
SampledWavelengths, ...; see /root/reference/src/pbrt/wavefront/workitems.soa).
Here every such record is a frozen dataclass registered as a JAX pytree whose
array fields are structure-of-arrays batches ("SOA by construction" — no soac
codegen needed).

Fields marked `static_field()` are hashable aux data (shapes, flags) that
participate in jit caching rather than tracing.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax


def static_field(**kwargs: Any) -> Any:
    """A dataclass field treated as static (pytree aux data)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree(cls: type) -> type:
    """Decorator: frozen dataclass registered as a JAX pytree node."""
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

    def _replace(self, **updates: Any):
        return dataclasses.replace(self, **updates)

    cls.replace = _replace
    return cls
