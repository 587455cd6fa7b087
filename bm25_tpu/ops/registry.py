"""Custom-op registry: named ops with per-target implementations.

TPU-native counterpart of the reference's custom-op registration boundary
(``@compiler.register("matrix_multiplication")`` +
``execute[target]()`` CPU/GPU dispatch,
``/root/reference/operations/graph_operation.mojo:27-128``).  Here the
"ABI" is a plain callable registered under a name with one implementation
per target platform; ``custom(name, ...)`` resolves the implementation for
the current (or requested) JAX platform, mirroring
``ops.custom(name=..., parameters={...})`` (``/root/reference/graph.py:62-73``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import jax

_REGISTRY: dict[str, "OpEntry"] = {}

GENERIC = "*"


@dataclass
class OpEntry:
    name: str
    impls: dict[str, Callable] = field(default_factory=dict)

    def resolve(self, target: str) -> Callable:
        fn = self.impls.get(target) or self.impls.get(GENERIC)
        if fn is None:
            raise KeyError(
                f"op {self.name!r} has no implementation for target "
                f"{target!r} (have {sorted(self.impls)})"
            )
        return fn


def register_op(name: str, target: str = GENERIC):
    """Decorator: register ``fn`` as the ``target`` implementation of ``name``.

    target: "*" (any), "tpu", "cpu", or another JAX platform string.
    """

    def deco(fn: Callable) -> Callable:
        entry = _REGISTRY.setdefault(name, OpEntry(name))
        if target in entry.impls:
            raise ValueError(f"duplicate registration: {name!r} for {target!r}")
        entry.impls[target] = fn
        return fn

    return deco


def get_op(name: str, target: str | None = None) -> Callable:
    """Resolve a registered op for a target (default: default device platform)."""
    try:
        entry = _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown op {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None
    if target is None:
        target = jax.devices()[0].platform
    return entry.resolve(target)


def custom(name: str, *args, target: str | None = None, **params):
    """Invoke a registered op by name (graph.py:62-73 style)."""
    return get_op(name, target)(*args, **params)


def list_ops() -> list[str]:
    return sorted(_REGISTRY)
