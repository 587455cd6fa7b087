"""Device/session bootstrap — TPU-native counterpart of the reference's
``get_session`` (``/root/reference/main.py:203-208``: pick CPU if no
accelerator else ``Accelerator(id=DEVICE_ID)``, wrap in an InferenceSession).

Here a ``Session`` pins a JAX device, owns the jit compile cache for the
query step family, and exposes ``put``/``get`` host<->device transfer helpers
(the reference's ``Tensor.from_numpy(x).to(device)`` / ``.to(CPU())``
boundary, ``/root/reference/gpu_bm25/common.py:38-39,85``).
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass, field
from typing import Callable, Hashable

import jax
import numpy as np

_cache_configured = False


def enable_persistent_compile_cache(path: str | None = None) -> None:
    """Point JAX's persistent compilation cache at a writable directory.

    Without this every process pays full XLA compiles on first dispatch —
    observed 113 s server warmup vs ~2 s warm on the same index when
    compiles go through a remote-compile relay.  Called automatically by
    ``get_session``; override the location with ``BM25_TPU_COMPILE_CACHE``
    (empty string disables).  No-op if the app already configured one.
    """
    global _cache_configured
    if _cache_configured:
        return
    _cache_configured = True
    path = path if path is not None else os.environ.get(
        "BM25_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "jax_bm25"),
    )
    if not path:
        return
    try:
        if jax.config.jax_compilation_cache_dir:
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError):  # read-only fs / old jax: best effort
        pass


def accelerator_count() -> int:
    """Number of non-CPU JAX devices visible (TPU chips here)."""
    return sum(1 for d in jax.devices() if d.platform != "cpu")


def get_device(device_id: int = 0, prefer: str | None = None) -> jax.Device:
    """Pick the execution device: first accelerator unless CPU is forced."""
    devices = jax.devices()
    if prefer:
        matches = [d for d in devices if d.platform == prefer]
        if not matches:
            raise ValueError(
                f"no {prefer!r} device available; have "
                f"{sorted({d.platform for d in devices})}"
            )
        return matches[device_id]
    accel = [d for d in devices if d.platform != "cpu"]
    pool = accel if accel else devices
    return pool[device_id]


@dataclass
class Session:
    """Execution session: one pinned device + a keyed jit cache."""

    device: jax.Device = field(default_factory=get_device)
    _cache: dict[Hashable, Callable] = field(default_factory=dict, repr=False)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    @classmethod
    def create(cls, device_id: int = 0, prefer: str | None = None) -> "Session":
        return cls(device=get_device(device_id, prefer))

    def put(self, x) -> jax.Array:
        """Host -> device transfer."""
        return jax.device_put(x, self.device)

    @staticmethod
    def get(x) -> np.ndarray:
        """Device -> host transfer."""
        return np.asarray(x)

    def compile(self, key: Hashable, build: Callable[[], Callable]) -> Callable:
        """Fetch or build+jit a function under a cache key (thread-safe:
        serve.py calls engines from a threading HTTP server)."""
        fn = self._cache.get(key)
        if fn is None:
            with self._lock:
                fn = self._cache.get(key)
                if fn is None:
                    fn = build()
                    self._cache[key] = fn
        return fn

    @property
    def platform(self) -> str:
        return self.device.platform


_default_session: Session | None = None


def get_session() -> Session:
    """Process-default session (reference: ``main.py:203``)."""
    global _default_session
    if _default_session is None:
        enable_persistent_compile_cache()
        _default_session = Session()
    return _default_session
