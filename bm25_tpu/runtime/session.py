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
    explicit = path is not None
    if _cache_configured and not explicit:
        # only SUCCESSFUL configuration latches; an explicit-path call is
        # a deliberate override and always gets a chance (a failed default
        # attempt must not silently eat it)
        return
    path = path if path is not None else os.environ.get(
        "BM25_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "jax_bm25"),
    )
    if not path:
        _cache_configured = True  # explicitly disabled
        return
    try:
        if jax.config.jax_compilation_cache_dir and not explicit:
            # a cache dir is already set (by the app or by an earlier
            # default call).  An EXPLICIT path is a deliberate override
            # and must still win — only implicit calls defer
            _cache_configured = True
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        if "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS" not in os.environ:
            # don't stomp an operator's explicit threshold (e.g. 0 to
            # persist sub-second compiles when pre-warming a cache to ship
            # via `bm25-tpu cache export`)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        _cache_configured = True
    except (OSError, AttributeError):  # read-only fs / old jax: best effort
        pass


def accelerator_count() -> int:
    """Number of non-CPU JAX devices visible (TPU chips here)."""
    return sum(1 for d in jax.devices() if d.platform != "cpu")


def get_device(device_id: int = 0, prefer: str | None = None) -> jax.Device:
    """Pick the execution device: first accelerator unless CPU is forced."""
    devices = jax.devices()
    if prefer:
        pool = [d for d in devices if d.platform == prefer]
        if not pool:
            raise ValueError(
                f"no {prefer!r} device available; have "
                f"{sorted({d.platform for d in devices})}"
            )
    else:
        accel = [d for d in devices if d.platform != "cpu"]
        pool = accel if accel else devices
    if not 0 <= device_id < len(pool):
        raise ValueError(
            f"device_id {device_id} out of range: {len(pool)} "
            f"{prefer or pool[0].platform} device(s) available"
        )
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
_session_lock = threading.Lock()


def get_session() -> Session:
    """Process-default session (reference: ``main.py:203``).

    Lock-guarded: two engines constructed on different threads at startup
    (serve.py is a threading HTTP server) must share ONE session — two
    sessions mean two jit caches and doubled cold compiles.
    """
    global _default_session
    if _default_session is None:
        with _session_lock:
            if _default_session is None:
                enable_persistent_compile_cache()
                _default_session = Session()
    return _default_session
