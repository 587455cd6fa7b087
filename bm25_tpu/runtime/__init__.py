"""Execution runtime: sessions/devices, profiling, health probes."""

from bm25_tpu.runtime.session import Session, accelerator_count, get_device, get_session

__all__ = ["Session", "accelerator_count", "get_device", "get_session"]
