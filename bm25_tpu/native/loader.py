"""Loader for the native (C++) text-processing library.

Returns a wrapper exposing ``tokenize_corpus`` when the shared library built
by ``bm25_tpu/native/Makefile`` is present; ``None`` otherwise (pure-Python
fallback in bm25_tpu.text.tokenizer is used).
"""

from __future__ import annotations

import os

_cached = None
_checked = False


def get():
    global _cached, _checked
    if _checked:
        return _cached
    _checked = True
    so_path = os.path.join(os.path.dirname(__file__), "libbm25text.so")
    if not os.path.exists(so_path):
        _cached = None
        return None
    try:
        from .text_native import NativeTextPipeline

        _cached = NativeTextPipeline(so_path)
    except Exception as e:
        # a broken/stale .so must not silently demote every build to the
        # ~2.6x-slower pure-Python path for the process lifetime
        import warnings

        warnings.warn(
            f"{so_path} exists but failed to load ({type(e).__name__}: {e})"
            " — falling back to the pure-Python tokenizer; rebuild with"
            " `make -C bm25_tpu/native`",
            stacklevel=2,
        )
        _cached = None
    return _cached
