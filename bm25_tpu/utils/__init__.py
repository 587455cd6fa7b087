"""Shared utilities (shape padding/alignment helpers)."""

from bm25_tpu.utils.padding import cdiv, next_multiple, next_pow2_at_least

__all__ = ["cdiv", "next_multiple", "next_pow2_at_least"]
