"""Native (C++) host-side fast paths: tokenizer + Snowball stemmer.

Build with ``make -C bm25_tpu/native``; loaded lazily via ctypes
(bm25_tpu.native.loader) with a pure-Python fallback.
"""
