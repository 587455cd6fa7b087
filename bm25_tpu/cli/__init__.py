"""Command-line entry points (see bm25_tpu.cli.main)."""
