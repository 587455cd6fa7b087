#!/usr/bin/env python3
"""Run the query path with all Pallas kernels in interpreter mode.

TPU counterpart of the reference's ``debug_amd.sh`` (rocgdb on kernels):
interpreter-mode execution makes kernel state inspectable with ordinary
Python debugging (pdb, prints, jax.debug.print) instead of a device
debugger.

Usage: python scripts/debug_interpret.py "a query string"
"""

import sys

import numpy as np


def main() -> int:
    query = sys.argv[1] if len(sys.argv) > 1 else "does the fish purr like a cat"

    import jax

    # debug on the host: interpreter-mode kernels + CPU backend (on a
    # remote/tunneled TPU, per-op interpret dispatch is pathologically slow)
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    from jax.experimental.pallas import tpu as pltpu

    from bm25_tpu.index.builder import build_index
    from bm25_tpu.models.dense import DenseEngine
    from bm25_tpu.text.tokenizer import Tokenizer

    corpus = [
        "a cat is a feline and likes to purr",
        "a dog is the human's best friend and loves to play",
        "a bird is a beautiful animal that can fly",
        "a fish is a creature that lives in water and swims",
    ]
    index, _ = build_index(corpus)
    tok = Tokenizer()
    ids = tok.tokenize_queries([query], index.vocab)

    with pltpu.force_tpu_interpret_mode():
        engine = DenseEngine.from_scored_index(index)
        docs, scores = engine.search(ids, top_k=2)

    for rank, (d, s) in enumerate(zip(docs[0], scores[0]), 1):
        print(f"{rank}. doc={int(d)} score={float(s):.4f} {corpus[int(d)]!r}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
