"""Test harness: run every test on a simulated 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 XLA CPU devices (the idiomatic JAX replacement for the
reference's hardware-gated tests, /root/reference/test_correctness.mojo:115).
Must run before jax initializes, hence module-level in conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# In this container a sitecustomize registers the axon TPU plugin and forces
# JAX_PLATFORMS=axon after env setup; override it through jax.config (must
# happen before any backend initialization).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import json

import numpy as np
import pytest

REFERENCE_INDEX = "/root/reference/animal_index_bm25"

ANIMAL_CORPUS = [
    "a cat is a feline and likes to purr",
    "a dog is the human's best friend and loves to play",
    "a bird is a beautiful animal that can fly",
    "a fish is a creature that lives in water and swims",
]

FOX_CORPUS = [
    "The quick brown fox jumps over the lazy dog",
    "Some other text",
    "The quick rabbit runs past the brown fox",
    "The quick rabbit jumps over the brown dog",
    "The quick dog chases past the lazy fox",
    "The quick dog runs through the tall trees",
    "The quick brown fox jumps over the lazy dog",
    "The brown dog sleeps under the shady tree",
    "The brown rabbit hops under the tall tree",
    "The brown fox runs through the forest trees",
    "The brown fox watches the sleeping rabbit",
    "The lazy fox watches over the sleeping dog",
    "The lazy dog watches the quick rabbit",
]


@pytest.fixture(scope="session")
def animal_corpus():
    return list(ANIMAL_CORPUS)


@pytest.fixture(scope="session")
def fox_corpus():
    return list(FOX_CORPUS)


@pytest.fixture(scope="session")
def reference_index_dir():
    if not os.path.isdir(REFERENCE_INDEX):
        pytest.skip("bundled reference index not available")
    return REFERENCE_INDEX


@pytest.fixture(scope="session")
def reference_artifacts(reference_index_dir):
    d = reference_index_dir
    return {
        "data": np.load(os.path.join(d, "data.csc.index.npy")),
        "indices": np.load(os.path.join(d, "indices.csc.index.npy")),
        "indptr": np.load(os.path.join(d, "indptr.csc.index.npy")),
        "vocab": json.load(open(os.path.join(d, "vocab.index.json"))),
        "params": json.load(open(os.path.join(d, "params.index.json"))),
        "mmindex": json.load(open(os.path.join(d, "corpus.mmindex.json"))),
    }


def make_zipf_corpus(num_docs, vocab=2000, avg_len=40, seed=0):
    """Synthetic corpus of integer-token 'words' with a Zipfian distribution."""
    rng = np.random.default_rng(seed)
    lengths = np.maximum(1, rng.poisson(avg_len, num_docs))
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = (1.0 / ranks) / np.sum(1.0 / ranks)
    docs = []
    for L in lengths:
        toks = rng.choice(vocab, size=L, p=probs)
        docs.append(" ".join(f"w{t:05d}" for t in toks))
    return docs


@pytest.fixture(scope="session")
def zipf_corpus_small():
    return make_zipf_corpus(300, vocab=500, avg_len=30, seed=7)


def strict_positions(oracle_scores: np.ndarray) -> np.ndarray:
    """Mask of top-k positions whose doc id is uniquely determined by score:
    not tied with a neighbour inside the list, and not the final position
    (which can tie with the excluded (k+1)-th doc)."""
    strict = np.ones_like(oracle_scores, dtype=bool)
    strict[:, 1:] &= oracle_scores[:, 1:] != oracle_scores[:, :-1]
    strict[:, :-1] &= oracle_scores[:, :-1] != oracle_scores[:, 1:]
    strict[:, -1] = False
    return strict
