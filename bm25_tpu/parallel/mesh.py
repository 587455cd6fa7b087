"""Device-mesh construction for doc-sharded BM25 serving.

The reference is single-device (SURVEY.md section 2 accounting); this is the
first-class TPU replacement: a 2-D logical mesh with

* ``data``  — query-batch data parallelism (each group serves its own queries)
* ``docs``  — index (doc-axis) sharding: every chip holds a slice of the
  score matrix / postings and scores its documents only; per-shard top-k
  candidates are merged over ICI with an all-gather (the distributed
  generalization of the reference's two-stage GPU top-k,
  ``/root/reference/operations/topk.mojo:576-830``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
DOC_AXIS = "docs"


def make_mesh(
    n_devices: int | None = None,
    data: int | None = None,
    devices=None,
) -> Mesh:
    """Build a (data, docs) mesh over the first ``n_devices`` devices.

    By default all devices go to the ``docs`` axis (index sharding), the
    usual regime for corpora that exceed single-chip HBM.  Pass ``data`` to
    split off query-parallel groups, e.g. ``make_mesh(8, data=2)`` -> 2x4.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are available"
            )
        devices = devices[:n_devices]
    n = len(devices)
    data = data or 1
    if n % data != 0:
        raise ValueError(f"{n} devices not divisible by data={data}")
    grid = np.array(devices).reshape(data, n // data)
    return Mesh(grid, (DATA_AXIS, DOC_AXIS))


def index_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for token-major score arrays (V, D): docs axis split."""
    return NamedSharding(mesh, P(None, DOC_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def query_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (Q, T) query batches: split over data-parallel groups."""
    return NamedSharding(mesh, P(DATA_AXIS, None))
