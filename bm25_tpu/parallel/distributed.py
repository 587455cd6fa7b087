"""Multi-host (DCN) initialization and doc-shard planning.

The reference has no distributed layer (SURVEY.md section 2 accounting);
this module provides the TPU-native one: ``jax.distributed`` bootstrap for
multi-host slices, and a host-level plan for streaming index builds where
each host tokenizes/scores its own document range and owns the matching doc
shards (collectives then ride ICI inside the slice, DCN only coordinates
the build).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed (no-op for single-process runs).

    On Cloud TPU the arguments are auto-detected from the metadata/env;
    pass them explicitly for manual clusters.
    """
    if num_processes is None and coordinator_address is None:
        env_procs = os.environ.get("JAX_NUM_PROCESSES")
        if env_procs is None or int(env_procs) <= 1:
            return  # single process: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_info() -> tuple[int, int]:
    return jax.process_index(), jax.process_count()


@dataclass(frozen=True)
class DocShardPlan:
    """Contiguous doc-range assignment of a corpus across hosts/devices.

    Build-time: host h tokenizes+scores docs [host_start, host_end).
    Serve-time: global device d owns docs [doc_start(d), doc_end(d)).
    """

    num_docs: int
    num_hosts: int
    num_devices_global: int

    def host_range(self, host: int) -> tuple[int, int]:
        per = -(-self.num_docs // self.num_hosts)
        return min(host * per, self.num_docs), min((host + 1) * per, self.num_docs)

    def device_range(self, device: int) -> tuple[int, int]:
        per = -(-self.num_docs // self.num_devices_global)
        return (
            min(device * per, self.num_docs),
            min((device + 1) * per, self.num_docs),
        )


def make_plan(num_docs: int) -> DocShardPlan:
    return DocShardPlan(
        num_docs=num_docs,
        num_hosts=jax.process_count(),
        num_devices_global=jax.device_count(),
    )
