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


# Environment markers that identify a managed multi-process cluster whose
# coordinator/process layout jax.distributed.initialize() can auto-detect
# (its ClusterEnv plugins cover Cloud TPU pods, Slurm, OpenMPI and GKE).
_CLUSTER_ENVS = (
    "TPU_WORKER_HOSTNAMES",          # Cloud TPU pod slice
    "MEGASCALE_COORDINATOR_ADDRESS",  # multislice
    "SLURM_NTASKS",
    "OMPI_COMM_WORLD_SIZE",
)


def _cluster_detected() -> bool:
    procs = os.environ.get("JAX_NUM_PROCESSES")
    if procs is not None:
        return int(procs) > 1
    for key in _CLUSTER_ENVS:
        val = os.environ.get(key)
        if not val:
            continue
        if key in ("SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE"):
            if int(val) > 1:
                return True
        elif key == "TPU_WORKER_HOSTNAMES":
            # single-worker runtimes (incl. local TPU plugins) set this to
            # one hostname; only a multi-worker list means a pod slice
            if len(val.split(",")) > 1:
                return True
        else:
            return True
    return False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed (no-op for single-process runs).

    With no arguments, a managed cluster is detected from the standard
    environment markers (Cloud TPU pod, multislice, Slurm, OpenMPI, or an
    explicit ``JAX_NUM_PROCESSES``) and the coordinator/process layout is
    auto-detected by ``jax.distributed.initialize``; on a plain
    single-process machine this is a no-op.  Pass the arguments explicitly
    for manual clusters the auto-detection does not cover.
    """
    if (num_processes is None and coordinator_address is None
            and not _cluster_detected()):
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
