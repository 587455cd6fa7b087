"""Multi-process end-to-end: a jax.distributed cluster of 2 processes x 4
CPU devices, doc-sharded query over the GLOBAL mesh, oracle-checked.

This exercises the code path real multi-host TPU deployments use (process-
spanning mesh, cross-process top-k merge collective) without TPU pods —
the integration test NOTES.md gap 5 called for.
"""

import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cluster_matches_oracle(tmp_path):
    port = _free_port()
    nproc, dev_per_proc = 2, 4
    procs = []
    for pid in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "bm25_tpu.parallel._multihost_main",
             str(pid), str(nproc), str(port), str(dev_per_proc)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out)
    assert procs[0].returncode == 0, f"p0 failed:\n{outs[0][-2000:]}"
    assert procs[1].returncode == 0, f"p1 failed:\n{outs[1][-2000:]}"
    assert "MULTIHOST_OK" in outs[0], outs[0][-2000:]
    assert f"{nproc * dev_per_proc} global devices" in outs[0]
