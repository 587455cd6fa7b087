#!/usr/bin/env python3
"""Relay d2h characterization: serial vs threaded fetches, f32 vs bf16."""

import concurrent.futures as cf
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    # distinct device arrays (so no host-cache reuse)
    def make(n, dtype):
        return [
            jax.device_put(rng.random((512, 2000), dtype=np.float32).astype(dtype))
            for _ in range(n)
        ]

    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        arrs = make(6, dtype)
        np.asarray(arrs[0])  # warm path
        mb = arrs[1].size * arrs[1].dtype.itemsize / 2**20
        t0 = time.perf_counter()
        for a in arrs[1:]:
            np.asarray(a)
        dt = time.perf_counter() - t0
        print(f"serial {name}: {dt/5*1e3:.0f} ms per {mb:.1f} MB "
              f"({mb*5/dt:.1f} MB/s)", flush=True)

    for nthreads in (2, 4):
        arrs = make(8, jnp.float32)
        np.asarray(arrs[0])
        mb = arrs[1].size * 4 / 2**20
        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(nthreads) as ex:
            list(ex.map(np.asarray, arrs[1:]))
        dt = time.perf_counter() - t0
        print(f"threaded x{nthreads} f32: {dt/7*1e3:.0f} ms per {mb:.1f} MB "
              f"({mb*7/dt:.1f} MB/s)", flush=True)

    # jax.device_get on a list (PJRT may batch)
    arrs = make(6, jnp.float32)
    np.asarray(arrs[0])
    t0 = time.perf_counter()
    jax.device_get(arrs[1:])
    dt = time.perf_counter() - t0
    mb = arrs[1].size * 4 / 2**20
    print(f"device_get(list of 5) f32: {dt/5*1e3:.0f} ms per {mb:.1f} MB "
          f"({mb*5/dt:.1f} MB/s)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
