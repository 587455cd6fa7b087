"""Relay d2h microprobes: serial vs batched fetches, f32 vs int32.

Round-2 measured batched device_get at ~1.5x the serial rate; the round-4
pipeline experiment saw the opposite (batched 4x4 MB at 10.8 MB/s vs
serial 38 MB/s) and an anomalously slow ids-only (int32) path.  This
isolates both effects so the engine fetch strategy follows current relay
behavior.  NB: a fetched jax.Array caches its host copy, so every timed
fetch uses a FRESH device array.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 5


def fresh(shape, dtype, n):
    """n distinct device arrays (blocked-on, uncached on host)."""
    mk = jax.jit(lambda i: jnp.full(shape, i, dtype), static_argnums=())
    arrs = [mk(jnp.asarray(i, dtype)) for i in range(n)]
    jax.block_until_ready(arrs)
    return arrs


def timed(label, nbytes, make_args, fn):
    best = float("inf")
    for _ in range(ITERS):
        args = make_args()
        t0 = time.perf_counter()
        fn(args)
        best = min(best, time.perf_counter() - t0)
    print(f"[probe] {label}: {best*1e3:.1f} ms = {nbytes/best/1e6:.1f} MB/s")


def main():
    sh = (512, 2000)  # 4 MB f32

    timed("4 MB f32 serial", 4096e3,
          lambda: fresh(sh, jnp.float32, 1),
          lambda a: np.asarray(a[0]))
    timed("2 MB int32 serial", 2048e3,
          lambda: fresh((512, 1000), jnp.int32, 1),
          lambda a: np.asarray(a[0]))
    timed("1 MB bf16 serial", 1024e3,
          lambda: fresh((512, 1000), jnp.bfloat16, 1),
          lambda a: np.asarray(a[0]))
    timed("4x4 MB f32 batched device_get", 4 * 4096e3,
          lambda: fresh(sh, jnp.float32, 4),
          lambda a: jax.device_get(a))

    def serial(a):
        for x in a:
            np.asarray(x)

    timed("4x4 MB f32 serial loop", 4 * 4096e3,
          lambda: fresh(sh, jnp.float32, 4), serial)

    def pair_args():
        return (fresh((512, 1000), jnp.float32, 1)
                + fresh((512, 1000), jnp.int32, 1))

    timed("2+2 MB f32+i32 batched", 4096e3, pair_args,
          lambda a: jax.device_get(a))
    timed("2+2 MB f32+i32 serial", 4096e3, pair_args, serial)


if __name__ == "__main__":
    main()
