"""Subprocess entry for the multi-chip dry run.

Run as ``python -m bm25_tpu.parallel._dryrun_main N``: forces an N-device
CPU platform *before* any backend initialization (required in environments
where a TPU-plugin sitecustomize overrides JAX_PLATFORMS) and executes one
fully sharded query step.
"""

import sys


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n)

    from bm25_tpu.parallel.sharded_engine import dryrun_sharded_step

    dryrun_sharded_step(n)
    print(f"dryrun ok on {n} devices")
    return 0


if __name__ == "__main__":
    sys.exit(main())
