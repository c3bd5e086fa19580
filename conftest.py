"""Root test config: force the CPU backend with 8 virtual devices.

The environment presets JAX_PLATFORMS=axon (TPU tunnel) and merges rather
than honors overrides of the env var, so the CPU backend must be forced via
jax.config after import. Tests always run on CPU with 8 virtual devices so
sharding tests work anywhere (SURVEY §4); benchmarks (bench.py) run on the
real TPU and do NOT import this.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
