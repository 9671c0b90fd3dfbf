"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment overrides JAX_PLATFORMS (the axon TPU plugin wins), so the
CPU backend must be forced via jax.config before any computation. XLA_FLAGS
must be set before the CPU client is created (SURVEY.md §4: multi-host tests
run on CPU via --xla_force_host_platform_device_count).
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
