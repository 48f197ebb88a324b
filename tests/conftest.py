"""Test harness: run everything on a virtual 8-device CPU mesh in float64.

This is the standard JAX way to test multi-chip sharding without hardware
(replaces the reference's absent MPI testing, SURVEY.md §4): XLA exposes 8
host devices, shard_map/pjit paths execute real collectives over them.
Must run before jax is imported anywhere.
"""

import os

# force-override: the CI environment exports JAX_PLATFORMS=axon (TPU tunnel);
# tests must run on the virtual CPU mesh, so plain setdefault is not enough
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the environment's sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon already baked in, so the env override above is not
# seen — force the config value directly as well
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
