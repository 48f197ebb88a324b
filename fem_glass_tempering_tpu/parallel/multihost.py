"""Multi-host (DCN) execution: jax.distributed + the GSPMD sharded step.

The reference scales past one node with `mpiexec -np N`
(/root/reference/README.md:62-66) — dolfinx partitions the mesh over MPI
ranks and PETSc reduces over the world communicator. The TPU-native
equivalent is JAX's multi-controller runtime: every host process calls
`initialize(...)`, sees the global device set, and runs the SAME program;
arrays sharded with `NamedSharding` span hosts, XLA routes halo
collective-permutes over ICI within a slice and DCN across slices.

Key design rule from SURVEY.md §5: keep halos on ICI by partitioning
contiguously within hosts — `global_device_mesh()` orders devices
process-major, so the 1D slab partition of parallel/grid_shard.py maps
neighboring slabs to the same host wherever possible and only the
host-boundary planes cross DCN.

CI coverage without a cluster: tests/test_multihost.py launches two
coordinated CPU processes (4 virtual devices each) and checks the 8-way
sharded coupled step against the single-process result — the same
technique the driver uses for virtual multi-chip validation, extended to
multiple OS processes with real cross-process collectives.
"""

from __future__ import annotations

import numpy as np


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, local_device_ids=None) -> None:
    """Join the multi-controller runtime. Call once per host process
    before any other JAX API (the analog of MPI_Init; the reference gets
    this implicitly from mpi4py, ThermoViscoProblem.py:28)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def global_device_mesh():
    """All devices of all processes, process-major — contiguous slab
    shards land on the same host first, so halo traffic prefers ICI and
    only host boundaries cross DCN (SURVEY.md §5)."""
    import jax

    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return np.array(devs)


def make_multihost_problem(mesh, config):
    """GridShardedProblem over the global (multi-host) device set. Every
    process must call this with identical arguments."""
    from fem_glass_tempering_tpu.parallel.grid_shard import GridShardedProblem

    return GridShardedProblem(mesh, config, devices=list(global_device_mesh()))


def gather_to_host(state):
    """Multi-host analog of GridShardedProblem.gather_state's device_get:
    all-gather each (possibly non-addressable) array to every process."""
    import jax
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda a: np.asarray(multihost_utils.process_allgather(
            a, tiled=True)) if getattr(a, "ndim", 0) else np.asarray(a),
        state)
