"""Multi-chip SPMD via jax.sharding: cell-axis data parallelism.

This is the first of the two distributed strategies replacing the
reference's MPI domain decomposition (SURVEY.md §2c): all per-cell /
per-facet geometry and dofmap arrays are sharded over a 1-axis device mesh
('cells'), dof vectors stay replicated, and XLA inserts the collectives —
the ghost-accumulation of `scatter_forward` becomes a psum over the
segment-sum partials, and CG/Newton reduction collectives come for free
from jnp.vdot on sharded operands (SURVEY.md §5 communication inventory,
patterns 1-2). For tempering problems the dof vector is tiny next to the
quadrature-geometry arrays, so this is the bandwidth-optimal layout up to
very large meshes; parallel/domain.py implements explicit
partition+halo-exchange domain decomposition beyond that.

Cell/facet axes are zero-padded to a device-count multiple: padded rows
carry zero quadrature weight and dofmap index 0, so they assemble exact
zeros (no masking needed in the hot path).

Usage:
    mesh_dev = make_device_mesh(jax.devices())
    shard_problem(prob, mesh_dev)   # in-place device_put of operator arrays
    prob.solve()                    # same code path, now multi-chip
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


CELL_AXIS = "cells"


def make_device_mesh(devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (CELL_AXIS,))


def _pad_rows(arr: jnp.ndarray, n_pad: int, fill=0):
    if n_pad == 0:
        return arr
    pad_block = jnp.full((n_pad,) + arr.shape[1:], fill, dtype=arr.dtype)
    return jnp.concatenate([arr, pad_block], axis=0)


def _put_padded(arr: jnp.ndarray, sharding, n_dev: int, fill=0):
    n = arr.shape[0]
    n_pad = (-n) % n_dev
    return jax.device_put(_pad_rows(arr, n_pad, fill), sharding)


def shard_heat_operator(op, mesh: Mesh) -> None:
    """Shard a HeatOperator's captured arrays over the device mesh.

    Cell-axis and facet-axis arrays are padded (zero weights) then sharded;
    dof-indexed constants are replicated. The residual/diag outputs are
    bit-identical to the unsharded operator (padded rows assemble zeros)."""
    nd = mesh.devices.size
    cell = NamedSharding(mesh, P(CELL_AXIS))
    rep = NamedSharding(mesh, P())
    op.dofmap = _put_padded(op.dofmap, cell, nd, fill=0)
    if getattr(op, "uniform", False):
        # uniform-mesh compact tables carry no cell axis; this strategy
        # needs per-cell rows (padded cells must carry ZERO weights so
        # their contributions vanish) — materialize, then pad + shard
        nc = op.fs.mesh.n_cells
        op.qw = jnp.broadcast_to(op.qw, (nc,) + op.qw.shape)
        op.gphi = jnp.broadcast_to(op.gphi, (nc,) + op.gphi.shape)
        op.uniform = False
    op.qw = _put_padded(op.qw, cell, nd, fill=0)
    op.gphi = _put_padded(op.gphi, cell, nd, fill=0)
    op.phi = jax.device_put(op.phi, rep)
    op.b_dofmap = _put_padded(op.b_dofmap, cell, nd, fill=0)
    op.b_qw = _put_padded(op.b_qw, cell, nd, fill=0)
    op.b_phi = _put_padded(op.b_phi, cell, nd, fill=0)
    if op.is_dg and op.i_qw is not None:
        # tables absent = the DG block stencil carries the outer loop and
        # the step never reads them on device (ops/heat.py); don't force
        # a multi-GB upload just to shard arrays nothing consumes
        for name in ("i_dofmap_p", "i_dofmap_m"):
            setattr(op, name, _put_padded(getattr(op, name), cell, nd, fill=0))
        for name in ("i_qw", "i_phi_p", "i_phi_m", "i_dnphi_p", "i_dnphi_m"):
            setattr(op, name, _put_padded(getattr(op, name), cell, nd, fill=0))
        op.i_h_p = _put_padded(op.i_h_p, cell, nd, fill=1)  # avoid 0-div
    for name in ("bc_mask", "bc_values", "_const_diag"):
        setattr(op, name, jax.device_put(getattr(op, name), rep))


def shard_state(state, mesh: Mesh):
    """Replicate the state pytree across the mesh (dof vectors are small;
    the sharded work is the per-cell assembly)."""
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, rep), state)


def shard_problem(prob, mesh: Mesh) -> None:
    """Shard a ThermoViscoProblem in place (call after setup()). The
    pointwise material chain stays replicated (dof-sized, negligible next to
    assembly); parallel/domain.py distributes it too."""
    assert prob.heat is not None, "call setup() first"
    if (prob.heat.is_dg
            and prob.config.solver.linear_operator != "stencil"):
        # the matrix-free/assembled DG step reads the interior facet
        # tables on device — materialize before sharding (no-op unless
        # setup skipped the upload for the block-stencil path)
        prob.heat.ensure_interior_tables()
    shard_heat_operator(prob.heat, mesh)
    prob.state = shard_state(prob.state, mesh)
    # re-trace so the new array placements are baked into the jitted step
    prob._build_step()
