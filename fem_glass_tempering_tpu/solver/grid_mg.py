"""Grid-native geometric multigrid: the V-cycle for the GSPMD-sharded step.

`GeometricMG` (solver/multigrid.py) applies its V-cycle to FLAT dof
vectors, reshaping to the node grid inside each transfer. Under GSPMD
sharding (parallel/grid_shard.py) the state lives GRID-SHAPED and sharded
along grid axis 0, and a flat<->grid reshape across the sharded axis
forces the partitioner to materialize gathers. This module keeps the
entire V-cycle grid-shaped end to end:

  - per-level operators are `GridHeatOperator`s on rediscretized
    coarsened box meshes (same hierarchy rule as GeometricMG);
  - smoothing is Chebyshev/damped-Jacobi over D^{-1}A with the gather-free
    stencil matvec — elementwise + static pad/slice only;
  - transfers are the strided-slice lattice ops of GeometricMG applied
    directly to grid-shaped arrays (no reshape, axis 0 included: under a
    sharded axis XLA lowers the slice shifts to collective-permutes).

This is the reference's PETSc-GAMG-under-MPI transparency
(/root/reference/ThermoViscoProblem.py:339-346 + mpiexec,
README.md:62-66) done the TPU way: the SAME preconditioner program runs
single-device or sharded, with identical iteration counts.

Fine-level ghost padding: GridShardedProblem pads grid axis 0 to a device
multiple with identity rows. The V-cycle smooths ON the padded grid (the
padded operator's masked matvec/diag make those rows identity, so the
smoother fixes them to the input residual), and the lattice transfers act
on the physical slice only — the coarse hierarchy is unpadded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fem_glass_tempering_tpu.ops.grid import GridHeatOperator
from fem_glass_tempering_tpu.solver.multigrid import (
    GeometricMG,
    _build_level_mesh,
    _next_dims,
)


class GridMG:
    """Grid-shaped V-cycle preconditioner factory for CG-1 box meshes.

    Usage:
        mg = GridMG(fine_grid_op, make_heat_operator)
        mg.freeze_rhos(dt)                       # host-side, once
        states = mg.linearization_states_g(Tg)   # per-level freeze states
        apply = mg.preconditioner_g(states, dt)  # r_grid -> ~A^{-1} r_grid
    """

    def __init__(self, fine: GridHeatOperator, make_heat_operator, *,
                 nu_pre: int = 2, nu_post: int = 2,
                 smoother: str = "chebyshev", coarse_iters: int = 24,
                 min_level_nodes: int = 27):
        mesh = fine.op.fs.mesh
        if mesh.structured is None:
            raise ValueError("GridMG needs a structured box mesh")
        if smoother not in ("jacobi", "chebyshev"):
            raise ValueError(smoother)
        self.nu_pre, self.nu_post = nu_pre, nu_post
        self.smoother = smoother
        self.coarse_iters = coarse_iters
        self.pad0 = fine.pad0
        self.phys0 = fine.st.grid[0]      # physical node count, axis 0

        meta = mesh.structured
        dims = tuple(meta["dims"])
        lengths = tuple(meta["lengths"])
        # level i: (GridHeatOperator, axes halved toward level i+1 or None)
        self.ops: list[GridHeatOperator] = [fine]
        self.axes: list[tuple | None] = []
        while True:
            cdims = _next_dims(dims, lengths)
            if cdims is None or int(np.prod(
                    tuple(n + 1 for n in cdims))) < min_level_nodes:
                self.axes.append(None)
                break
            self.axes.append(tuple(a for a in range(len(dims))
                                   if cdims[a] != dims[a]))
            dims = cdims
            level_mesh = _build_level_mesh(meta, dims)
            self.ops.append(GridHeatOperator(make_heat_operator(level_mesh)))
        self._frozen_rhos: list[float] | None = None

    # ---- spectrum bounds (host-side, once) ---------------------------
    def freeze_rhos(self, dt: float) -> None:
        """Per-level Gershgorin bound on rho(D^{-1}A) from the numpy row
        statistics each level's StencilMatrix records at construction
        (same rationale as GeometricMG.freeze_omegas: no eager device
        matvecs at setup; rho barely moves with T)."""
        vals = []
        for op in self.ops:
            g = op.st.gersh
            num = g["mass_abs"] + dt * (g["stiff_abs"] + g["b_abs"])
            den = g["mass_diag"] + dt * (g["stiff_diag"] + g["b_diag"])
            vals.append(float(np.max(num / den)))
        self._frozen_rhos = vals

    # ---- lattice transfers (grid-shaped; physical region only) -------
    def _restrict(self, i: int, rg):
        if i == 0 and self.pad0:
            rg = jax.lax.slice_in_dim(rg, 0, self.phys0, axis=0)
        for a in self.axes[i]:
            rg = GeometricMG._restrict_axis(rg, a)
        return rg

    def _prolong(self, i: int, xc):
        for a in self.axes[i]:
            xc = GeometricMG._prolong_axis(xc, a)
        if i == 0 and self.pad0:
            pc = [(0, self.pad0)] + [(0, 0)] * (xc.ndim - 1)
            xc = jnp.pad(xc, pc)          # zero correction on ghost rows
        return xc

    def _inject(self, i: int, xf):
        if i == 0 and self.pad0:
            xf = jax.lax.slice_in_dim(xf, 0, self.phys0, axis=0)
        for a in self.axes[i]:
            xf = jax.lax.slice_in_dim(xf, 0, xf.shape[a], stride=2, axis=a)
        return xf

    def linearization_states_g(self, Tg):
        """Per-level temperature grids (injection — even-node sampling),
        for freezing each level's boundary linearization."""
        states = [Tg]
        cur = Tg
        for i in range(len(self.ops) - 1):
            cur = self._inject(i, cur)
            states.append(cur)
        return states

    def grids(self):
        """Per-level (padded, for level 0) node-grid shapes — used by the
        sharded caller to assign table shardings."""
        return [op.grid for op in self.ops]

    # ---- apply -------------------------------------------------------
    def preconditioner_g(self, T_levels, dt):
        assert self._frozen_rhos is not None, "call freeze_rhos(dt) first"
        matvecs, diags = [], []
        for op, T in zip(self.ops, T_levels):
            vals = op.stencil_values_g(T, dt)
            if op.has_bc:
                mask = op.bc_mask_g
                mv = (lambda op, vals, mask: lambda v: jnp.where(
                    mask, v, op.matvec_vals(vals, jnp.where(mask, 0.0, v))
                ))(op, vals, mask)
            else:
                mv = (lambda op, vals: lambda v: op.matvec_vals(vals, v)
                      )(op, vals)
            matvecs.append(mv)
            diags.append(op.jacobian_diag_g(T, dt))
        rhos = self._frozen_rhos

        def smooth_jacobi(i, x, b, nu):
            omega = 4.0 / (3.0 * rhos[i])
            for _ in range(nu):
                x = x + omega * (b - matvecs[i](x)) / diags[i]
            return x

        def smooth_cheb(i, x, b, nu):
            # Chebyshev over D^{-1}A on [rho/4, rho] (GAMG convention)
            lmax = rhos[i]
            lmin = lmax / 4.0
            theta = 0.5 * (lmax + lmin)
            delta = 0.5 * (lmax - lmin)
            sigma = theta / delta
            rho_k = 1.0 / sigma
            r = b - matvecs[i](x)
            p = (r / diags[i]) / theta
            x = x + p
            for _ in range(max(nu - 1, 0)):
                r = b - matvecs[i](x)
                z = r / diags[i]
                rho_next = 1.0 / (2.0 * sigma - rho_k)
                p = rho_next * rho_k * p + (2.0 * rho_next / delta) * z
                x = x + p
                rho_k = rho_next
            return x

        smooth = smooth_jacobi if self.smoother == "jacobi" else smooth_cheb

        def cycle(i, b):
            if self.axes[i] is None:
                return smooth(i, jnp.zeros_like(b), b, self.coarse_iters)
            x = smooth(i, jnp.zeros_like(b), b, self.nu_pre)
            r = b - matvecs[i](x)
            xc = cycle(i + 1, self._restrict(i, r))
            x = x + self._prolong(i, xc)
            return smooth(i, x, b, self.nu_post)

        return lambda r: cycle(0, r)
