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
                 min_level_nodes: int = 27, coarse: str = "auto"):
        mesh = fine.op.fs.mesh
        if mesh.structured is None:
            raise ValueError("GridMG needs a structured box mesh")
        if smoother not in ("jacobi", "chebyshev"):
            raise ValueError(smoother)
        if coarse not in ("auto", "smooth"):
            raise ValueError(coarse)
        self.nu_pre, self.nu_post = nu_pre, nu_post
        self.smoother = smoother
        self.coarse_iters = coarse_iters
        self.pad0 = fine.pad0
        self.phys0 = fine.st.grid[0]      # physical node count, axis 0

        meta = mesh.structured
        dims = tuple(meta["dims"])
        lengths = tuple(meta["lengths"])
        # 'auto': stop coarsening at the first level small enough for the
        # frozen dense direct solve (same rule as GeometricMG — measured
        # 45.5 -> 13.0 CG iters/step at 1M dofs: the approximate deep
        # coarse solve was the weak link of the cycle)
        dense_stop = 4096 if coarse == "auto" else 0
        # level i: (GridHeatOperator, axes halved toward level i+1 or None)
        self.ops: list[GridHeatOperator] = [fine]
        self.axes: list[tuple | None] = []
        while True:
            cdims = _next_dims(dims, lengths)
            if dense_stop and int(np.prod(
                    tuple(n + 1 for n in dims))) <= dense_stop:
                cdims = None
            if cdims is None or int(np.prod(
                    tuple(n + 1 for n in cdims))) < min_level_nodes:
                self.axes.append(None)
                break
            self.axes.append(tuple(a for a in range(len(dims))
                                   if cdims[a] != dims[a]))
            dims = cdims
            level_mesh = _build_level_mesh(meta, dims)
            # allow_const=False: the level ops run INSIDE the sharded step
            # (tables + static slices partition predictably under GSPMD);
            # the constant-row form is the single-device fast path
            self.ops.append(GridHeatOperator(make_heat_operator(level_mesh),
                                             allow_const=False))
        self._frozen_rhos: list[float] | None = None
        # frozen dense inverse of the coarsest-level Jacobian at
        # (T_0, construction dt), host-assembled — one MXU matvec replaces
        # coarse_iters fixed sweeps AND solves the level exactly (a
        # preconditioner tolerates the frozen boundary linearization)
        self.coarse_inv = None
        if dense_stop and int(np.prod(
                tuple(n + 1 for n in dims))) <= dense_stop:
            cop = self.ops[-1]
            A = cop.st.np_dense(cop.op.params.T_0, cop.op.dt)
            self.coarse_inv = jnp.asarray(np.linalg.inv(A),
                                          dtype=cop.dtype)

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
            # baked-table matvecs: the V-cycle applies each level's matvec
            # ~5x per cycle inside the CG loop, where the per-apply
            # face-flux form's slice updates measured 3x slower cycles
            # (90 vs 40 ms/step at 1M, profile r4) — bake once per build,
            # stream tables per apply
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

        def coarse_solve(i, b):
            inv = self.coarse_inv
            if inv is None:
                return smooth(i, jnp.zeros_like(b), b, self.coarse_iters)
            if i == 0 and self.pad0:
                # single-level padded hierarchy: solve the physical slab
                # exactly, keep the identity ghost rows (x_ghost = b_ghost)
                bp = jax.lax.slice_in_dim(b, 0, self.phys0, axis=0)
                x = (inv @ bp.reshape(-1)).reshape(bp.shape)
                ghost = jax.lax.slice_in_dim(b, self.phys0, b.shape[0],
                                             axis=0)
                return jnp.concatenate([x, ghost], axis=0)
            return (inv @ b.reshape(-1)).reshape(b.shape)

        def cycle(i, b):
            if self.axes[i] is None:
                return coarse_solve(i, b)
            x = smooth(i, jnp.zeros_like(b), b, self.nu_pre)
            r = b - matvecs[i](x)
            xc = cycle(i + 1, self._restrict(i, r))
            x = x + self._prolong(i, xc)
            return smooth(i, x, b, self.nu_post)

        return lambda r: cycle(0, r)


class GridElastMG:
    """Grid-shaped geometric V-cycle for the VECTOR elasticity operator
    (ops/grid_elasticity.py) — the preconditioner the equilibrium-
    mechanics solve needs (Jacobi-CG stalls on thin tempering plates:
    measured 2000+ unconverged iterations on an 8x6x4 aspect-50 plate).

    Same hierarchy rule and strided-slice transfers as GridMG (vector
    trailing dim rides along), with per-level coefficient fields obtained
    by cell-averaging G/K down the hierarchy, and Chebyshev smoothing
    whose spectrum bound rho(D^{-1}A) is a Gershgorin bound computed
    IN-GRAPH from two constant element tables — the coefficients change
    every time step, so the bound must be traced, not frozen."""

    def __init__(self, fine, make_level_op, *, nu_pre: int = 2,
                 nu_post: int = 2, coarse_iters: int = 24,
                 min_level_nodes: int = 27, coarse: str = "auto",
                 frozen_moduli: tuple | None = None,
                 use_tables: bool = True):
        if coarse not in ("auto", "smooth"):
            raise ValueError(coarse)
        # materialized per-level block-stencil tables for the cycle
        # matvecs (ops/grid_elasticity.py stencil_table_g) instead of the
        # recompute-per-apply cell form — the tables-over-recompute trade
        # measured on the heat path (BENCH.md constant-row post-mortem)
        self.use_tables = use_tables
        mesh = fine.fs.mesh
        meta = mesh.structured
        dims = tuple(meta["dims"])
        lengths = tuple(meta["lengths"])
        self.nu_pre, self.nu_post = nu_pre, nu_post
        self.coarse_iters = coarse_iters
        self.pad0 = fine.pad0
        self.phys0 = fine.base_grid[0]
        self.ops = [fine]
        self.axes: list[tuple | None] = []
        # 'auto': stop coarsening at the first level whose COMPONENT count
        # (nodes x d) fits the frozen dense direct solve, same rule as
        # GridMG/GeometricMG — the approximate deep coarse solve is the
        # weak link of the cycle, and for traction-free elasticity it is
        # what damps the near-singular rigid-rotation modes (measured:
        # residual plateau over ~20 MG-CG iterations without it)
        dense_stop = 4096 if (coarse == "auto"
                              and frozen_moduli is not None) else 0
        while True:
            cdims = _next_dims(dims, lengths)
            if dense_stop and fine.d * int(np.prod(
                    tuple(n + 1 for n in dims))) <= dense_stop:
                cdims = None
            if cdims is None or int(np.prod(
                    tuple(n + 1 for n in cdims))) < min_level_nodes:
                self.axes.append(None)
                break
            self.axes.append(tuple(a for a in range(len(dims))
                                   if cdims[a] != dims[a]))
            dims = cdims
            self.ops.append(make_level_op(_build_level_mesh(meta, dims)))
        self._dense_coarse = bool(
            dense_stop and fine.d * int(np.prod(
                tuple(n + 1 for n in dims))) <= dense_stop
            and self.ops[-1].pad0 == 0)
        self._frozen_moduli = frozen_moduli
        # constant element tables per level (uniform cells):
        # A[(l,a),(m,b)] = G*EG + K*EK with
        #   EG = sum_q w [d_ab grad(phi_l).grad(phi_m) + d_b phi_l d_a phi_m
        #                 - (2/d) d_a phi_l d_b phi_m]
        #   EK = sum_q w d_a phi_l d_b phi_m
        self._tables = []       # Gershgorin row stats (SG, SK, DG, DK)
        self._EGK = []          # full (l,a,m,b) element tensors
        self._np_EGK = []       # numpy sources (dense coarse assembly)
        self._smoothers = []    # 'column' | 'point' per level
        self._col_axis = []
        for op in self.ops:
            qw, gp = op.np_qw1[0] if op.np_qw1.ndim > 1 else op.np_qw1, \
                op.np_gphi1
            d = op.d
            gg = np.einsum("q,qlg,qmg->lm", qw, gp, gp)
            cross = np.einsum("q,qlb,qma->lamb", qw, gp, gp)
            EK = np.einsum("q,qla,qmb->lamb", qw, gp, gp)
            EG = (np.einsum("lm,ab->lamb", gg, np.eye(d))
                  + cross - (2.0 / d) * EK)
            SG = np.abs(EG).sum(axis=(2, 3))
            SK = np.abs(EK).sum(axis=(2, 3))
            DG = np.einsum("lala->la", EG)
            DK = np.einsum("lala->la", EK)
            f = lambda a: jnp.asarray(a, dtype=op.dtype)
            self._tables.append((f(SG), f(SK), f(DG), f(DK)))
            self._EGK.append((f(EG), f(EK)))
            self._np_EGK.append((EG, EK))
            # line smoothing along the strongly coupled (small-h) axis:
            # point smoothers cannot damp the through-thickness modes of a
            # thin tempering plate (measured: 386+ MG-CG iterations with
            # point Chebyshev at aspect 50 vs ~40 isotropic)
            h = [ln / dd for ln, dd in zip(
                op.fs.mesh.structured["lengths"], op.dims)]
            aniso = max(h) / min(h) > 3.0 and d >= 2
            ax = int(np.argmin(h))
            if aniso and op.dims[ax] >= 1:
                self._smoothers.append("column")
                self._col_axis.append(ax)
            else:
                self._smoothers.append("point")
                self._col_axis.append(None)
        # frozen dense inverse of the coarsest level at the instantaneous
        # moduli (xi = 0): relaxation scales G/K nearly uniformly and CG
        # is invariant to preconditioner scaling, so the frozen ratio
        # stays effective across the transient; host-assembled (numpy),
        # applied as ONE dense matvec on the MXU (same pattern as
        # GridMG.coarse_inv)
        self.coarse_inv = None
        if self._dense_coarse:
            G0, K0 = self._frozen_moduli
            A = self._np_dense_coarse(float(G0), float(K0))
            self.coarse_inv = jnp.asarray(
                np.linalg.inv(A), dtype=self.ops[-1].dtype)

    # ------------------------------------------------------------------
    def _np_dense_coarse(self, G0: float, K0: float) -> np.ndarray:
        """Host-assembled dense matrix of the coarsest-level elasticity
        operator with constant moduli, pinned components as identity
        rows/columns (matches the operator's pin semantics)."""
        op = self.ops[-1]
        EG, EK = self._np_EGK[-1]
        E = G0 * EG + K0 * EK                 # (l, a, m, b)
        base = op.base_grid
        d = op.d
        nn = int(np.prod(base))
        A = np.zeros((nn * d, nn * d))
        dims = op.dims
        cells = np.stack(np.meshgrid(
            *[np.arange(n) for n in dims], indexing="ij"),
            axis=-1).reshape(-1, len(dims))   # (C, ndim)
        strides = np.array([int(np.prod(base[i + 1:]))
                            for i in range(len(base))])
        node = {l: (cells + np.array(op.loffs[l])) @ strides
                for l in range(op.nloc)}
        for l in range(op.nloc):
            for m in range(op.nloc):
                for a in range(d):
                    for b in range(d):
                        np.add.at(A, (node[l] * d + a, node[m] * d + b),
                                  E[l, a, m, b])
        pin = op.np_pin_mask.reshape(-1) > 0
        A[pin, :] = 0.0
        A[:, pin] = 0.0
        A[pin, pin] = 1.0
        return A

    # ---- transfers (vector trailing dim) ------------------------------
    def _restrict(self, i, rg):
        if i == 0 and self.pad0:
            rg = jax.lax.slice_in_dim(rg, 0, self.phys0, axis=0)
        for a in self.axes[i]:
            rg = GeometricMG._restrict_axis(rg, a)
        return rg

    def _prolong(self, i, xc):
        for a in self.axes[i]:
            xc = GeometricMG._prolong_axis(xc, a)
        if i == 0 and self.pad0:
            pc = [(0, self.pad0)] + [(0, 0)] * (xc.ndim - 1)
            xc = jnp.pad(xc, pc)
        return xc

    @staticmethod
    def _coarsen_cells(arr, axes):
        """Cell-wise coefficient restriction: average the 2 children along
        each halved axis (strided slices)."""
        for a in axes:
            n = arr.shape[a]
            even = jax.lax.slice_in_dim(arr, 0, n, stride=2, axis=a)
            odd = jax.lax.slice_in_dim(arr, 1, n, stride=2, axis=a)
            arr = 0.5 * (even + odd)
        return arr

    def _rho_bound(self, op, tbl, Gc, Kc):
        """Traced Gershgorin bound on rho(D^{-1}A): per-cell scalar
        coefficients (max over q for safety), scattered abs-row-sums over
        num/den."""
        SG, SK, DG, DK = tbl
        num_cell = Gc[..., None, None] * SG + Kc[..., None, None] * SK
        den_cell = Gc[..., None, None] * DG + Kc[..., None, None] * DK
        num = op._scatter(num_cell, op.grid + (op.d,), Gc.dtype)
        den = op._scatter(den_cell, op.grid + (op.d,), Gc.dtype)
        ratio = jnp.where(op.pin_mask_g > 0, 1.0,
                          num / jnp.where(den == 0, 1.0, den))
        return jnp.max(ratio) * 1.01

    # ---- block-tridiagonal column smoother ---------------------------
    def _column_blocks(self, i, Gc, Kc):
        """Assemble the line matrix along the strongly coupled axis:
        Dg (*grid, d, d) nodal diagonal blocks; Ug (*grid, d, d) with
        Ug[n] the block coupling node n -> n+e_ax (zero at the last
        plane). Cell coefficients Gc/Kc are per-cell scalars. Pinned
        components become identity rows with severed couplings."""
        op = self.ops[i]
        EG, EK = self._EGK[i]
        ax = self._col_axis[i]
        d = op.d
        nloc = op.nloc
        Dg = jnp.zeros(op.grid + (d, d), dtype=Gc.dtype)
        Ug = jnp.zeros(op.grid + (d, d), dtype=Gc.dtype)
        for l in range(nloc):
            blk = (Gc[..., None, None] * EG[l, :, l, :]
                   + Kc[..., None, None] * EK[l, :, l, :])
            Dg = Dg.at[op._corner_slice(l)].add(blk)
            if op.loffs[l][ax] == 0:
                m = l + (1 << ax)
                blkU = (Gc[..., None, None] * EG[l, :, m, :]
                        + Kc[..., None, None] * EK[l, :, m, :])
                Ug = Ug.at[op._corner_slice(l)].add(blkU)
        free = 1.0 - (op.pin_mask_g > 0).astype(Gc.dtype)    # (*grid, d)
        pin = 1.0 - free
        Dg = (Dg * free[..., :, None] * free[..., None, :]
              + jnp.eye(d, dtype=Gc.dtype) * pin[..., :, None])
        # column mask of the n+1 node along ax
        free_next = jnp.concatenate(
            [jax.lax.slice_in_dim(free, 1, free.shape[ax], axis=ax),
             jnp.zeros_like(jax.lax.slice_in_dim(free, 0, 1, axis=ax))],
            axis=ax)
        Ug = Ug * free[..., :, None] * free_next[..., None, :]
        return Dg, Ug

    # Batched small-block algebra as multiply+reduce, NOT batched
    # dot_general / linalg: the axon TPU runtime compiles chains of tiny
    # batched contractions pathologically (minutes per einsum, measured —
    # the round-2 'DG device fault' wedge); elementwise+reduce lowers to
    # plain VPU code.
    @staticmethod
    def _bmv(M, v):
        """(..., a, b) x (..., b) -> (..., a)"""
        return (M * v[..., None, :]).sum(-1)

    @staticmethod
    def _bmm(A, B):
        """(..., a, b) x (..., b, e) -> (..., a, e)"""
        return (A[..., :, :, None] * B[..., None, :, :]).sum(-2)

    @staticmethod
    def _inv_small(M):
        """Closed-form batched inverse for 1x1/2x2/3x3 blocks (adjugate)
        — avoids batched linalg on the TPU runtime."""
        d = M.shape[-1]
        if d == 1:
            return 1.0 / M
        if d == 2:
            a, b = M[..., 0, 0], M[..., 0, 1]
            c, e = M[..., 1, 0], M[..., 1, 1]
            det = a * e - b * c
            return jnp.stack([
                jnp.stack([e, -b], axis=-1),
                jnp.stack([-c, a], axis=-1)], axis=-2) / det[..., None, None]
        if d == 3:
            m = M
            c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
            c01 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
            c02 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
            c10 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
            c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
            c12 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
            c20 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
            c21 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
            c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
            det = (m[..., 0, 0] * c00 + m[..., 0, 1] * c01
                   + m[..., 0, 2] * c02)
            adj = jnp.stack([
                jnp.stack([c00, c10, c20], axis=-1),
                jnp.stack([c01, c11, c21], axis=-1),
                jnp.stack([c02, c12, c22], axis=-1)], axis=-2)
            return adj / det[..., None, None]
        return jnp.linalg.inv(M)

    def _column_solver(self, i, Dg, Ug):
        """Batched block-Thomas factorization of every line; returns
        zsolve(r) over (*grid, d) arrays."""
        op = self.ops[i]
        ax = self._col_axis[i]
        d = op.d
        grid = op.grid
        nsp = len(grid)
        nzc = grid[ax]
        ncol = int(np.prod(grid)) // nzc
        perm = tuple(j for j in range(nsp) if j != ax) + (ax,)
        inv_perm = tuple(int(j) for j in np.argsort(perm))

        def to_cols(a, trail):
            a = jnp.transpose(a, perm + tuple(nsp + t for t in range(trail)))
            return a.reshape((ncol, nzc) + a.shape[nsp:])

        D = to_cols(Dg, 2)
        U = to_cols(Ug, 2)
        invD = [self._inv_small(D[:, 0])]
        Ls = []
        for k in range(1, nzc):
            # lower block at row k is U_{k-1}^T (symmetric operator)
            Lk = self._bmm(jnp.swapaxes(U[:, k - 1], -1, -2), invD[-1])
            Dk = D[:, k] - self._bmm(Lk, U[:, k - 1])
            invD.append(self._inv_small(Dk))
            Ls.append(Lk)

        def zsolve(r):
            rg = to_cols(r, 1)                              # (ncol, nzc, d)
            y = [rg[:, 0]]
            for k in range(1, nzc):
                y.append(rg[:, k] - self._bmv(Ls[k - 1], y[-1]))
            x = [None] * nzc
            x[-1] = self._bmv(invD[-1], y[-1])
            for k in range(nzc - 2, -1, -1):
                x[k] = self._bmv(
                    invD[k], y[k] - self._bmv(U[:, k], x[k + 1]))
            xg = jnp.stack(x, axis=1)                       # (ncol, nzc, d)
            shape_perm = tuple(grid[j] for j in perm) + (d,)
            xg = xg.reshape(shape_perm)
            return jnp.transpose(xg, inv_perm + (nsp,))
        return zsolve

    @staticmethod
    def _power_rho(mv, zsolve, shape, dtype, iters=8):
        """Traced power-iteration estimate of rho(Z^{-1}A) — the line
        coefficients change every step, so the Chebyshev bound must be
        computed in-graph (cost: `iters` extra matvec+line-solves per
        step, amortized over the whole CG solve)."""
        n = int(np.prod(shape))
        v = (jnp.sin(jnp.arange(n, dtype=dtype) * 0.7) + 0.01).reshape(shape)
        rho = jnp.asarray(1.0, dtype)
        for _ in range(iters):
            w = zsolve(mv(v))
            nw = jnp.linalg.norm(w.ravel())
            rho = nw / jnp.linalg.norm(v.ravel())
            v = w / nw
        return rho * 1.1

    def preconditioner_g(self, G_q, K_q, fine_table=None):
        """Build the V-cycle apply for coefficient fields G_q/K_q
        ((*dims, q), fine level). Returns r (*grid, d) -> approx A^{-1} r.
        `fine_table` shares a prebuilt fine-level stencil table with the
        caller's CG matvec (one build per solve)."""
        matvecs, diags, rhos, zsolves = [], [], [], []
        Gq, Kq = G_q, K_q
        n_levels = len(self.ops)
        for i, op in enumerate(self.ops):
            if self.use_tables:
                if i == 0 and fine_table is not None:
                    tbl = fine_table
                else:
                    tbl = op.stencil_table_g(Gq, Kq)
                mv = (lambda op, tbl: lambda v: op.matvec_table_g(tbl, v)
                      )(op, tbl)
            else:
                mv = op.make_matvec_g(Gq, Kq)
            matvecs.append(mv)
            Gcell = jnp.mean(Gq, axis=-1)
            Kcell = jnp.mean(Kq, axis=-1)
            if i == n_levels - 1 and self.coarse_inv is not None:
                # dense direct coarse solve: no smoother factors needed
                zsolves.append(None)
                diags.append(None)
                rhos.append(None)
            elif self._smoothers[i] == "column":
                Dg, Ug = self._column_blocks(i, Gcell, Kcell)
                zs = self._column_solver(i, Dg, Ug)
                zsolves.append(zs)
                diags.append(None)
                rhos.append(self._power_rho(
                    mv, zs, op.grid + (op.d,), Gq.dtype))
            else:
                zsolves.append(None)
                diags.append(op.jacobian_diag_g(Gq, Kq))
                rhos.append(self._rho_bound(op, self._tables[i],
                                            jnp.max(Gq, axis=-1),
                                            jnp.max(Kq, axis=-1)))
            if self.axes[i] is not None:
                Gc = self._coarsen_cells(Gcell, self.axes[i])
                Kc = self._coarsen_cells(Kcell, self.axes[i])
                q = self.ops[i + 1].qw1.shape[0]
                Gq = jnp.broadcast_to(Gc[..., None], Gc.shape + (q,))
                Kq = jnp.broadcast_to(Kc[..., None], Kc.shape + (q,))

        def smooth(i, x, b, nu):
            # Chebyshev acceleration of the level smoother Z^{-1}
            # (line solve or pointwise diagonal) over [rho/4, rho]
            if zsolves[i] is not None:
                zsolve = zsolves[i]
            else:
                zsolve = (lambda di: lambda r: r / di)(diags[i])
            lmax = rhos[i]
            lmin = lmax / 4.0
            theta = 0.5 * (lmax + lmin)
            delta = 0.5 * (lmax - lmin)
            sigma = theta / delta
            rho_k = 1.0 / sigma
            r = b - matvecs[i](x)
            p = zsolve(r) / theta
            x = x + p
            for _ in range(max(nu - 1, 0)):
                r = b - matvecs[i](x)
                z = zsolve(r)
                rho_next = 1.0 / (2.0 * sigma - rho_k)
                p = rho_next * rho_k * p + (2.0 * rho_next / delta) * z
                x = x + p
                rho_k = rho_next
            return x

        def coarse_solve(i, b):
            inv = self.coarse_inv
            if inv is None:
                return smooth(i, jnp.zeros_like(b), b, self.coarse_iters)
            return (inv @ b.reshape(-1)).reshape(b.shape)

        def cycle(i, b):
            if self.axes[i] is None:
                return coarse_solve(i, b)
            x = smooth(i, jnp.zeros_like(b), b, self.nu_pre)
            r = b - matvecs[i](x)
            xc = cycle(i + 1, self._restrict(i, r))
            x = x + self._prolong(i, xc)
            return smooth(i, x, b, self.nu_post)

        return lambda r: cycle(0, r)
