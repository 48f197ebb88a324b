"""Geometric multigrid preconditioner for structured box meshes (CG-1).

The matrix-free replacement for PETSc's GAMG (the reference's PC,
ThermoViscoProblem.py:344; SURVEY.md §2b 'plan ... geometric multigrid on
structured plate meshes'): a V-cycle over a hierarchy of rediscretized
HeatOperators on coarsened box meshes, damped-Jacobi smoothing with each
level's exact diagonal, and multilinear prolongation / exact-transpose
restriction realized as STRIDED SLICE lattice ops (no gathers, no transfer
tables — gather transfers measured ~30 ms/V-cycle on TPU at 72k dofs).
The whole cycle is trace-time-unrolled jnp, so it sits inside the
Newton/CG while_loops like any other matvec.

Anisotropic plates (the 3D float-glass north-star has ~25:1 cell aspect)
are exactly where Jacobi-CG degenerates; MG keeps iteration counts flat.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from fem_glass_tempering_tpu.fem.mesh import (
    Mesh,
    box_mesh_2d,
    box_mesh_3d,
    interval_mesh,
)


def _next_dims(dims, lengths):
    """Semi-coarsening toward isotropy: halve the axes whose cell size is
    strictly finer than the coarsest axis (point smoothers only damp error
    along strongly coupled = small-h directions, so those must coarsen
    first — the classic anisotropic-MG rule); when the grid is isotropic,
    halve every halvable axis. Returns None when nothing can coarsen."""
    h = [ln / d for ln, d in zip(lengths, dims)]
    halvable = [i for i, d in enumerate(dims) if d % 2 == 0 and d >= 2]
    if not halvable:
        return None
    hmax = max(h)
    strong = [i for i in halvable if h[i] < hmax / 1.9]
    axes = strong if strong else halvable
    out = list(dims)
    for i in axes:
        out[i] //= 2
    return tuple(out)


def _build_level_mesh(structured: dict, dims) -> Mesh:
    o, ln = structured["origin"], structured["lengths"]
    if len(dims) == 1:
        return interval_mesh(dims[0], o[0], o[0] + ln[0])
    if len(dims) == 2:
        return box_mesh_2d(dims[0], dims[1], ln[0], ln[1], origin=o)
    return box_mesh_3d(dims[0], dims[1], dims[2], ln[0], ln[1], ln[2], origin=o)


@dataclass
class MGLevel:
    op: object                    # HeatOperator at this level
    fine_dims: tuple              # this level's cell dims
    coarse_dims: tuple | None     # next (coarser) level's cell dims
    axes: tuple | None            # axes halved by the transfer


class GeometricMG:
    """V-cycle preconditioner factory.

    Usage:
        mg = GeometricMG(mesh, make_operator)   # make_operator(mesh) -> HeatOperator
        precond = mg.preconditioner(T_fine, dt) # callable r -> ~A^{-1} r
    """

    def __init__(self, mesh: Mesh, make_operator, *, nu_pre: int = 2,
                 nu_post: int = 2, omega: float = 0.67,
                 coarse_iters: int = 24, min_level_nodes: int = 27,
                 use_stencil: bool = True, smoother: str = "jacobi",
                 max_levels: int = 0, coarse: str = "auto",
                 dtype=jnp.float64, table_dtype=None):
        if mesh.structured is None:
            raise ValueError("geometric MG needs a structured box mesh")
        if smoother not in ("jacobi", "chebyshev"):
            raise ValueError(smoother)
        if coarse not in ("auto", "smooth", "dense"):
            raise ValueError(coarse)
        self.nu_pre, self.nu_post = nu_pre, nu_post
        self.omega = omega
        self.coarse_iters = coarse_iters
        # 'chebyshev': GAMG-style polynomial smoothing over D^{-1}A with
        # spectrum bounds [rho/4, 1.05 rho] — wider high-frequency band per
        # sweep than damped Jacobi on tough spectra
        self.smoother = smoother
        # per-level stencil matvecs (gather-free, the TPU-fast path); falls
        # back to jvp-of-residual when the level operator can't stencil
        self.use_stencil = use_stencil
        self.dtype = dtype
        # stream the per-level value tables in this dtype (e.g. bf16 —
        # halves the cycle's dominant HBM traffic; vectors/diags/coarse
        # solve keep `dtype`). None = stream in `dtype`.
        self.table_dtype = table_dtype
        self.levels: list[MGLevel] = []
        dims = tuple(mesh.structured["dims"])
        lengths = tuple(mesh.structured["lengths"])
        meta = mesh.structured
        cur_mesh = mesh
        # 'auto' (the default): stop coarsening at the first level small
        # enough for the frozen dense direct solve and use it as an EXACT
        # coarse solve. Measured at 1,062,761 dofs on v5e: the 7-level
        # hierarchy + dense coarse needs 13.0 CG iterations/step where
        # the 9-level smooth-coarse V-cycle needs 45.5 — the approximate
        # deep-tail coarse solve was the weak link of the cycle, and the
        # small tail levels are kernel-launch-bound on TPU anyway.
        dense_stop = 4096 if coarse == "auto" else 0
        while True:
            op = make_operator(cur_mesh)
            cdims = _next_dims(dims, lengths)
            # max_levels truncates the hierarchy: the small tail levels of
            # a deep hierarchy are kernel-launch-bound on TPU (~half of
            # each 1M-dof V-cycle, BENCH.md) — a shallower hierarchy with
            # a direct dense coarse solve replaces them with one matmul
            if max_levels and len(self.levels) + 1 >= max_levels:
                cdims = None
            if dense_stop and int(np.prod(
                    tuple(d + 1 for d in dims))) <= dense_stop:
                cdims = None
            if cdims is not None and int(np.prod(
                    tuple(d + 1 for d in cdims))) >= min_level_nodes:
                self.levels.append(MGLevel(
                    op=op, fine_dims=dims, coarse_dims=cdims,
                    axes=tuple(a for a in range(len(dims))
                               if cdims[a] != dims[a])))
                dims = cdims
                cur_mesh = _build_level_mesh(meta, dims)
            else:
                self.levels.append(MGLevel(op=op, fine_dims=dims,
                                           coarse_dims=None, axes=None))
                break
        # frozen direct coarse solve: dense inverse of the coarsest-level
        # Jacobian linearized at (T_0, the operator's construction dt),
        # assembled host-side (numpy) and applied as ONE dense matvec on
        # the MXU. Only the small boundary block of J depends on T (and a
        # preconditioner tolerates a frozen linearization), so the inverse
        # is built once here. Applied in coarse-level dtype.
        self.coarse_inv = None
        if coarse in ("auto", "dense"):
            lvl = self.levels[-1]
            n_c = int(np.prod(tuple(d + 1 for d in lvl.fine_dims)))
            st = None
            if n_c <= 4096:
                st = self._stencil_for(lvl)
            if st is not None:
                A = st.np_dense(lvl.op.params.T_0, lvl.op.dt)
                self.coarse_inv = jnp.asarray(np.linalg.inv(A),
                                              dtype=dtype)
            elif coarse == "dense":
                if n_c > 4096:
                    raise ValueError(
                        f"coarse='dense' needs a coarsest level <= 4096 "
                        f"nodes (got {n_c}); lower max_levels less or "
                        f"keep 'smooth'")
                raise ValueError("coarse='dense' needs a stencil-capable "
                                 "coarsest level")
            # 'auto' without a stencil-capable small coarsest level falls
            # back to the fixed-sweep smooth coarse solve

    # ------------------------------------------------------------------
    # Lattice transfers as STRIDED SLICE ops — no gather, no transfer
    # tables. Gather-based einsum/segment_sum transfers cost ~30 ms per
    # V-cycle on TPU at 72k dofs (measured: MG at 335 ms/step vs 18.5 for
    # Jacobi despite a 40x iteration cut); strided slices are VPU
    # streaming like the stencil matvec itself.
    #   prolong (per halved axis):  out[2i] = xc[i],
    #                               out[2i+1] = (xc[i] + xc[i+1]) / 2
    #   restrict = exact transpose: rc[i] = rf[2i] + (rf[2i-1]+rf[2i+1])/2
    #   inject:                     xc[i] = xf[2i]
    @staticmethod
    def _prolong_axis(xg, axis):
        n = xg.shape[axis]                 # coarse count gc
        lo = jax.lax.slice_in_dim(xg, 0, n - 1, axis=axis)
        hi = jax.lax.slice_in_dim(xg, 1, n, axis=axis)
        odd = 0.5 * (lo + hi)
        pairs = jnp.stack([lo, odd], axis=axis + 1)
        shp = list(xg.shape)
        shp[axis] = 2 * (n - 1)
        pairs = pairs.reshape(shp)
        last = jax.lax.slice_in_dim(xg, n - 1, n, axis=axis)
        return jnp.concatenate([pairs, last], axis=axis)

    @staticmethod
    def _restrict_axis(rg, axis):
        even = jax.lax.slice_in_dim(rg, 0, rg.shape[axis], stride=2,
                                    axis=axis)
        odd = jax.lax.slice_in_dim(rg, 1, rg.shape[axis], stride=2,
                                   axis=axis)
        pad_lo = [(0, 0)] * rg.ndim
        pad_lo[axis] = (0, 1)
        pad_hi = [(0, 0)] * rg.ndim
        pad_hi[axis] = (1, 0)
        return even + 0.5 * (jnp.pad(odd, pad_lo) + jnp.pad(odd, pad_hi))

    def _prolong(self, lvl: MGLevel, xc):
        g = xc.reshape(tuple(n + 1 for n in lvl.coarse_dims))
        for a in lvl.axes:
            g = self._prolong_axis(g, a)
        return g.reshape(-1)

    def _restrict(self, lvl: MGLevel, rf):
        g = rf.reshape(tuple(n + 1 for n in lvl.fine_dims))
        for a in lvl.axes:
            g = self._restrict_axis(g, a)
        return g.reshape(-1)

    def preconditioner(self, T_levels, dt):
        """Build the V-cycle apply for the Jacobian frozen at T (fine).
        T_levels: list of per-level linearization states (from
        `linearization_states`)."""
        levels = self.levels

        matvecs = []
        diags = []
        rhos = []
        frozen = getattr(self, "_frozen_rhos", None)
        for i, (lvl, T) in enumerate(zip(levels, T_levels)):
            op = lvl.op
            g = self._grid_for(lvl)
            if g is not None:
                # gather-free build: boundary linearization via static
                # face-slice updates (no scatter) — the per-Newton
                # preconditioner rebuild was ~45% of the 1M step when the
                # levels used StencilMatrix.values_at's scatter + the
                # HeatOperator segment-sum diag (profile_phases.py)
                f = g.make_matvec(T, dt, stream_dtype=self.table_dtype)
                d = g.jacobian_diag(T, dt)
            else:
                st = self._stencil_for(lvl)
                if st is not None:
                    f = st.make_matvec(T, dt)
                else:
                    f = (lambda op, T: lambda v: jax.jvp(
                        lambda u: op.residual(u, T, dt), (T,), (v,))[1])(
                            op, T)
                d = lvl.op.jacobian_diag(T, dt)
            matvecs.append(f)
            diags.append(d)
            if frozen is not None:
                rhos.append(frozen[i])
                continue
            # spectral radius of D^{-1}A by power iteration: consistent-mass
            # FEM operators on anisotropic grids push lambda_max(D^{-1}A)
            # well past 2, where a fixed-omega Jacobi smoother diverges.
            # Traced fallback only (freeze_omegas' Gershgorin bound is the
            # production path): 10 iterations from a deterministic start
            # can undershoot, and an undershot Chebyshev/Jacobi window
            # AMPLIFIES the uncovered modes — wide safety margin.
            v = jnp.sin(jnp.arange(T.shape[0], dtype=T.dtype) * 0.7) + 0.01
            rho = jnp.asarray(1.0, T.dtype)
            for _ in range(10):
                w = f(v) / d
                rho = jnp.linalg.norm(w) / jnp.linalg.norm(v)
                v = w / jnp.linalg.norm(w)
            rhos.append(rho * 1.4)

        def smooth_jacobi(i, x, b, nu):
            # omega = 4/(3 rho): optimal damped Jacobi for a spectrum (0, rho]
            omega = 4.0 / (3.0 * rhos[i])
            for _ in range(nu):
                x = x + omega * (b - matvecs[i](x)) / diags[i]
            return x

        def smooth_cheb(i, x, b, nu):
            # Chebyshev over D^{-1}A on [rho/4, rho] (GAMG convention),
            # textbook three-term recurrence
            lmax = rhos[i]
            lmin = lmax / 4.0
            theta = 0.5 * (lmax + lmin)
            delta = 0.5 * (lmax - lmin)
            sigma = theta / delta
            rho_k = 1.0 / sigma
            r = b - matvecs[i](x)
            z = r / diags[i]
            p = z / theta
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
            if levels[i].coarse_dims is None:
                if self.coarse_inv is not None:
                    # frozen direct solve: one (n_c, n_c) matvec
                    return (self.coarse_inv @ b.astype(self.dtype)).astype(
                        b.dtype)
                # coarsest: fixed damped-Jacobi iteration
                x = jnp.zeros_like(b)
                return smooth(i, x, b, self.coarse_iters)
            x = smooth(i, jnp.zeros_like(b), b, self.nu_pre)
            r = b - matvecs[i](x)
            rc = self._restrict(levels[i], r)
            xc = cycle(i + 1, rc)
            x = x + self._prolong(levels[i], xc)
            x = smooth(i, x, b, self.nu_post)
            return x

        return lambda r: cycle(0, r)

    def _grid_for(self, lvl: MGLevel):
        """Cached per-level GridHeatOperator (None if the level mesh/space
        doesn't qualify). Its embedded StencilMatrix is shared with
        `_stencil_for` so the value tables exist once per level."""
        if not self.use_stencil:
            return None
        if not hasattr(lvl, "_gridop"):
            try:
                from fem_glass_tempering_tpu.ops.grid import GridHeatOperator
                # allow_const=False: the table matvec beats the
                # constant-row form 13x in the full TPU step (BENCH.md
                # "constant-row post-mortem"); the dense coarse solve
                # reads the NUMPY tables (np_dense)
                lvl._gridop = GridHeatOperator(lvl.op, allow_const=False)
                lvl._stencil = lvl._gridop.st
            except Exception:
                lvl._gridop = None
        return lvl._gridop

    def _stencil_for(self, lvl: MGLevel):
        """Cached per-level StencilMatrix (None if not applicable)."""
        if not self.use_stencil:
            return None
        if not hasattr(lvl, "_stencil"):
            if self._grid_for(lvl) is not None:
                return lvl._stencil
            try:
                from fem_glass_tempering_tpu.ops.stencil import StencilMatrix
                lvl._stencil = StencilMatrix(lvl.op)
            except Exception:
                lvl._stencil = None
        return lvl._stencil

    def freeze_omegas(self, T_fine, dt) -> None:
        """Fix per-level smoother spectrum bounds ONCE at setup.

        Uses the Gershgorin bound rho(D^{-1}A) <= max_i sum_j|a_ij|/a_ii
        evaluated from the numpy row statistics each level's StencilMatrix
        records at construction (boundary linearization taken at T_0) —
        a guaranteed upper bound, computed entirely on the host: no eager
        device matvecs (a 1M-dof power iteration through the remote-TPU
        tunnel is dispatch-bound, and jitting it would bake the operator
        tables into HLO). rho barely moves with T (only the small boundary
        block changes), and Chebyshev/damped-Jacobi only need an upper
        bound."""
        del T_fine
        vals = []
        for lvl in self.levels:
            st = self._stencil_for(lvl)
            if st is not None and getattr(st, "gersh", None) is not None:
                g = st.gersh
                num = g["mass_abs"] + dt * (g["stiff_abs"] + g["b_abs"])
                den = g["mass_diag"] + dt * (g["stiff_diag"] + g["b_diag"])
                rho = float(np.max(num / den))
            else:
                # fallback: power iteration via jvp (small/unstenciled level)
                op = lvl.op
                T = jnp.full(op.n_dofs, op.params.T_0, dtype=self.dtype)
                f = lambda v: jax.jvp(
                    lambda u: op.residual(u, T, dt), (T,), (v,))[1]
                d = op.jacobian_diag(T, dt)
                v = jnp.sin(jnp.arange(T.shape[0], dtype=T.dtype) * 0.7) + 0.01
                rho = 1.0
                for _ in range(12):
                    w = f(v) / d
                    rho = float(jnp.linalg.norm(w) / jnp.linalg.norm(v))
                    v = w / jnp.linalg.norm(w)
                rho *= 1.05
            vals.append(rho)
        self._frozen_rhos = vals

    def linearization_states(self, T_fine):
        """Per-level temperature states: injection (even-node sampling) of
        the fine solution, for freezing the radiation linearization."""
        states = [T_fine]
        cur = T_fine
        for lvl in self.levels[:-1]:
            # injection: coarse node value = fine value at the coincident
            # (even-index) node, a strided slice per halved axis
            cur = self._inject(lvl, cur)
            states.append(cur)
        return states

    def _inject(self, lvl: MGLevel, xf):
        g = xf.reshape(tuple(n + 1 for n in lvl.fine_dims))
        for a in lvl.axes:
            g = jax.lax.slice_in_dim(g, 0, g.shape[a], stride=2, axis=a)
        return g.reshape(-1)


class DGMultigrid:
    """p-multigrid preconditioner for SIPG DG-1 on structured box meshes.

    The reference runs its DG heat solve under PETSc GAMG
    (/root/reference/ThermoViscoProblem.py:344 with the DG-1 default of
    main.py:25). The TPU-native analog: smooth on the DG level (Chebyshev
    over D^{-1}A with the gather-free DG block stencil matvec), then
    correct through the CG-1 nodal space on the SAME mesh and recurse into
    the geometric hierarchy (GeometricMG above).

    The p-transfer is exact Galerkin: the prolongation P maps CG nodal
    values to DG cell-local dofs (DG-1 nodes are the cell vertices, so
    P x is a continuous bilinear field whose jumps vanish), hence
    P^T A_dg P equals the rediscretized CG-1 operator for the mass,
    stiffness and boundary terms — the coarse problem GeometricMG solves.
    """

    def __init__(self, dg_op, make_cg_operator, *, nu: int = 1,
                 smoother: str = "auto", dtype=jnp.float64,
                 mg_kwargs: dict | None = None, column_dense: bool = True,
                 coarse_kind: str = "geometric", grid_pad0: int = 0):
        fs = dg_op.fs
        mesh = fs.mesh
        if fs.family != "DG" or fs.degree != 1:
            raise ValueError("DGMultigrid needs a DG-1 space (p-transfer "
                             "to CG-1 is vertex-based)")
        if mesh.structured is None:
            raise ValueError("DGMultigrid needs a structured box mesh")
        from fem_glass_tempering_tpu.ops.stencil import DGStencilMatrix

        self.dg_op = dg_op
        # materialized block tables, not the constant-block form: the
        # cycle applies the matvec 4x per V-cycle and the table form
        # measured 2x faster on TPU (0.252 vs 0.497 ms at 524k dofs,
        # examples/profile_dg.py — same dispatch-bound reason as the
        # CG-side constant-row post-mortem in BENCH.md)
        self.stencil = DGStencilMatrix(dg_op, allow_const=False)
        self.nu = nu
        dims = tuple(mesh.structured["dims"])
        lengths = tuple(mesh.structured["lengths"])
        h = [ln / dd for ln, dd in zip(lengths, dims)]
        if smoother == "auto":
            # anisotropic plates (the 3D tempering north-star is ~50:1):
            # point/cell-block smoothers cannot damp jump modes along the
            # strongly coupled (small-h) axis — a line (column) solver
            # along that axis restores mesh-robust V-cycles (measured:
            # 13322 Jacobi-CG iters -> 90 with the column smoother on the
            # 16x16x8 plate at rtol 1e-12)
            smoother = ("column" if (len(dims) >= 2 and max(h) / min(h) > 3.0
                                     and self.stencil.cross_const)
                        else "block")
        if smoother not in ("jacobi", "chebyshev", "block", "column"):
            raise ValueError(smoother)
        if smoother == "column" and not self.stencil.cross_const:
            raise ValueError("column smoother needs constant cross blocks")
        self.smoother = smoother
        self.column_dense = column_dense
        self.col_axis = int(np.argmin(h)) if smoother == "column" else None
        self.dtype = dtype
        # DG-1 local nodes are the cell vertices in the builders' order,
        # and the DG dofmap is arange(C*nloc), so cells.ravel() IS the
        # CG-node id of each DG dof.
        self.cells_flat = jnp.asarray(mesh.cells.reshape(-1), dtype=jnp.int32)
        self.n_nodes = mesh.n_nodes
        counts = np.bincount(mesh.cells.reshape(-1), minlength=mesh.n_nodes)
        self.inv_counts = jnp.asarray(1.0 / counts, dtype=dtype)
        # gather-free p-transfers on the lexicographic box lattice:
        # prolong = 8 static slices of the node grid, restrict = 8 static
        # slice-adds — the gather x_cg[cells_flat] / segment_sum pair costs
        # 7.2 ms per V-cycle at 524k dofs on TPU v5e (77% of the cycle,
        # examples/profile_dg.py) where the slice forms are VPU streaming.
        self._node_grid = tuple(n + 1 for n in dims)
        nstr = [int(np.prod(self._node_grid[i + 1:]))
                for i in range(len(dims))]
        cells_np = mesh.cells
        offs = []
        for l in range(cells_np.shape[1]):
            nid = int(cells_np[0, l])
            o = []
            for s in nstr:
                o.append(nid // s)
                nid %= s
            offs.append(tuple(o))
        # verify translation invariance (vectorized reconstruction)
        cc = np.stack(np.unravel_index(np.arange(mesh.n_cells), dims),
                      axis=-1)
        rec = np.stack([
            sum((cc[:, i] + o[i]) * nstr[i] for i in range(len(dims)))
            for o in offs], axis=-1)
        self._vert_offs = offs if np.array_equal(rec, cells_np) else None
        # coarse_kind="grid": the CG-1 correction runs through GridMG
        # (solver/grid_mg.py), the V-cycle already validated under GSPMD —
        # this is the sharded-DG route (parallel/grid_shard.py). The
        # geometric default is the single-device production path.
        self.coarse_kind = coarse_kind
        # grid_pad0: sharded callers pad the CG-correction node grid's
        # axis 0 to a device multiple with identity ghost rows (the same
        # mechanism as parallel/grid_shard.py's fine-level pad); the
        # p-transfers below pad/slice at the boundary between the DG cell
        # grid and the padded node grid.
        self._grid_pad0 = int(grid_pad0)
        if coarse_kind == "grid":
            from fem_glass_tempering_tpu.ops.grid import GridHeatOperator
            from fem_glass_tempering_tpu.solver.grid_mg import GridMG
            kw = dict(mg_kwargs or {})
            kw.pop("max_levels", None)      # GridMG: auto depth only
            kw.pop("table_dtype", None)
            if kw.get("coarse") == "dense":
                kw["coarse"] = "auto"
            self.cg_mg = GridMG(
                GridHeatOperator(make_cg_operator(mesh),
                                 pad_axis0=grid_pad0, allow_const=False),
                make_cg_operator, **kw)
        else:
            self.cg_mg = GeometricMG(mesh, make_cg_operator, dtype=dtype,
                                     **(mg_kwargs or {}))
        self._frozen_rho = None

    # ---- p-transfers -------------------------------------------------
    def prolong(self, x_cg):
        if self._vert_offs is None:
            return x_cg[self.cells_flat]
        dims = self.stencil.cell_dims
        xg = x_cg.reshape(self._node_grid)
        parts = [jax.lax.slice(xg, o, tuple(oi + di for oi, di
                                            in zip(o, dims)))
                 for o in self._vert_offs]
        return jnp.stack(parts, axis=-1).reshape(-1)

    def restrict(self, r_dg):
        if self._vert_offs is None:
            return jax.ops.segment_sum(r_dg, self.cells_flat,
                                       num_segments=self.n_nodes)
        dims = self.stencil.cell_dims
        rg = r_dg.reshape(dims + (self.stencil.nloc,))
        out = jnp.zeros(self._node_grid, dtype=r_dg.dtype)
        for l, o in enumerate(self._vert_offs):
            sl = tuple(slice(oi, oi + di) for oi, di in zip(o, dims))
            out = out.at[sl].add(rg[..., l])
        return out.reshape(-1)

    def restrict_state(self, T_dg):
        """Vertex-averaged CG representation of a DG iterate — the
        linearization state for the coarse hierarchy."""
        return self.restrict(T_dg) * self.inv_counts

    # ---- grid-shaped p-transfers (the GSPMD path: no flat reshape
    # across the sharded axis; pure static slice/pad ops) --------------
    def prolong_g(self, x_cg):
        """(gx, gy, gz) node grid -> (cx, cy, cz, nloc) DG cell grid."""
        assert self._vert_offs is not None
        dims = self.stencil.cell_dims
        parts = [jax.lax.slice(x_cg, o, tuple(oi + di for oi, di
                                              in zip(o, dims)))
                 for o in self._vert_offs]
        return jnp.stack(parts, axis=-1)

    def restrict_g(self, r_dg):
        """(cx, cy, cz, nloc) -> (gx, gy, gz): transposed prolongation as
        2^d full-grid pads + adds (partitioner-friendly; no scatter)."""
        assert self._vert_offs is not None
        out = None
        for l, o in enumerate(self._vert_offs):
            pads = [(oi, 1 - oi) for oi in o]
            t = jnp.pad(r_dg[..., l], pads)
            out = t if out is None else out + t
        return out

    def restrict_state_g(self, T_dg):
        inv = self.inv_counts.reshape(self._node_grid)
        return self.restrict_g(T_dg) * inv

    # ---- block/line solvers -------------------------------------------
    # The smoother solve is split into (data, apply): `_zsolve_data` builds
    # the factor arrays, `_zsolve_apply(data, r)` applies them. Frozen
    # data lives in `_frozen_smoother_data` — a plain pytree of arrays, so
    # the jit-argument machinery (utils/jitargs.py) can thread it into
    # compiled programs instead of baking ~tens of MB of factors as HLO
    # constants.
    def _zsolve_data(self, T_dg, dt):
        """'jacobi'/'chebyshev' -> pointwise diagonal; 'block' -> exact
        per-cell (nloc x nloc) self-block inverse; 'column' -> exact
        block-tridiagonal factors of every cell column along the strongly
        coupled axis (batched Thomas — MXU-shaped 8x8 matmuls, no
        gathers)."""
        if self.smoother in ("jacobi", "chebyshev"):
            return {"diag": self.dg_op.jacobian_diag(T_dg, dt)}
        vals_self = self.stencil.values_at(T_dg, dt)      # (C, nloc, nloc)
        # factorize in f64, apply in the cycle dtype: the SIPG self
        # blocks carry the penalty terms' huge dynamic range, and an f32
        # block inverse/Thomas recurrence loses enough accuracy to gut
        # the cycle (measured, 16x16x8 50:1 plate at a transient state:
        # 257 -> 63 MG-CG iterations with f64 factors cast to f32).
        # Factorization is once per Newton iteration, O(C nloc^3) — noise
        # next to the CG iterations it saves, even under TPU f64
        # emulation.
        up = (self.dtype == jnp.float32 and jax.config.jax_enable_x64)
        vals_f = vals_self.astype(jnp.float64) if up else vals_self
        if self.smoother == "block":
            inv = jnp.linalg.inv(vals_f)
            return {"inv_self": inv.astype(self.dtype) if up else inv}
        data = self._column_factorize(vals_f, dt)
        if up:
            data = jax.tree_util.tree_map(
                lambda a: a.astype(self.dtype), data)
        return data

    def _column_factorize(self, vals_self, dt):
        st = self.stencil
        a = self.col_axis
        dims = st.cell_dims
        d = len(dims)
        nloc = st.nloc
        nzc = dims[a]
        ncol = st.C // nzc
        Bp = st.Bp[a] * dt                                # k -> k+1 coupling
        Bm = st.Bm[a] * dt                                # k -> k-1 coupling

        perm = tuple(i for i in range(d) if i != a) + (a,)
        A = vals_self.reshape(dims + (nloc, nloc))
        A = jnp.transpose(A, perm + (d, d + 1)).reshape(ncol, nzc, nloc, nloc)

        # block-Thomas factorization: D'_0 = A_0;
        # L_k = Bm D'_{k-1}^{-1}, D'_k = A_k - L_k Bp
        invD = [jnp.linalg.inv(A[:, 0])]
        Ls = []
        for k in range(1, nzc):
            Lk = jnp.einsum("lm,cmk->clk", Bm, invD[-1])
            Dk = A[:, k] - jnp.einsum("clk,km->clm", Lk, Bp)
            invD.append(jnp.linalg.inv(Dk))
            Ls.append(Lk)
        return {"invD": invD, "Ls": Ls, "BpT": Bp.T}

    @staticmethod
    def _bmv(M, v):
        """Batched small-block matvec as multiply+reduce instead of a
        batched dot_general: the axon TPU runtime compiles chains of tiny
        batched einsum contractions pathologically (minutes per op,
        measured; the round-2 'DG device fault' program wedged here).
        mul+sum lowers to plain VPU elementwise+reduce."""
        return (M * v[..., None, :]).sum(-1)

    def _zsolve_apply(self, data, r):
        if "diag" in data:
            return r / data["diag"]
        if "inv_self" in data:
            C, nloc = self.stencil.C, self.stencil.nloc
            return self._bmv(data["inv_self"],
                             r.reshape(C, nloc)).reshape(-1)
        if "colinv" in data:
            return self._colinv_apply(data, r)
        st = self.stencil
        a = self.col_axis
        dims = st.cell_dims
        d = len(dims)
        nloc = st.nloc
        nzc = dims[a]
        ncol = st.C // nzc
        perm = tuple(i for i in range(d) if i != a) + (a,)
        inv_perm = tuple(int(i) for i in np.argsort(perm))
        invD, Ls, BpT = data["invD"], data["Ls"], data["BpT"]
        rg = r.reshape(dims + (nloc,))
        rg = jnp.transpose(rg, perm + (d,)).reshape(ncol, nzc, nloc)
        y = [rg[:, 0]]
        for k in range(1, nzc):
            y.append(rg[:, k] - self._bmv(Ls[k - 1], y[-1]))
        x = [None] * nzc
        x[-1] = self._bmv(invD[-1], y[-1])
        for k in range(nzc - 2, -1, -1):
            x[k] = self._bmv(invD[k], y[k] - self._bmv(BpT.T, x[k + 1]))
        xg = jnp.stack(x, axis=1)                         # (ncol, nzc, nloc)
        shape_perm = tuple(dims[i] for i in perm) + (nloc,)
        xg = xg.reshape(shape_perm)
        xg = jnp.transpose(xg, inv_perm + (d,))
        return xg.reshape(-1)

    def _colinv_apply(self, data, r):
        """Exact column solve via frozen dense PER-TYPE column inverses:
        on a uniform box the (nzc·nloc)² block-tridiagonal column matrix
        takes only a handful of distinct values (interior / x-y boundary
        layers / corners), so the solve is ONE (ncol, nb)x(nb, t·nb)
        matmul plus a masked combine — two large MXU/VPU ops instead of
        the ~3·nzc SEQUENTIAL small block ops of the Thomas recurrence
        (the TPU dispatch-bound tail of the DG V-cycle)."""
        st = self.stencil
        a = self.col_axis
        dims = st.cell_dims
        d = len(dims)
        nloc = st.nloc
        nzc = dims[a]
        ncol = st.C // nzc
        nb = nzc * nloc
        perm = tuple(i for i in range(d) if i != a) + (a,)
        inv_perm = tuple(int(i) for i in np.argsort(perm))
        Minv = data["colinv"]                       # (t, nb, nb)
        mask = data["colmask"]                      # (ncol, t)
        t = Minv.shape[0]
        rg = r.reshape(dims + (nloc,))
        rg = jnp.transpose(rg, perm + (d,)).reshape(ncol, nb)
        ys = (rg @ Minv.reshape(t * nb, nb).T).reshape(ncol, t, nb)
        xg = (ys * mask[:, :, None]).sum(axis=1)    # (ncol, nb)
        shape_perm = tuple(dims[i] for i in perm) + (nloc,)
        xg = xg.reshape(shape_perm)
        xg = jnp.transpose(xg, inv_perm + (d,))
        return xg.reshape(-1)

    # ---- setup -------------------------------------------------------
    def freeze(self, T_dg0, dt) -> None:
        """Build the smoother factors ONCE at the initial state, estimate
        rho(Z^{-1}A) by power iteration, and freeze both (plus the coarse
        hierarchy's smoother spectra) — same rationale as
        GeometricMG.freeze_omegas. Everything runs HOST-SIDE in numpy
        (the previous eager-device version cost hundreds of remote-TPU
        tunnel round trips at setup) and only the final factor arrays are
        placed on the device."""
        st = self.stencil
        p = st.op.params
        C, nloc, d = st.C, st.nloc, st.d
        # NEVER read a device array back here: the first device->host
        # readback in a process costs ~1 min flat in this environment
        # (measured on a fresh 2 MB jnp.full on the CPU backend) and
        # hundreds of seconds through the remote-TPU tunnel — it was 93%
        # of DG setup. The frozen boundary linearization only needs the
        # scalar initial temperature, which the operator already carries.
        if isinstance(T_dg0, (int, float, np.floating)):
            T0 = float(T_dg0)
        elif isinstance(T_dg0, np.ndarray):
            T0 = float(T_dg0.reshape(-1)[0])
        else:                      # None or a device array (= jnp.full(T_0))
            T0 = float(p.T_0)

        # values_at at a CONSTANT initial temperature, in numpy
        vals = st.np_self_mass + dt * st.np_self_stiff
        bdm = st.op.np_b_dofmap
        if len(bdm):
            dflux0 = p.boundary_scale * (
                4.0 * p.sigma * p.epsilon * T0**3 + p.htc)
            blocks = dflux0 * dt * np.einsum(
                "fq,fql,fqm->flm", st.op.np_b_qw, st.op.np_b_phi,
                st.op.np_b_phi)
            b_cell = bdm[:, 0] // nloc
            base = np.arange(nloc * nloc)
            flat = (b_cell[:, None] * (nloc * nloc) + base).reshape(-1)
            vals = (vals.reshape(-1) + np.bincount(
                flat, weights=blocks.reshape(-1),
                minlength=C * nloc * nloc)).reshape(C, nloc, nloc)

        Bp = [b * dt for b in st.np_Bp]
        Bm = [b * dt for b in st.np_Bm]

        def np_matvec(x):
            xg = x.reshape(st.cell_dims + (nloc,))
            y = np.einsum("clm,cm->cl", vals,
                          x.reshape(C, nloc)).reshape(xg.shape)
            for a in range(d):
                for B, sign in ((Bp[a], +1), (Bm[a], -1)):
                    padc = [(0, 0)] * (d + 1)
                    padc[a] = (0, 1) if sign > 0 else (1, 0)
                    xp = np.pad(xg, padc)
                    sl = [slice(None)] * (d + 1)
                    sl[a] = (slice(1, None) if sign > 0
                             else slice(0, xg.shape[a]))
                    y = y + xp[tuple(sl)] @ B.T
            return y.reshape(-1)

        if self.smoother in ("jacobi", "chebyshev"):
            diag = np.einsum("cll->cl", vals).reshape(-1)
            zsolve = lambda r: r / diag
            data = {"diag": jnp.asarray(diag, dtype=self.dtype)}
        elif self.smoother == "block":
            inv_self = np.linalg.inv(vals)
            zsolve = lambda r: np.einsum(
                "clm,cm->cl", inv_self, r.reshape(C, nloc)).reshape(-1)
            data = {"inv_self": jnp.asarray(inv_self, dtype=self.dtype)}
        else:
            a = self.col_axis
            dims = st.cell_dims
            nzc = dims[a]
            ncol = C // nzc
            perm = tuple(i for i in range(d) if i != a) + (a,)
            inv_perm = tuple(int(i) for i in np.argsort(perm))
            A = vals.reshape(dims + (nloc, nloc))
            A = np.transpose(A, perm + (d, d + 1)).reshape(
                ncol, nzc, nloc, nloc)
            nb = nzc * nloc
            # dense per-type column inverses (see _colinv_apply): group
            # matching columns (uniform boxes have ~3^(d-1) types:
            # interior / x-y boundary layers / corners) and invert each
            # dense block-tridiagonal column matrix once. Grouping keys
            # are quantized to 12 digits — assembly summation order
            # leaves ~1e-12 relative noise between same-type columns, and
            # a frozen preconditioner tolerates picking one representative
            keys = A.reshape(ncol, -1)
            kscale = max(float(np.abs(keys).max()), 1e-300)
            uniq, first, inv_idx = np.unique(
                np.round(keys / kscale, 12), axis=0, return_index=True,
                return_inverse=True)
            inv_idx = np.asarray(inv_idx).reshape(-1)
            if self.column_dense and nb <= 512 and len(uniq) <= 32:
                nt = len(uniq)
                Ms = np.zeros((nt, nb, nb))
                for t, At in enumerate(A[first]):
                    M = np.zeros((nb, nb))
                    for k in range(nzc):
                        M[k * nloc:(k + 1) * nloc,
                          k * nloc:(k + 1) * nloc] = At[k]
                        if k + 1 < nzc:
                            M[k * nloc:(k + 1) * nloc,
                              (k + 1) * nloc:(k + 2) * nloc] = Bp[a]
                            M[(k + 1) * nloc:(k + 2) * nloc,
                              k * nloc:(k + 1) * nloc] = Bm[a]
                    Ms[t] = np.linalg.inv(M)
                mask = np.zeros((ncol, nt))
                mask[np.arange(ncol), inv_idx] = 1.0

                def zsolve(r):
                    rg = r.reshape(dims + (nloc,))
                    rg = np.transpose(rg, perm + (d,)).reshape(ncol, nb)
                    x = np.empty_like(rg)
                    for t in range(nt):
                        sel = inv_idx == t
                        x[sel] = rg[sel] @ Ms[t].T
                    shape_perm = tuple(dims[i] for i in perm) + (nloc,)
                    xg = x.reshape(shape_perm)
                    return np.transpose(xg, inv_perm + (d,)).reshape(-1)

                data = {"colinv": jnp.asarray(Ms, dtype=self.dtype),
                        "colmask": jnp.asarray(mask, dtype=self.dtype)}
            else:
                invD = [np.linalg.inv(A[:, 0])]
                Ls = []
                for k in range(1, nzc):
                    Lk = np.einsum("lm,cmk->clk", Bm[a], invD[-1])
                    Dk = A[:, k] - np.einsum("clk,km->clm", Lk, Bp[a])
                    invD.append(np.linalg.inv(Dk))
                    Ls.append(Lk)

                def zsolve(r):
                    rg = r.reshape(dims + (nloc,))
                    rg = np.transpose(rg, perm + (d,)).reshape(
                        ncol, nzc, nloc)
                    y = [rg[:, 0]]
                    for k in range(1, nzc):
                        y.append(rg[:, k] - np.einsum(
                            "clk,ck->cl", Ls[k - 1], y[-1]))
                    x = [None] * nzc
                    x[-1] = np.einsum("clm,cm->cl", invD[-1], y[-1])
                    for k in range(nzc - 2, -1, -1):
                        x[k] = np.einsum("clm,cm->cl", invD[k],
                                         y[k] - x[k + 1] @ Bp[a].T)
                    xg = np.stack(x, axis=1)
                    shape_perm = tuple(dims[i] for i in perm) + (nloc,)
                    xg = xg.reshape(shape_perm)
                    xg = np.transpose(xg, inv_perm + (d,))
                    return xg.reshape(-1)

                data = {"invD": [jnp.asarray(m, dtype=self.dtype)
                                 for m in invD],
                        "Ls": [jnp.asarray(m, dtype=self.dtype)
                               for m in Ls],
                        "BpT": jnp.asarray(Bp[a].T, dtype=self.dtype)}

        n = C * nloc
        # rho(Z^-1 A) upper estimate. The smoother's Chebyshev window
        # [rho/4, rho] MUST cover lambda_max: an underestimate leaves
        # |1 - p(lambda)| > 1 modes and the V-cycle AMPLIFIES them —
        # measured on the 16x16x8 50:1 plate: 12 deterministic power
        # iterations gave 1.08 while the true lambda_max is 1.97, i.e.
        # rho(I - M^-1 A) = 3.7, a divergent stationary iteration that
        # only survived inside CG (and cost ~4x the iterations).
        # Power-iterate from a seeded random start (the deterministic
        # sine start is nearly orthogonal to the dominant xy-coupling
        # mode) until the Rayleigh estimate stalls, then take a 15%
        # safety margin: overestimating mildly weakens smoothing,
        # underestimating diverges.
        rng_pi = np.random.default_rng(12345)
        v = rng_pi.standard_normal(n)
        rho = 1.0
        for i in range(200):
            w = zsolve(np_matvec(v))
            rho_new = float(np.linalg.norm(w) / np.linalg.norm(v))
            v = w / np.linalg.norm(w)
            if i >= 30 and abs(rho_new - rho) < 1e-3 * rho:
                rho = rho_new
                break
            rho = rho_new
        self._frozen_rho = rho * 1.15
        self._frozen_smoother_data = data
        # freeze_omegas never uses the fine state (Gershgorin from numpy
        # row stats); the previous restrict_state(T_dg0) here was a pure
        # eager-dispatch cost through the remote-TPU tunnel
        if self.coarse_kind == "grid":
            self.cg_mg.freeze_rhos(dt)
        else:
            self.cg_mg.freeze_omegas(None, dt)

    # ---- grid-shaped apply (GSPMD path) ------------------------------
    def _zsolve_apply_g(self, data, rg):
        """Grid-shaped smoother solve: rg (cx, cy, cz, nloc) in/out."""
        if "diag" in data:
            return rg / data["diag"].reshape(rg.shape)
        if "inv_self" in data:
            return self._bmv(data["inv_self"].reshape(
                rg.shape[:-1] + data["inv_self"].shape[-2:]), rg)
        if "colinv" not in data:
            raise ValueError("grid-shaped smoother needs the dense column "
                             "form (column_dense=True) or block/jacobi")
        st = self.stencil
        a = self.col_axis
        dims = st.cell_dims
        d = len(dims)
        nloc = st.nloc
        nzc = dims[a]
        ncol = st.C // nzc
        nb = nzc * nloc
        perm = tuple(i for i in range(d) if i != a) + (a,)
        inv_perm = tuple(int(i) for i in np.argsort(perm))
        Minv = data["colinv"]                       # (t, nb, nb)
        mask = data["colmask"]                      # (ncol, t)
        t = Minv.shape[0]
        rt = jnp.transpose(rg, perm + (d,)).reshape(ncol, nb)
        ys = (rt @ Minv.reshape(t * nb, nb).T).reshape(ncol, t, nb)
        xg = (ys * mask[:, :, None]).sum(axis=1)    # (ncol, nb)
        shape_perm = tuple(dims[i] for i in perm) + (nloc,)
        xg = xg.reshape(shape_perm)
        return jnp.transpose(xg, inv_perm + (d,))

    def preconditioner_g(self, T_dg_g, dt, matvec_g):
        """Grid-shaped DG p-MG apply for the GSPMD-sharded step: the
        caller supplies the gather-free grid matvec
        (solver/grid_dg.py GridDGOperator.make_matvec_g at the frozen
        state); the CG correction must be a GridMG (coarse_kind='grid').
        Frozen smoother data required (freeze())."""
        assert self.coarse_kind == "grid", \
            "preconditioner_g needs coarse_kind='grid'"
        data = getattr(self, "_frozen_smoother_data", None)
        rho = self._frozen_rho
        assert data is not None and rho is not None, "call freeze() first"
        mv = matvec_g
        pad = self._grid_pad0
        gx = self._node_grid[0]

        def pad0(a, mode="constant"):
            if not pad:
                return a
            return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                           mode=mode)

        def unpad0(a):
            if not pad:
                return a
            return jax.lax.slice_in_dim(a, 0, gx, axis=0)

        T_cg = pad0(self.restrict_state_g(T_dg_g), mode="edge")
        inner = self.cg_mg.preconditioner_g(
            self.cg_mg.linearization_states_g(T_cg), dt)
        zsolve = lambda r: self._zsolve_apply_g(data, r)
        nu = self.nu

        def smooth(x, b):
            if self.smoother == "jacobi":
                omega = 4.0 / (3.0 * rho)
                for _ in range(nu):
                    x = x + omega * zsolve(b - mv(x))
                return x
            lmax = rho
            lmin = lmax / 4.0
            theta = 0.5 * (lmax + lmin)
            delta = 0.5 * (lmax - lmin)
            sigma = theta / delta
            rho_k = 1.0 / sigma
            z = zsolve(b - mv(x))
            p = z / theta
            x = x + p
            for _ in range(max(nu - 1, 0)):
                z = zsolve(b - mv(x))
                rho_next = 1.0 / (2.0 * sigma - rho_k)
                p = rho_next * rho_k * p + (2.0 * rho_next / delta) * z
                x = x + p
                rho_k = rho_next
            return x

        def apply(r):
            x = smooth(jnp.zeros_like(r), r)
            rr = r - mv(x)
            xc = unpad0(inner(pad0(self.restrict_g(rr))))
            x = x + self.prolong_g(xc)
            return smooth(x, r)

        return apply

    # ---- apply -------------------------------------------------------
    def preconditioner(self, T_dg, dt):
        mv = self.stencil.make_matvec(T_dg, dt)
        T_cg = self.restrict_state(T_dg)
        inner = self.cg_mg.preconditioner(
            self.cg_mg.linearization_states(T_cg), dt)
        data = getattr(self, "_frozen_smoother_data", None)
        rho = self._frozen_rho
        if data is None:
            data = self._zsolve_data(T_dg, dt)
        zsolve = lambda r: self._zsolve_apply(data, r)
        if rho is None:
            # traced fallback (frozen path is production): few power
            # iterations from a deterministic start UNDERESTIMATE badly
            # (measured 1.08 vs true 1.97 on the 16x16x8 plate — see
            # freeze), and an underestimated Chebyshev window makes the
            # cycle amplify the uncovered modes. Wide safety margin.
            v = jnp.sin(jnp.arange(T_dg.shape[0], dtype=T_dg.dtype) * 0.7) + 0.01
            r = jnp.asarray(1.0, T_dg.dtype)
            for _ in range(10):
                w = zsolve(mv(v))
                r = jnp.linalg.norm(w) / jnp.linalg.norm(v)
                v = w / jnp.linalg.norm(w)
            rho = r * 2.0

        nu = self.nu

        def smooth(x, b):
            # Chebyshev acceleration of the zsolve over [rho/4, rho]
            # ('jacobi' mode: single damped sweep)
            if self.smoother == "jacobi":
                omega = 4.0 / (3.0 * rho)
                for _ in range(nu):
                    x = x + omega * zsolve(b - mv(x))
                return x
            lmax = rho
            lmin = lmax / 4.0
            theta = 0.5 * (lmax + lmin)
            delta = 0.5 * (lmax - lmin)
            sigma = theta / delta
            rho_k = 1.0 / sigma
            z = zsolve(b - mv(x))
            p = z / theta
            x = x + p
            for _ in range(max(nu - 1, 0)):
                z = zsolve(b - mv(x))
                rho_next = 1.0 / (2.0 * sigma - rho_k)
                p = rho_next * rho_k * p + (2.0 * rho_next / delta) * z
                x = x + p
                rho_k = rho_next
            return x

        def apply(r):
            x = smooth(jnp.zeros_like(r), r)
            rr = r - mv(x)
            xc = inner(self.restrict(rr))
            x = x + self.prolong(xc)
            return smooth(x, r)

        return apply
