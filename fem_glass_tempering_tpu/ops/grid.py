"""Fully gather-free heat operator for CG-1 on uniform box meshes.

The stencil operator (ops/stencil.py) removed gathers from the CG *matvec*
loop; this module removes them from the rest of the Newton iteration — the
residual, the Jacobi diagonal, and the per-Newton boundary-linearization
update of the stencil values — so the complete implicit heat solve is
static pad/slice/elementwise arithmetic on the (nx+1, ny+1, nz+1) node
grid. That matters twice:

1. single chip: no gather/scatter dispatches per Newton iteration;
2. SPMD: every op in the solve is local-plus-halo under a sharded node
   grid, so `jax.jit` with sharded inputs partitions the whole step with
   XLA collective-permute halos — the TPU-native analog of the reference's
   domain decomposition (mpiexec path, /root/reference/README.md:62-66)
   with *no* replicated state (see parallel/grid_shard.py).

Structure: the linear part (consistent mass + alpha-stiffness) rides the
StencilMatrix values. The nonlinear boundary flux (radiation + convection,
reference ThermoViscoProblem.py:293-306 with the 0.001 scale) is evaluated
per box face: on a uniform box every facet of a face has identical
geometry, so one (q, nloc) basis table + one (q,) weight row covers the
whole face, facet corner values are static slices of the node grid, and
the scatter back is a static-slice add.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fem_glass_tempering_tpu.ops.assembly import build_boundary_geometry
from fem_glass_tempering_tpu.ops.heat import HeatOperator
from fem_glass_tempering_tpu.ops.stencil import StencilMatrix


class _Face:
    __slots__ = ("axis", "side", "qw", "phi", "cell_dims", "np_phi")

    def __init__(self, axis, side, qw, phi, cell_dims):
        self.axis = axis      # grid axis 0..d-1
        self.side = side      # 0 = low face, 1 = high face
        self.qw = qw          # (q,) facet quadrature weights * |detJ|
        self.phi = phi        # (q, nloc) cell basis on the facet
        self.cell_dims = cell_dims


class GridHeatOperator:
    """Drop-in replacement for HeatOperator.residual / jacobian_diag plus
    StencilMatrix.make_matvec, valid for CG-1 spaces on uniform box meshes
    with the default whole-boundary flux (no flux_marker, no MMS source)."""

    def __init__(self, op: HeatOperator, pad_axis0: int = 0,
                 use_pallas: bool = False, flux_marker=None,
                 lazy_tables: bool = False, allow_const: bool = True):
        """`pad_axis0` appends that many ghost node planes along grid axis
        0, wired as identity rows (residual T - T_0, unit diagonal,
        identity matvec) — used by the GSPMD path to make the sharded axis
        divisible by the device count (parallel/grid_shard.py). The flat
        (n,)-vector API is only available unpadded.

        `flux_marker(midpoints) -> bool mask` restricts the radiation +
        convection flux to whole box faces (e.g. only the large z-faces
        of a tempering plate, examples/full_tempering_demo.py); a marker
        that cuts through a face is rejected — use HeatOperator's gather
        assembly for partial-face flux."""
        fs = op.fs
        mesh = fs.mesh
        if mesh.structured is None or fs.family != "CG" or fs.degree != 1:
            raise ValueError("GridHeatOperator needs a structured box mesh "
                             "with a CG-1 space")
        if op.source_q is not None:
            raise ValueError("GridHeatOperator does not support MMS sources")
        self.op = op
        self.params = op.params
        self.dtype = op.dtype
        # hand-tiled Pallas matvec for the CG loop (TPU, f32, d>=2);
        # the XLA pad+slice path is the portable fallback. "auto"
        # resolves to OFF (r4 retirement measurement): the kernel wins
        # the ISOLATED matvec below ~300k dofs (0.010 vs 0.023 ms at
        # 72k) and ties at 1M (0.171 vs 0.171 — both HBM roofline), but
        # in the FULL step it measured 19.8 vs 12.4 ms/step at 72k
        # (2026-08, jacobi config, 526 CG/step): engaging it displaces
        # the const-row form + XLA's fusion of the matvec into the CG
        # recurrence. Opt-in via use_pallas=True remains validated.
        if use_pallas == "auto":
            use_pallas = False
        self.use_pallas = bool(use_pallas)
        self.st = StencilMatrix(op, make_tables=False)
        self.pad0 = int(pad_axis0)
        self.grid = ((self.st.grid[0] + self.pad0,) + self.st.grid[1:]
                     if self.pad0 else self.st.grid)
        self.dims = tuple(mesh.structured["dims"])
        self.d = len(self.dims)
        self.n = fs.n_scalar_dofs
        nloc = fs.element.nloc
        self.nloc = nloc

        bq = 5 * fs.degree
        bg = build_boundary_geometry(mesh, fs, bq)
        if len(bg.cell) != len(mesh.boundary_cell):
            raise ValueError("flux restricted to a facet subset — grid path "
                             "requires whole-boundary flux or a whole-face "
                             "flux_marker")
        if flux_marker is not None:
            mids = bg.qpoints_phys.mean(axis=1)
            keep = np.asarray(flux_marker(mids), dtype=bool)
        else:
            keep = np.ones(len(bg.cell), dtype=bool)

        # group facets by (axis, side) from the outward normal; verify the
        # uniform-grid invariant (identical tables across each face)
        normal = bg.normal[:, 0, :]                       # (f, g)
        axis = np.argmax(np.abs(normal), axis=1)
        side = (normal[np.arange(len(axis)), axis] > 0).astype(int)
        cells = bg.cell
        strides = np.array(
            [int(np.prod(self.dims[i + 1:])) for i in range(self.d)])

        self.faces: list[_Face] = []
        for a in range(self.d):
            for s in (0, 1):
                sel = (axis == a) & (side == s)
                if not sel.any():
                    continue
                k = keep[sel]
                if not k.any():
                    continue          # face fully insulated by the marker
                if not k.all():
                    raise ValueError(
                        "flux_marker cuts through a box face — the grid "
                        "path handles whole faces only")
                qw = bg.qweights[sel]
                phi = bg.phi[sel]
                if (np.abs(qw - qw[0]).max() > 1e-12 * max(qw.max(), 1e-30)
                        or np.abs(phi - phi[0]).max() > 1e-12):
                    raise ValueError("non-uniform face tables — mesh is not "
                                     "a uniform box")
                # the face layer must contain every cell exactly once
                layer = cells[sel]
                ca = (layer // strides[a]) % self.dims[a]
                expect = 0 if s == 0 else self.dims[a] - 1
                n_layer = int(np.prod(self.dims)) // self.dims[a]
                if not (len(layer) == n_layer and np.all(ca == expect)
                        and len(np.unique(layer)) == n_layer):
                    raise ValueError("face layer mismatch — mesh is not a "
                                     "uniform box")
                cd = tuple(self.dims[i] if i != a else 1
                           for i in range(self.d))
                face = _Face(a, s, jnp.asarray(qw[0], dtype=op.dtype),
                             jnp.asarray(phi[0], dtype=op.dtype), cd)
                face.np_phi = np.asarray(phi[0])
                self.faces.append(face)

        # local node l <-> lattice offset bits (builders' tensor-product
        # vertex order: l = ix + 2*iy + 4*iz)
        self.loffs = [tuple((l >> i) & 1 for i in range(self.d))
                      for l in range(nloc)]
        # significant basis columns per face (off-face corners are zero) —
        # numpy, NOT eager jnp: every eager op at setup is a device round
        # trip (minutes through a remote-TPU tunnel)
        self._face_cols = []
        for fc in self.faces:
            cols = [l for l in range(nloc)
                    if float(np.abs(fc.np_phi[:, l]).max()) > 1e-14]
            self._face_cols.append(cols)

        self._offsets = self.st.offsets

        # mass row sums M @ 1 (for the constant-source term) — computed in
        # numpy at setup (an eager device stencil apply costs ~60 tunnel
        # round trips)
        vm_np = self.st.np_mass
        if self.pad0:
            pc = [(0, 0), (0, self.pad0)] + [(0, 0)] * (self.d - 1)
            vm_np = np.pad(vm_np, pc)
        m1 = np.zeros(self.grid)
        xp = np.pad(np.ones(self.grid), 1)
        for o, off in enumerate(self._offsets):
            sl = tuple(slice(int(v), int(v) + g)
                       for v, g in zip(off, self.grid))
            m1 += vm_np[o] * xp[sl]
        self.M1g = jnp.asarray(m1, dtype=op.dtype)

        # stencil-offset id for a (l, m) corner pair: StencilMatrix's
        # lexicographic delta+1 encoding
        def off_id(lo, mo):
            o = 0
            for i in range(self.d):
                o = o * 3 + (mo[i] - lo[i] + 1)
            return o
        self._pair_off = [[off_id(self.loffs[l], self.loffs[m])
                           for m in range(nloc)] for l in range(nloc)]

        self.bc_mask = op.bc_mask
        self.bc_values = op.bc_values
        mask_g = op.bc_mask.reshape(self.st.grid)
        vals_g = op.bc_values.reshape(self.st.grid)
        if self.pad0:
            pc = [(0, self.pad0)] + [(0, 0)] * (self.d - 1)
            mask_g = jnp.pad(mask_g, pc, constant_values=True)
            vals_g = jnp.pad(vals_g, pc,
                             constant_values=float(op.params.T_0))
        self.bc_mask_g = mask_g
        self.bc_values_g = vals_g
        self.has_bc = op.has_bc or self.pad0 > 0

        # ---- constant-row decomposition (uniform-box fast form) --------
        # On a uniform box the assembled stencil tables are x-translation-
        # invariant on every interior x-plane (a node at row 1..gx-2 sees
        # the same cell neighborhood regardless of row), so the
        # (n_off, *grid) tables collapse to ONE (n_off, M) minor-axis row
        # plus deltas on the two x-boundary planes. The Jacobian matvec
        # then streams only x and y — the materialized 27-value table
        # (115 MB at 1M dofs, the dominant HBM traffic of the CG loop and
        # every V-cycle level, BENCH.md) never exists — and the
        # T-dependent boundary-flux linearization is applied as
        # face-local terms instead of being scattered into a table.
        self.const_ok = False
        self.crow_mass = self.crow_stiff = None
        self.crow_dmass = self.crow_dstiff = None
        if (allow_const and self.pad0 == 0 and self.d >= 2
                and self.st.grid[0] >= 4):
            gx = self.st.grid[0]
            M = self.n // gx
            vm2 = self.st.np_mass.reshape(self.st.n_off, gx, M)
            vs2 = self.st.np_stiff.reshape(self.st.n_off, gx, M)
            ok = True
            for v2 in (vm2, vs2):
                ref = v2[:, 1:2, :]
                dev = float(np.abs(v2[:, 1:gx - 1, :] - ref).max())
                if dev > 1e-12 * max(float(np.abs(ref).max()), 1e-300):
                    ok = False
                    break
            if ok:
                g = lambda a: jnp.asarray(a, dtype=self.dtype)
                self.crow_mass = g(vm2[:, 1, :])
                self.crow_stiff = g(vs2[:, 1, :])
                # the two x-boundary planes carry their FULL row values
                # (the conv result there is overwritten, not corrected):
                # every accumulated term then multiplies the identical
                # value/neighbor pair in the identical offset order as the
                # table path — the decomposition is BITWISE-equal to
                # matvec_vals/matvec_diff, which the padded-vs-unpadded
                # and sharded-vs-single-device identities rely on
                self.crow_dmass = g(np.stack(
                    [vm2[:, 0], vm2[:, -1]], axis=1))
                self.crow_dstiff = g(np.stack(
                    [vs2[:, 0], vs2[:, -1]], axis=1))
                self.const_ok = True

        # per-face (q, lc, lc) basis products for the linearized flux
        # blocks — used by EVERY make_matvec form (the flux linearization
        # always rides per-apply, never baked into the value tables)
        self._face_phiphi = [
            jnp.asarray(np.einsum("ql,qm->qlm", fc.np_phi[:, cols],
                                  fc.np_phi[:, cols]), dtype=self.dtype)
            for fc, cols in zip(self.faces, self._face_cols)]

        # stencil value tables (padded with zero coupling on ghost planes).
        # When the constant-row form covers every consumer (lazy_tables
        # from the single-device driver / MG levels) the device tables are
        # skipped entirely: 2 x 115 MB of HBM + setup upload at 1M dofs.
        # The sharded paths (make_matvec_g / stencil_values_g /
        # matvec_vals, parallel/grid_shard.py + solver/grid_mg.py) still
        # need them and construct with the default lazy_tables=False.
        self.vals_mass = self.vals_stiff = None
        pallas_live = (self.use_pallas and self.d >= 2
                       and self.dtype == jnp.float32)  # mirrors make_matvec
        if not (self.const_ok and lazy_tables and not pallas_live):
            self.st.ensure_tables()
            if self.pad0:
                pc = [(0, 0), (0, self.pad0)] + [(0, 0)] * (self.d - 1)
                self.vals_mass = jnp.pad(self.st.st_mass, pc)
                self.vals_stiff = jnp.pad(self.st.st_stiff, pc)
            else:
                self.vals_mass = self.st.st_mass
                self.vals_stiff = self.st.st_stiff

    # ------------------------------------------------------------------
    def matvec_vals(self, vals: jnp.ndarray, xg: jnp.ndarray) -> jnp.ndarray:
        """Stencil matvec over the (possibly padded) node grid."""
        xp = jnp.pad(xg, 1)
        acc = jnp.zeros(self.grid, dtype=xg.dtype)
        for o, off in enumerate(self._offsets):
            start = tuple(int(v) for v in off)
            limit = tuple(s + g for s, g in zip(start, self.grid))
            acc = acc + vals[o] * jax.lax.slice(xp, start, limit)
        return acc

    def matvec_diff(self, vals: jnp.ndarray, xg: jnp.ndarray) -> jnp.ndarray:
        """Difference-form stencil matvec for zero-row-sum operators
        (pure stiffness): sum_o vals[o] * (x_{i+o} - x_i), skipping the
        center (its value is exactly minus the sum of the others). Unlike
        the plain form this annihilates constant fields EXACTLY in
        floating point — applying K to raw ~800 K temperatures in f32
        otherwise leaves a systematic row-sum bias that shifts the
        computed equilibrium and destabilizes Newton (measured)."""
        xp = jnp.pad(xg, 1)
        center = (3 ** self.d - 1) // 2
        acc = jnp.zeros(self.grid, dtype=xg.dtype)
        for o, off in enumerate(self._offsets):
            if o == center:
                continue
            start = tuple(int(v) for v in off)
            limit = tuple(s + g for s, g in zip(start, self.grid))
            acc = acc + vals[o] * (jax.lax.slice(xp, start, limit) - xg)
        return acc

    # ---- constant-row apply ------------------------------------------
    def _crow_conv(self, rowvals, brow, xg, diff: bool = False):
        """Grid-shaped conv from the constant-row decomposition: one flat
        (gx, M) conv with the (n_off, M) interior row, then the two
        x-boundary rows recomputed with their full row values (n_off,2,M)
        and OVERWRITTEN — every accumulated term multiplies the identical
        value/neighbor pair in the identical offset order as the table
        path, so the result is bitwise-equal to matvec_vals/matvec_diff.
        Wrapped flat reads are annihilated by assembled zeros in the row
        tables exactly as in StencilMatrix.matvec_flat. `diff=True`
        applies the difference form sum_o v_o (x_{i+o} - x_i) skipping
        the center offset (zero-row-sum operators: annihilates constants
        exactly in floating point, see matvec_diff)."""
        gx = self.st.grid[0]
        M = rowvals.shape[-1]
        shifts = self.st._flat_shifts()
        P = max(abs(s) for _, s in shifts)
        center = (self.st.n_off - 1) // 2
        x2 = xg.reshape(gx, M)
        xp = jnp.pad(x2, ((1, 1), (P, P)))
        acc = jnp.zeros((gx, M), dtype=x2.dtype)
        for o, (dx, sft) in enumerate(shifts):
            if diff and o == center:
                continue
            win = jax.lax.slice(xp, (dx, P + sft), (dx + gx, P + sft + M))
            acc = acc + rowvals[o][None, :] * (win - x2 if diff else win)
        for r_i, row in ((0, 0), (1, gx - 1)):
            w = jnp.zeros((1, M), dtype=x2.dtype)
            xr = jax.lax.slice(x2, (row, 0), (row + 1, M))
            for o, (dx, sft) in enumerate(shifts):
                if diff and o == center:
                    continue
                win = jax.lax.slice(
                    xp, (row + dx, P + sft), (row + dx + 1, P + sft + M))
                w = w + brow[o, r_i][None, :] * (win - xr if diff else win)
            acc = jax.lax.dynamic_update_slice(acc, w, (row, 0))
        return acc.reshape(self.grid)

    def _flux_lin_tables(self, Tg, dt):
        """Per-face (..., lc, lc) linearized-flux blocks at the frozen T:
        W[..., l, m] = sum_q w_q phi_ql phi_qm, w = dflux/dT * dt * qw —
        the face-local form of the boundary block stencil_values_g
        scatters into the full table."""
        p = self.params
        out = []
        for fc, cols, phiphi in zip(self.faces, self._face_cols,
                                    self._face_phiphi):
            phi = fc.phi[:, cols]
            corners = self._face_corners(Tg, fc, cols)
            Tb = jnp.einsum("...l,ql->...q", corners, phi)
            w = (p.boundary_scale
                 * (4.0 * p.sigma * p.epsilon * Tb**3 + p.htc)
                 * (dt * fc.qw))                           # (..., q)
            # multiply+reduce, not dot_general: the TPU runtime compiles
            # chains of tiny batched contractions pathologically
            out.append((w[..., :, None, None] * phiphi).sum(-3))
        return out

    def _apply_flux_lin(self, WW, xg, yg):
        for fc, cols, W in zip(self.faces, self._face_cols, WW):
            xc = self._face_corners(xg, fc, cols)          # (..., m)
            contrib = (W * xc[..., None, :]).sum(-1)       # (..., l)
            for j, l in enumerate(cols):
                yg = yg.at[self._corner_slices(fc, l)].add(contrib[..., j])
        return yg

    # ------------------------------------------------------------------
    def _corner_slices(self, face: _Face, l: int):
        """Static node-grid slices addressing corner l of every cell in the
        face's boundary layer."""
        off = self.loffs[l]
        idx = []
        for i in range(self.d):
            if i == face.axis:
                base = (0 if face.side == 0 else self.dims[i] - 1) + off[i]
                idx.append(slice(base, base + 1))
            else:
                idx.append(slice(off[i], off[i] + self.dims[i]))
        return tuple(idx)

    def _face_corners(self, Tg, face: _Face, cols):
        return jnp.stack(
            [Tg[self._corner_slices(face, l)] for l in cols], axis=-1)

    # ------------------------------------------------------------------
    def residual(self, T: jnp.ndarray, T_prev: jnp.ndarray,
                 dt=None) -> jnp.ndarray:
        assert self.pad0 == 0, "flat API unavailable on a padded grid"
        return self.residual_g(T.reshape(self.grid),
                               T_prev.reshape(self.grid), dt).reshape(-1)

    def residual_g(self, Tg: jnp.ndarray, Tpg: jnp.ndarray,
                   dt=None) -> jnp.ndarray:
        """Grid-shaped residual (*grid) -> (*grid): the sharded-step entry
        point (parallel/grid_shard.py) — no reshapes across the grid."""
        dt = self.op.dt if dt is None else dt
        if not self.has_bc:
            return self._base_residual_g(Tg, Tpg, dt)
        T_eff = jnp.where(self.bc_mask_g, self.bc_values_g, Tg)
        r = self._base_residual_g(T_eff, Tpg, dt)
        return jnp.where(self.bc_mask_g, Tg - self.bc_values_g, r)

    def _base_residual_g(self, Tg, Tpg, dt):
        p = self.params
        # M (T - Tp) + dt (alpha K) T - dt f M 1, arranged for f32 health:
        # the mass acts on the small per-step difference, and the
        # stiffness in difference form (see matvec_diff) so constants are
        # annihilated exactly — no ~800 K cancellation, no row-sum bias.
        # (The constant-row pair keeps the annihilation: at absent-
        # neighbor slots crow + drow sums to exact fp zero.)
        if self.const_ok:
            rg = (self._crow_conv(self.crow_mass, self.crow_dmass,
                                  Tg - Tpg)
                  + dt * self._crow_conv(self.crow_stiff, self.crow_dstiff,
                                         Tg, diff=True)
                  - dt * p.f * self.M1g)
        else:
            rg = (self.matvec_vals(self.vals_mass, Tg - Tpg)
                  + dt * self.matvec_diff(self.vals_stiff, Tg)
                  - dt * p.f * self.M1g)
        for fc, cols in zip(self.faces, self._face_cols):
            phi = fc.phi[:, cols]                          # (q, lc)
            corners = self._face_corners(Tg, fc, cols)     # (..., lc)
            Tb = jnp.einsum("...l,ql->...q", corners, phi)
            gflux = p.boundary_scale * (
                (p.sigma * p.epsilon) * (Tb**4 - p.T_ambient**4)
                + p.htc * (Tb - p.T_ambient))
            contrib = jnp.einsum("...q,q,ql->...l", gflux, dt * fc.qw, phi)
            for j, l in enumerate(cols):
                rg = rg.at[self._corner_slices(fc, l)].add(contrib[..., j])
        return rg

    # ------------------------------------------------------------------
    def jacobian_diag(self, T: jnp.ndarray, dt=None) -> jnp.ndarray:
        assert self.pad0 == 0, "flat API unavailable on a padded grid"
        return self.jacobian_diag_g(T.reshape(self.grid), dt).reshape(-1)

    def jacobian_diag_g(self, Tg: jnp.ndarray, dt=None) -> jnp.ndarray:
        p = self.params
        dt = self.op.dt if dt is None else dt
        center = (3 ** self.d - 1) // 2
        if self.const_ok:
            gx = self.st.grid[0]
            row = self.crow_mass[center] + dt * self.crow_stiff[center]
            br = self.crow_dmass[center] + dt * self.crow_dstiff[center]
            d2 = jnp.tile(row[None, :], (gx, 1))
            d2 = jnp.concatenate([br[0:1], d2[1:gx - 1], br[1:2]], axis=0)
            d = d2.reshape(self.grid)
        else:
            d = (self.vals_mass[center] + dt * self.vals_stiff[center])
        for fc, cols in zip(self.faces, self._face_cols):
            phi = fc.phi[:, cols]
            corners = self._face_corners(Tg, fc, cols)
            Tb = jnp.einsum("...l,ql->...q", corners, phi)
            dflux = p.boundary_scale * (
                4.0 * p.sigma * p.epsilon * Tb**3 + p.htc)
            contrib = jnp.einsum("...q,q,ql->...l", dflux, dt * fc.qw,
                                 phi * phi)
            for j, l in enumerate(cols):
                d = d.at[self._corner_slices(fc, l)].add(contrib[..., j])
        if self.has_bc:
            d = jnp.where(self.bc_mask_g, 1.0, d)
        return d

    # ------------------------------------------------------------------
    def stencil_values(self, T: jnp.ndarray, dt) -> jnp.ndarray:
        assert self.pad0 == 0, "flat API unavailable on a padded grid"
        return self.stencil_values_g(T.reshape(self.grid), dt)

    def stencil_values_g(self, Tg: jnp.ndarray, dt) -> jnp.ndarray:
        """J(T) stencil values with the boundary linearization added by
        static-slice writes (no scatter).

        Form notes (measured at 1M dofs, r4): this bake costs ~3.5 ms of
        slice updates on the (n_off, *grid) table; two alternatives
        measured WORSE in the full step — per-apply face-flux blocks
        (slice updates inside the CG while_loop: 90 vs 40 ms/step) and
        per-axis edge-block concatenation (XLA copies: precond build
        11.2 -> 33.3 ms). The bake amortizes via the once-per-step
        operator build (SolverConfig.jac_lag)."""
        p = self.params
        if self.vals_mass is None:
            raise RuntimeError(
                "value tables skipped (lazy_tables) — construct with "
                "lazy_tables=False for table-based consumers")
        vals = self.vals_mass + dt * self.vals_stiff       # (n_off, *grid)
        for fc, cols in zip(self.faces, self._face_cols):
            phi = fc.phi[:, cols]
            corners = self._face_corners(Tg, fc, cols)
            Tb = jnp.einsum("...l,ql->...q", corners, phi)
            w = (p.boundary_scale
                 * (4.0 * p.sigma * p.epsilon * Tb**3 + p.htc)
                 * (dt * fc.qw))                           # (..., q)
            for jl, l in enumerate(cols):
                sl = self._corner_slices(fc, l)
                for jm, m in enumerate(cols):
                    blk = jnp.einsum("...q,q,q->...", w, phi[:, jl],
                                     phi[:, jm])
                    o = self._pair_off[l][m]
                    vals = vals.at[(o,) + sl].add(blk)
        return vals

    def _mv_flat(self, vals, stream_dtype=None):
        """Flat-vector matvec apply from materialized values. Default is
        the 2D-flattened XLA form (HBM roofline at 1M dofs, BENCH.md);
        use_pallas selects the hand-tiled kernel (faster at sub-300k-dof
        meshes where in-register rotates are cheap). `stream_dtype`
        (e.g. bfloat16) down-casts the value TABLES only — the x vector
        and the f32 accumulator keep the operator dtype, so the apply
        reads half the HBM bytes at ~3 significant digits of operator
        accuracy (preconditioner-grade; the MG V-cycle's fine-level
        tables are the dominant traffic of the 1M-dof step)."""
        # Mosaic compiles f32 only — an f64 operator (e.g. --use-pallas
        # with dtype=float64) falls back to the XLA pad+slice form
        if self.use_pallas and self.d >= 2 and self.dtype == jnp.float32:
            from fem_glass_tempering_tpu.ops.pallas_stencil import (
                stencil_matvec_pallas,
            )
            return lambda v: stencil_matvec_pallas(vals, v, self.grid)
        if self.d > 1 and not self.pad0:
            vals2 = vals.reshape(vals.shape[0], self.grid[0], -1)
            if stream_dtype is not None:
                vals2 = vals2.astype(stream_dtype)
            return lambda v: self.st.matvec_flat(vals2, v)
        if stream_dtype is not None:
            vals = vals.astype(stream_dtype)
        return lambda v: self.matvec_vals(
            vals, v.reshape(self.grid)).reshape(-1)

    def make_matvec(self, T: jnp.ndarray, dt, stream_dtype=None):
        assert self.pad0 == 0, "flat API unavailable on a padded grid"
        use_pallas = (self.use_pallas and self.d >= 2
                      and self.dtype == jnp.float32)
        if self.const_ok and not use_pallas and stream_dtype is None:
            # constant-row form: no value table materializes; the flux
            # linearization at the frozen T rides as face-local blocks
            rowvals = self.crow_mass + dt * self.crow_stiff
            drow = self.crow_dmass + dt * self.crow_dstiff
            WW = self._flux_lin_tables(T.reshape(self.grid), dt)

            def mv(v):
                yg = self._crow_conv(rowvals, drow, v)
                if WW:
                    yg = self._apply_flux_lin(WW, v.reshape(self.grid), yg)
                return yg.reshape(-1)
        else:
            vals = self.stencil_values(T, dt)
            mv = self._mv_flat(vals, stream_dtype=stream_dtype)
        if self.has_bc:
            mask = self.bc_mask
            return lambda v: jnp.where(
                mask, v, mv(jnp.where(mask, 0.0, v)))
        return mv

    def make_matvec_g(self, Tg: jnp.ndarray, dt):
        """Grid-shaped Jacobian action for the sharded step. Baked value
        tables: a per-apply face-flux form was measured 3x slower in the
        full 1M step (slice updates inside the CG while_loop, profile r4)
        — the bake amortizes over the step via the once-per-step operator
        build (models/problem.py pc_lag)."""
        vals = self.stencil_values_g(Tg, dt)
        if self.has_bc:
            mask = self.bc_mask_g
            return lambda v: jnp.where(
                mask, v, self.matvec_vals(vals, jnp.where(mask, 0.0, v)))
        return lambda v: self.matvec_vals(vals, v)
