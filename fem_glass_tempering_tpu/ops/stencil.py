"""Stencil matvec for CG-1 on structured box meshes: the TPU-native SpMV.

Measured on TPU v5e (see BENCH.md): an ELL gather x[cols] of (9801, 27)
costs ~1.9 ms — two orders of magnitude over the CG-loop floor (~120 us),
because XLA lowers irregular gathers poorly on TPU. On a structured grid
the Jacobian is a (3^d)-point stencil, so the matvec needs NO gather at
all: J x = sum_o vals[o] * shift(x, o) with static pad+slice shifts —
pure VPU streaming.

Construction: reuse EllMatrix's assembled values; map each (row, col) pair
to its lattice offset and lay values out as (3^d, *grid). The constant
mass/stiffness parts are laid out once at setup (numpy); the per-Newton
boundary linearization is scattered into a small precomputed index set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fem_glass_tempering_tpu.ops.heat import HeatOperator


class StencilMatrix:
    def __init__(self, op: HeatOperator, make_tables: bool = True):
        fs = op.fs
        mesh = fs.mesh
        if mesh.structured is None or fs.family != "CG" or fs.degree != 1:
            raise ValueError("StencilMatrix needs a structured box mesh "
                             "with a CG-1 space")
        self.op = op
        dims = tuple(mesh.structured["dims"])
        d = len(dims)
        self.grid = tuple(n + 1 for n in dims)
        n = fs.n_scalar_dofs
        assert int(np.prod(self.grid)) == n

        # lattice offsets, lexicographic: index o = sum((delta_i+1)*3^pos)
        self.offsets = [off for off in np.ndindex(*([3] * d))]
        self.n_off = 3 ** d
        strides = np.array([int(np.prod(self.grid[i + 1:])) for i in range(d)])

        def multi(idx):
            out = []
            for s in strides:
                out.append(idx // s)
                idx = idx % s
            return np.stack(out, axis=-1)

        def offset_flat(rows, cols):
            """(row, col) dof pairs -> flat index o*n + row into the
            (n_off, n) stencil layout (all pairs of a box-mesh cell are
            lattice neighbors, so no dump slot is needed)."""
            delta = multi(cols.astype(np.int64)) - multi(rows.astype(np.int64)) + 1
            assert delta.min() >= 0 and delta.max() <= 2
            o = np.zeros(rows.shape, dtype=np.int64)
            for i in range(d):
                o = o * 3 + delta[..., i]
            return o * n + rows

        # single-cell element matrices from the operator's NUMPY sources
        # (np.asarray on device arrays is a host readback that can stall
        # through a remote-TPU tunnel)
        qw = op.np_qw
        phi = op.np_phi
        gphi = op.np_gphi
        assert op.uniform and qw.ndim == 1
        mass1 = op.c_mass * np.einsum("q,ql,qm->lm", qw, phi, phi)
        stiff1 = op.c_diff * np.einsum("q,qlg,qmg->lm", qw, gphi, gphi)
        nloc = mass1.shape[0]
        # slice accumulation: corner l of every cell covers the node-grid
        # window [loff_i, loff_i + nc_i) per axis — each (l, m) pair adds
        # ONE constant into one offset plane over that window. O(nloc^2)
        # vectorized adds instead of a 64M-entry scatter (which costs
        # ~a minute at 1M dofs even via bincount).
        loffs = [tuple((l >> i) & 1 for i in range(d)) for l in range(nloc)]
        vals_mass = np.zeros((self.n_off,) + self.grid)
        vals_stiff = np.zeros((self.n_off,) + self.grid)
        for l in range(nloc):
            sl = tuple(slice(loffs[l][i], loffs[l][i] + dims[i])
                       for i in range(d))
            for m in range(nloc):
                o = 0
                for i in range(d):
                    o = o * 3 + (loffs[m][i] - loffs[l][i] + 1)
                vals_mass[(o,) + sl] += mass1[l, m]
                vals_stiff[(o,) + sl] += stiff1[l, m]
        vals_mass = vals_mass.reshape(-1)
        vals_stiff = vals_stiff.reshape(-1)
        self.np_mass = vals_mass.reshape((self.n_off,) + self.grid)
        self.np_stiff = vals_stiff.reshape((self.n_off,) + self.grid)
        # device tables are optional: a GridHeatOperator whose constant-
        # row form covers every consumer skips them entirely (at 1M dofs
        # they are 2 x 115 MB of HBM + setup upload through the tunnel)
        self.st_mass = self.st_stiff = None
        if make_tables:
            self.ensure_tables()

        # host-side Gershgorin row statistics (numpy, kept for smoother
        # spectrum bounds at setup — solver/multigrid.py freeze_omegas):
        # abs row sums and diagonals of mass/stiffness, plus the boundary
        # linearization at T_0
        vm = vals_mass.reshape(self.n_off, n)
        vs = vals_stiff.reshape(self.n_off, n)
        center = (self.n_off - 1) // 2
        p = op.params
        b_abs = np.zeros(n)
        b_diag = np.zeros(n)
        bdm = op.np_b_dofmap.astype(np.int64)
        if len(bdm):
            dflux0 = p.boundary_scale * (
                4.0 * p.sigma * p.epsilon * p.T_0**3 + p.htc)
            blocks = dflux0 * np.einsum(
                "fq,fql,fqm->flm", op.np_b_qw, op.np_b_phi, op.np_b_phi)
            b_abs = np.bincount(bdm.reshape(-1),
                                weights=np.abs(blocks).sum(axis=2).reshape(-1),
                                minlength=n)
            b_diag = np.bincount(bdm.reshape(-1),
                                 weights=np.einsum("fll->fl", blocks).reshape(-1),
                                 minlength=n)
        self.gersh = {
            "mass_abs": np.abs(vm).sum(axis=0), "mass_diag": vm[center].copy(),
            "stiff_abs": np.abs(vs).sum(axis=0), "stiff_diag": vs[center].copy(),
            "b_abs": b_abs, "b_diag": b_diag,
        }

        # boundary-block scatter positions into the stencil layout
        b_dofmap = op.np_b_dofmap.astype(np.int64)
        if len(b_dofmap):
            nb = b_dofmap.shape[1]
            b_rows = np.broadcast_to(b_dofmap[:, :, None],
                                     b_dofmap.shape[:1] + (nb, nb))
            b_cols = np.broadcast_to(b_dofmap[:, None, :],
                                     b_dofmap.shape[:1] + (nb, nb))
            self.b_st_idx = jnp.asarray(
                offset_flat(b_rows.reshape(-1), b_cols.reshape(-1)))
        else:
            self.b_st_idx = None
        self.n = n
        self.d = d

    def ensure_tables(self) -> None:
        """Materialize the (n_off, *grid) device tables (idempotent)."""
        if self.st_mass is None:
            self.st_mass = jnp.asarray(self.np_mass, dtype=self.op.dtype)
            self.st_stiff = jnp.asarray(self.np_stiff, dtype=self.op.dtype)

    # ------------------------------------------------------------------
    def values_at(self, T: jnp.ndarray, dt) -> jnp.ndarray:
        op = self.op
        p = op.params
        if self.st_mass is None:
            raise RuntimeError(
                "device tables not materialized — call ensure_tables()")
        vals = self.st_mass + dt * self.st_stiff
        if self.b_st_idx is not None:
            Tb = jnp.einsum("fql,fl->fq", op.b_phi, T[op.b_dofmap])
            dflux = p.boundary_scale * (4.0 * p.sigma * p.epsilon * Tb**3 + p.htc)
            blocks = jnp.einsum("fq,fql,fqm->flm", op.b_qw * dt * dflux,
                                op.b_phi, op.b_phi)
            vals = vals.reshape(-1).at[self.b_st_idx].add(
                blocks.reshape(-1)).reshape(vals.shape)
        return vals

    def np_dense(self, T0: float, dt: float) -> np.ndarray:
        """Dense (n, n) Jacobian at the uniform temperature T0, assembled
        entirely on the HOST from the numpy stencil sources — for the
        frozen direct coarse solve of the MG hierarchy
        (solver/multigrid.py coarse='dense'). Mirrors values_at(T0, dt)
        exactly: mass + dt*stiffness + the boundary (radiation +
        convection) linearization, then Dirichlet identity rows matching
        the masked matvec."""
        op = self.op
        n, d = self.n, self.d
        grid = self.grid
        vals = (self.np_mass + dt * self.np_stiff)
        A = np.zeros((n, n))
        idx = np.arange(n).reshape(grid)
        for o, off in enumerate(self.offsets):
            delta = [int(v) - 1 for v in off]
            rows_sl = tuple(slice(max(0, -dl), g - max(0, dl))
                            for dl, g in zip(delta, grid))
            cols_sl = tuple(slice(max(0, dl), g - max(0, -dl))
                            for dl, g in zip(delta, grid))
            A[idx[rows_sl].ravel(), idx[cols_sl].ravel()] = \
                vals[o][rows_sl].ravel()
        bdm = op.np_b_dofmap.astype(np.int64)
        if len(bdm):
            p = op.params
            dflux0 = p.boundary_scale * (
                4.0 * p.sigma * p.epsilon * float(T0) ** 3 + p.htc)
            blocks = np.einsum("fq,fql,fqm->flm", op.np_b_qw * (dt * dflux0),
                               op.np_b_phi, op.np_b_phi)
            np.add.at(A, (np.broadcast_to(bdm[:, :, None], blocks.shape),
                          np.broadcast_to(bdm[:, None, :], blocks.shape)),
                      blocks)
        if op.has_bc:
            mask = op.np_bc_mask
            A[mask, :] = 0.0
            A[:, mask] = 0.0
            A[np.ix_(mask, mask)] = np.eye(int(mask.sum()))
        return A

    def matvec_g(self, vals: jnp.ndarray, xg: jnp.ndarray) -> jnp.ndarray:
        """Grid-shaped matvec: (n_off, *grid) values x (*grid) -> (*grid).
        Pure static pad+slice shifts — under a sharded node grid XLA
        partitions these as local work + halo collective-permutes."""
        xp = jnp.pad(xg, 1)
        acc = jnp.zeros(self.grid, dtype=xg.dtype)
        for o, off in enumerate(self.offsets):
            start = tuple(int(v) for v in off)
            limit = tuple(s + g for s, g in zip(start, self.grid))
            acc = acc + vals[o] * jax.lax.slice(xp, start, limit)
        return acc

    def matvec(self, vals: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        return self.matvec_g(vals, x.reshape(self.grid)).reshape(-1)

    # -- 2D-flattened apply: the production CG-loop form ----------------
    # The minor grid dims merge into one wide axis (gx, gy*gz): every
    # lattice offset becomes a row shift plus a FLAT column shift, and
    # wrapped entries at y/z edges are annihilated by the assembled
    # zeros at absent-neighbor slots. This keeps the lane dimension wide
    # (measured at 1M dofs on v5e: 0.14 ms/matvec = HBM roofline, vs
    # 0.52 ms for the 3D layout whose 41-wide minor dim pads to 128).
    def _flat_shifts(self):
        out = []
        for off in np.ndindex(*([3] * self.d)):
            dx = int(off[0])
            sft = 0
            for a in range(1, self.d):
                sft = sft * self.grid[a] + (int(off[a]) - 1)
            out.append((dx, sft))
        return out

    def matvec_flat(self, vals2: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """vals2: (n_off, gx, M) with M = prod(grid[1:]); x flat (n,)."""
        gx = self.grid[0]
        M = vals2.shape[-1]
        shifts = self._flat_shifts()
        P = max(abs(sft) for _, sft in shifts) if self.d > 1 else 1
        x2 = x.reshape(gx, M)
        xp = jnp.pad(x2, ((1, 1), (P, P)))
        acc = jnp.zeros((gx, M), dtype=x.dtype)
        for o, (dx, sft) in enumerate(shifts):
            acc = acc + vals2[o] * jax.lax.slice(
                xp, (dx, P + sft), (dx + gx, P + sft + M))
        return acc.reshape(-1)

    def make_matvec(self, T: jnp.ndarray, dt):
        vals = self.values_at(T, dt)
        if self.d > 1:
            vals2 = vals.reshape(self.n_off, self.grid[0], -1)
            mv = lambda v: self.matvec_flat(vals2, v)
        else:
            mv = lambda v: self.matvec(vals, v)
        if self.op.has_bc:
            mask = self.op.bc_mask
            return lambda v: jnp.where(mask, v, mv(jnp.where(mask, 0.0, v)))
        return mv


class DGStencilMatrix:
    """Gather-free SIPG-DG Jacobian matvec on structured box meshes.

    The reference's *default* temperature element is DG-1
    (/root/reference/main.py:25) with the SIPG interior-penalty form
    (/root/reference/ThermoViscoProblem.py:308-326). DG dofs are
    cell-contiguous (dof = cell*nloc + l), and on a box mesh every
    interior facet connects lattice-neighbor cells, so the Jacobian is a
    cell-lattice block stencil:

        (J x)_c = A_c x_c + dt * sum_a [ B+_a x_{c+e_a} + B-_a x_{c-e_a} ]

    - A_c (self block): consistent mass + dt*(stiffness + SIPG self terms)
      + the per-Newton boundary (radiation/convection) linearization —
      stored dense per cell, (n_cells, nloc, nloc), streamed from HBM.
    - B±_a (cross blocks): pure SIPG facet coupling. On a uniform box mesh
      every facet of a given orientation has identical geometry, so each
      direction's block is ONE constant (nloc, nloc) matrix; the neighbor
      contribution is a shifted-grid matmul x_shift @ B.T — MXU/VPU
      streaming with no gather. (Falls back to per-cell cross blocks if a
      mesh ever violates translation invariance.)

    The matvec therefore needs NO gather at all: neighbor access is static
    pad+slice on the (ncx, ncy, ncz, nloc) cell grid, exactly like the
    CG-1 StencilMatrix above but at cell granularity with block values.
    """

    def __init__(self, op: HeatOperator, allow_const: bool = True):
        fs = op.fs
        mesh = fs.mesh
        if mesh.structured is None or fs.family != "DG":
            raise ValueError("DGStencilMatrix needs a structured box mesh "
                             "with a DG space")
        self.op = op
        dims = tuple(mesh.structured["dims"])
        d = len(dims)
        self.cell_dims = dims
        nloc = fs.element.nloc
        C = mesh.n_cells
        assert int(np.prod(dims)) == C
        assert fs.n_scalar_dofs == C * nloc
        self.nloc, self.C, self.d = nloc, C, d
        p = op.params

        qw = op.np_qw
        phi = op.np_phi
        gphi = op.np_gphi
        if qw.ndim == 1:       # uniform-mesh compact tables
            m1 = op.c_mass * np.einsum("q,ql,qm->lm", qw, phi, phi)
            s1 = op.c_diff * np.einsum("q,qlg,qmg->lm", qw, gphi, gphi)
            self_mass = np.broadcast_to(m1, (C,) + m1.shape).copy()
            self_stiff = np.broadcast_to(s1, (C,) + s1.shape).copy()
        else:
            self_mass = op.c_mass * np.einsum("cq,ql,qm->clm", qw, phi, phi)
            self_stiff = op.c_diff * np.einsum("cq,cqlg,cqmg->clm",
                                               qw, gphi, gphi)

        # ---- SIPG facet blocks (same formulas as EllMatrix / the residual) ----
        coef = op.c_diff * op.np_i["qw"]                  # (f, q)
        php = op.np_i["phi_p"]
        phm = op.np_i["phi_m"]
        dnp_ = op.np_i["dnphi_p"]
        dnm = op.np_i["dnphi_m"]
        penh = (p.dg_penalty / op.np_i["h_p"])[:, None]
        Jpp = (np.einsum("fq,fql,fqm->flm", coef * penh, php, php)
               - 0.5 * np.einsum("fq,fql,fqm->flm", coef, dnp_, php)
               - 0.5 * np.einsum("fq,fql,fqm->flm", coef, php, dnp_))
        Jpm = (-np.einsum("fq,fql,fqm->flm", coef * penh, php, phm)
               + 0.5 * np.einsum("fq,fql,fqm->flm", coef, dnp_, phm)
               - 0.5 * np.einsum("fq,fql,fqm->flm", coef, php, dnm))
        Jmp = (-np.einsum("fq,fql,fqm->flm", coef * penh, phm, php)
               - 0.5 * np.einsum("fq,fql,fqm->flm", coef, dnm, php)
               + 0.5 * np.einsum("fq,fql,fqm->flm", coef, phm, dnp_))
        Jmm = (np.einsum("fq,fql,fqm->flm", coef * penh, phm, phm)
               + 0.5 * np.einsum("fq,fql,fqm->flm", coef, dnm, phm)
               + 0.5 * np.einsum("fq,fql,fqm->flm", coef, phm, dnm))

        # cell-contiguous dofmap -> facet cell ids and lattice directions
        cell_p = op.np_i["dofmap_p"][:, 0] // nloc
        cell_m = op.np_i["dofmap_m"][:, 0] // nloc
        base = np.arange(nloc * nloc)
        flat_p = (cell_p[:, None] * (nloc * nloc) + base).reshape(-1)
        flat_m = (cell_m[:, None] * (nloc * nloc) + base).reshape(-1)
        self_stiff = (self_stiff.reshape(-1)
                      + np.bincount(flat_p, weights=Jpp.reshape(-1),
                                    minlength=C * nloc * nloc)
                      + np.bincount(flat_m, weights=Jmm.reshape(-1),
                                    minlength=C * nloc * nloc)
                      ).reshape(C, nloc, nloc)

        strides = np.array([int(np.prod(dims[i + 1:])) for i in range(d)])

        def multi(idx):
            out = []
            for s in strides:
                out.append(idx // s)
                idx = idx % s
            return np.stack(out, axis=-1)

        delta = multi(cell_m.astype(np.int64)) - multi(cell_p.astype(np.int64))
        assert np.all(np.abs(delta).sum(axis=-1) == 1), \
            "interior facet connects non-lattice-neighbor cells"
        axis_of = np.argmax(np.abs(delta), axis=-1)       # (f,)
        assert np.all(delta[np.arange(len(delta)), axis_of] == 1), \
            "'+' cell must be the lower lattice index"

        # per-axis cross blocks; constant on a uniform grid
        self.cross_const = True
        Bp, Bm = [], []                      # Bp[a]: x_{c+e_a} block (rows c)
        self._Bp_cells = self._Bm_cells = None
        for a in range(d):
            sel = axis_of == a
            if not sel.any():                # degenerate axis (dims[a] == 1)
                Bp.append(np.zeros((nloc, nloc)))
                Bm.append(np.zeros((nloc, nloc)))
                continue
            jp, jm = Jpm[sel], Jmp[sel]
            scale = max(np.abs(jp).max(), 1e-30)
            if (np.abs(jp - jp[0]).max() > 1e-10 * scale
                    or np.abs(jm - jm[0]).max() > 1e-10 * scale):
                self.cross_const = False
            Bp.append(jp[0])
            Bm.append(jm[0])
        if self.cross_const:
            self.Bp = [jnp.asarray(b, dtype=op.dtype) for b in Bp]
            self.Bm = [jnp.asarray(b, dtype=op.dtype) for b in Bm]
        else:
            # per-cell cross blocks, zero where no neighbor exists
            Bp_cells = np.zeros((d, C, nloc, nloc))
            Bm_cells = np.zeros((d, C, nloc, nloc))
            for a in range(d):
                sel = axis_of == a
                Bp_cells[a, cell_p[sel]] = Jpm[sel]
                Bm_cells[a, cell_m[sel]] = Jmp[sel]
            self.Bp_cells = jnp.asarray(Bp_cells, dtype=op.dtype)
            self.Bm_cells = jnp.asarray(Bm_cells, dtype=op.dtype)

        # ---- constant-block decomposition (uniform-box fast form) ------
        # The DG analog of GridHeatOperator's constant-row form: on a
        # uniform box every cell's self block is
        #   A_c = m1 + dt*( s1 + sum_a [1(c_a<n_a-1) Jpp_a + 1(c_a>0) Jmm_a] )
        # with Jpp_a/Jmm_a identical across all facets of axis a, so the
        # (C, nloc, nloc) tables collapse to ONE (nloc, nloc) interior
        # block plus per-axis corrections on the two boundary cell layers.
        # The Jacobian matvec then streams only x and y (the self-block
        # einsum's (C,64) table reads — the dominant HBM traffic of the
        # DG CG loop — never happen), and the T-dependent boundary-flux
        # linearization rides as facet-local blocks instead of a
        # (C,nloc,nloc) per-Newton materialization.
        self.self_const = False
        self.A_mass = self.A_stiff = None
        self.corr_pp = self.corr_mm = None
        if allow_const and qw.ndim == 1 and self.cross_const:
            ok = True
            Cpp, Cmm = [], []
            for a in range(d):
                sel = axis_of == a
                if not sel.any():
                    Cpp.append(np.zeros((nloc, nloc)))
                    Cmm.append(np.zeros((nloc, nloc)))
                    continue
                jpp, jmm = Jpp[sel], Jmm[sel]
                scale = max(np.abs(jpp).max(), 1e-30)
                if (np.abs(jpp - jpp[0]).max() > 1e-10 * scale
                        or np.abs(jmm - jmm[0]).max() > 1e-10 * scale):
                    ok = False
                    break
                Cpp.append(jpp[0])
                Cmm.append(jmm[0])
            if ok:
                base = s1 + sum(Cpp) + sum(Cmm)   # interior-cell stiffness
                g = lambda arr: jnp.asarray(arr, dtype=op.dtype)
                self.A_mass = g(m1)
                self.A_stiff = g(base)
                self.corr_pp = [g(c) for c in Cpp]
                self.corr_mm = [g(c) for c in Cmm]
                self.self_const = True

        # numpy copies retained for host-side setup (smoother freezing —
        # eager device ops at setup are tunnel round trips)
        self.np_self_mass = self_mass
        self.np_self_stiff = self_stiff
        self.np_Bp = [np.asarray(b) for b in Bp]
        self.np_Bm = [np.asarray(b) for b in Bm]
        # source row integral per cell dof: ∫ φ_l = Σ_q qw φ_l (the f term
        # of the residual, HeatOperator._base_residual mass_src)
        if qw.ndim == 1:
            f1_row = np.einsum("q,ql->l", qw, phi)
            self.f1_row = jnp.asarray(f1_row, dtype=op.dtype)  # (nloc,)
            if self.self_const:
                # const form consumers broadcast the single row — never
                # materialize the (C, nloc) table (65 MB at 1M cells f64)
                self.f1 = None
            else:
                self.f1 = jnp.asarray(
                    np.broadcast_to(f1_row, (C, nloc)).copy(),
                    dtype=op.dtype)
        else:
            self.f1_row = None
            self.f1 = jnp.asarray(np.einsum("cq,ql->cl", qw, phi),
                                  dtype=op.dtype)
        # device tables are skipped when the constant-block form covers
        # every consumer (values_at reconstructs them in-graph when a
        # block/column smoother needs the full array): at 1M cells they
        # are 2 x (C,8,8) = hundreds of MB of HBM + setup upload
        self.self_mass = self.self_stiff = None
        if not self.self_const:
            self.self_mass = jnp.asarray(self_mass, dtype=op.dtype)
            self.self_stiff = jnp.asarray(self_stiff, dtype=op.dtype)
        # boundary (exterior facet) cells for the per-Newton radiation blocks
        b_dofmap = op.np_b_dofmap
        self.b_cell = (jnp.asarray(b_dofmap[:, 0] // nloc, dtype=jnp.int32)
                       if len(b_dofmap) else None)
        self.n = fs.n_scalar_dofs

    # ------------------------------------------------------------------
    # constant-block helpers (self_const fast form)
    def _bflux_blocks(self, T: jnp.ndarray, dt) -> jnp.ndarray:
        """Per-boundary-facet (f, nloc, nloc) linearized radiation +
        convection blocks at the frozen T — the facet-local form of what
        values_at scatters into the full (C, nloc, nloc) table."""
        op = self.op
        p = op.params
        Tb = jnp.einsum("fql,fl->fq", op.b_phi, T[op.b_dofmap])
        dflux = p.boundary_scale * (4.0 * p.sigma * p.epsilon * Tb**3
                                    + p.htc)
        return jnp.einsum("fq,fql,fqm->flm", op.b_qw * dt * dflux,
                          op.b_phi, op.b_phi)

    def _layer_corrections(self, dt):
        """(axis, cell-layer, block) triples: subtract dt*Jpp_a on the
        last layer of axis a (no +a facet) and dt*Jmm_a on the first
        (no -a facet)."""
        out = []
        for a in range(self.d):
            n_a = self.cell_dims[a]
            out.append((a, n_a - 1, dt * self.corr_pp[a]))
            out.append((a, 0, dt * self.corr_mm[a]))
        return out

    def _self_const_mv(self, A0: jnp.ndarray, cscale, xg: jnp.ndarray):
        """y_c = A_c x_c from the constant-block decomposition: one
        (C,nloc)@(nloc,nloc) matmul with the interior block A0, then the
        2d boundary cell layers corrected by static slice updates.
        `cscale` scales the stiffness-only corrections (dt for the
        Jacobian, 1 for the residual's unscaled stiffness apply).
        xg: (*cell_dims, nloc); returns the same shape."""
        y = xg @ A0.T
        for a, layer, Jc in self._layer_corrections(cscale):
            seg = jax.lax.slice_in_dim(xg, layer, layer + 1, axis=a)
            upd = (jax.lax.slice_in_dim(y, layer, layer + 1, axis=a)
                   - seg @ Jc.T)
            y = jax.lax.dynamic_update_slice_in_dim(y, upd, layer, axis=a)
        return y

    def values_at(self, T: jnp.ndarray, dt) -> jnp.ndarray:
        """Self blocks A_c(T) = mass + dt*(stiff+SIPG_self) + dt*B'(T).
        With the constant-block form the (C, nloc, nloc) array is
        reconstructed in-graph (broadcast + layer slice updates) for
        consumers that factorize per-cell blocks (DGMultigrid
        block/column smoothers) — no static device table exists."""
        op = self.op
        p = op.params
        nloc = self.nloc
        if self.self_const:
            A0 = self.A_mass + dt * self.A_stiff
            vals = jnp.broadcast_to(
                A0, self.cell_dims + (nloc, nloc)).astype(op.dtype)
            for a, layer, Jc in self._layer_corrections(dt):
                upd = (jax.lax.slice_in_dim(vals, layer, layer + 1, axis=a)
                       - Jc)
                vals = jax.lax.dynamic_update_slice_in_dim(
                    vals, upd, layer, axis=a)
            vals = vals.reshape(self.C, nloc, nloc)
        else:
            vals = self.self_mass + dt * self.self_stiff
        if self.b_cell is not None:
            vals = vals.at[self.b_cell].add(self._bflux_blocks(T, dt))
        return vals

    def _shift(self, xg, axis, sign):
        """Neighbor-cell values: x_{c + sign*e_a} with zero past the edge."""
        pad = [(0, 0)] * xg.ndim
        if sign > 0:
            pad[axis] = (0, 1)
            xp = jnp.pad(xg, pad)
            return jax.lax.slice_in_dim(xp, 1, xp.shape[axis], axis=axis)
        pad[axis] = (1, 0)
        xp = jnp.pad(xg, pad)
        return jax.lax.slice_in_dim(xp, 0, xp.shape[axis] - 1, axis=axis)

    def _cross_apply(self, y, xg, dt):
        """Add the facet cross-block terms dt*(B+_a x_{c+e_a} + B-_a
        x_{c-e_a}) to the grid-shaped y."""
        nloc = self.nloc
        for a in range(self.d):
            xp = self._shift(xg, a, +1)
            xm = self._shift(xg, a, -1)
            if self.cross_const:
                y = y + dt * (xp @ self.Bp[a].T) + dt * (xm @ self.Bm[a].T)
            else:
                y = y + dt * jnp.einsum(
                    "clm,cm->cl", self.Bp_cells[a],
                    xp.reshape(self.C, nloc)).reshape(xg.shape)
                y = y + dt * jnp.einsum(
                    "clm,cm->cl", self.Bm_cells[a],
                    xm.reshape(self.C, nloc)).reshape(xg.shape)
        return y

    def matvec(self, vals_self: jnp.ndarray, dt, x: jnp.ndarray) -> jnp.ndarray:
        nloc = self.nloc
        xg = x.reshape(self.cell_dims + (nloc,))
        xc = x.reshape(self.C, nloc)
        y = jnp.einsum("clm,cm->cl", vals_self, xc).reshape(xg.shape)
        return self._cross_apply(y, xg, dt).reshape(-1)

    def make_matvec(self, T: jnp.ndarray, dt):
        if self.self_const:
            # constant-block form: no (C, nloc, nloc) table materializes;
            # the boundary-flux linearization at the frozen T rides as
            # facet-local blocks over the O(surface) boundary facets
            A0 = self.A_mass + dt * self.A_stiff
            blocks = (self._bflux_blocks(T, dt)
                      if self.b_cell is not None else None)
            nloc = self.nloc

            def base_mv(v):
                xg = v.reshape(self.cell_dims + (nloc,))
                y = self._self_const_mv(A0, dt, xg)
                y = self._cross_apply(y, xg, dt)
                if blocks is not None:
                    xb = v.reshape(self.C, nloc)[self.b_cell]
                    # multiply+reduce, not dot_general (see DGMultigrid
                    # _bmv: tiny batched contractions compile
                    # pathologically on the TPU runtime)
                    yb = (blocks * xb[:, None, :]).sum(-1)
                    y = y.reshape(self.C, nloc).at[self.b_cell].add(yb)
                return y.reshape(-1)
            mv = base_mv
        else:
            vals = self.values_at(T, dt)
            mv = lambda v: self.matvec(vals, dt, v)
        if self.op.has_bc:
            mask = self.op.bc_mask
            return lambda v: jnp.where(
                mask, v, mv(jnp.where(mask, 0.0, v)))
        return mv

    # ------------------------------------------------------------------
    # Gather-free residual / diag: the OUTER Newton loop's per-iteration
    # work. Everything but the boundary flux is linear in T and already
    # encoded by the block stencil, so the residual is one stencil matvec
    # plus a boundary-layer term — replacing HeatOperator's full
    # facet-gather assembly (dofmap gathers + segment_sums over ~3C
    # facets), which dominates the DG step in emulated f64 on TPU.
    # Matches HeatOperator.residual to machine precision (tested).
    def _base_residual(self, T, T_prev, dt):
        op = self.op
        p = op.params
        nloc = self.nloc
        Tc = T.reshape(self.C, nloc)
        Tpc = T_prev.reshape(self.C, nloc)
        # mass acts on the per-step DIFFERENCE (small vs ~800 K values —
        # the same f32/emulated-f64 health trick as ops/grid.py)
        if self.self_const:
            r = (((Tc - Tpc) @ self.A_mass.T)
                 - (dt * p.f) * self.f1_row).reshape(-1)
        else:
            f1 = self.f1 if self.f1 is not None else self.f1_row
            r = ((self.self_mass * (Tc - Tpc)[:, None, :]).sum(-1)
                 - (dt * p.f) * f1).reshape(-1)
        # (K + SIPG) annihilates constant fields exactly, so apply it to
        # T - mean(T): the ~800 K constant part would otherwise leave a
        # row-sum cancellation bias (the ops/grid.py difference-form
        # rationale, done here with one scalar shift)
        if self.self_const:
            zg = (T - jnp.mean(T)).reshape(self.cell_dims + (nloc,))
            y = self._cross_apply(
                self._self_const_mv(self.A_stiff, 1.0, zg), zg, 1.0)
            r = r + dt * y.reshape(-1)
        else:
            r = r + dt * self.matvec(self.self_stiff, 1.0, T - jnp.mean(T))
        if self.b_cell is not None:
            Tb = jnp.einsum("fql,fl->fq", op.b_phi, T[op.b_dofmap])
            gflux = p.boundary_scale * (
                (p.sigma * p.epsilon) * (Tb**4 - p.T_ambient**4)
                + p.htc * (Tb - p.T_ambient))
            r_b = jnp.einsum("fq,fql->fl", op.b_qw * dt * gflux, op.b_phi)
            r = r.reshape(self.C, nloc).at[self.b_cell].add(
                r_b).reshape(-1)
        return r

    def residual(self, T: jnp.ndarray, T_prev: jnp.ndarray,
                 dt=None) -> jnp.ndarray:
        op = self.op
        dt = op.dt if dt is None else dt
        if not op.has_bc:
            return self._base_residual(T, T_prev, dt)
        T_eff = jnp.where(op.bc_mask, op.bc_values, T)
        r = self._base_residual(T_eff, T_prev, dt)
        return jnp.where(op.bc_mask, T - op.bc_values, r)

    def jacobian_diag(self, T: jnp.ndarray, dt=None) -> jnp.ndarray:
        op = self.op
        dt = op.dt if dt is None else dt
        nloc = self.nloc
        if self.self_const:
            drow = jnp.diagonal(self.A_mass + dt * self.A_stiff)  # (nloc,)
            dg = jnp.broadcast_to(
                drow, self.cell_dims + (nloc,)).astype(op.dtype)
            for a, layer, Jc in self._layer_corrections(dt):
                upd = (jax.lax.slice_in_dim(dg, layer, layer + 1, axis=a)
                       - jnp.diagonal(Jc))
                dg = jax.lax.dynamic_update_slice_in_dim(
                    dg, upd, layer, axis=a)
            d = dg.reshape(self.C, nloc)
            if self.b_cell is not None:
                db = jnp.einsum("fll->fl", self._bflux_blocks(T, dt))
                d = d.at[self.b_cell].add(db)
            d = d.reshape(-1)
        else:
            vals = self.values_at(T, dt)                 # (C, nloc, nloc)
            d = jnp.einsum("cll->cl", vals).reshape(-1)
        if op.has_bc:
            d = jnp.where(op.bc_mask, 1.0, d)
        return d


def make_stencil_operator(op: HeatOperator, allow_const: bool = True):
    """Factory: the gather-free stencil operator matching the operator's
    space — CG-1 nodal stencil or DG block stencil — on structured box
    meshes. Raises ValueError when neither applies."""
    if op.fs.family == "DG":
        return DGStencilMatrix(op, allow_const=allow_const)
    return StencilMatrix(op)
