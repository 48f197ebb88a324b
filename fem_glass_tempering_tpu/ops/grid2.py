"""Gather-free heat operator for CG-2 (Q2) on uniform box meshes.

The reference stack solves degree-configurable spaces as a matter of
course (/root/reference/ThermoViscoProblem.py:77-100 — PETSc assembles
any degree); BASELINE config #4 names 3D-at-high-order explicitly. The
gather paths (ELL SpMV, SA-AMG) are pathological for Q2 on TPU
(BENCH.md high-order rows: 4.8 s/step at 112k dofs), so this module
gives CG-2 the same lattice-native treatment ops/grid.py gave CG-1.

Key structure: on a uniform box the Q2 dof lattice IS the 2x-refined
CG-1 node lattice, L = (2*n0+1, ..., 2*nd-1+1) in C order, and the
assembled mass/stiffness matrices are Kronecker products of 1D assembled
5-band matrices:

    M3 = M1x (x) M1y (x) M1z
    K3 = K1x (x) M1y (x) M1z + M1x (x) K1y (x) M1z + M1x (x) M1y (x) K1z

(tensor-product basis + tensor quadrature + diagonal affine map). Every
operator apply is therefore a few SUM-FACTORIZED 1D banded passes — 5
static shifted slices per pass with per-plane weights, ~35N streamed
elements for the full Jacobian action instead of 125N for a materialized
125-offset table — and the whole solve is static pad/slice/elementwise
arithmetic on the lattice, exactly the shape XLA fuses and shards.

The nonlinear boundary flux (radiation + convection with the 0.001
scale, reference ThermoViscoProblem.py:293-306) is evaluated per box
face from the 9 face-local basis columns, scattered by strided static
slices (stride 2: cell i's local node l sits at lattice 2*i + off_l).

For the Krylov loop a materialized (5^d, *L) value table is also
available (`make_matvec(..., form='table')`), built in-graph from 1D
band outer products + face-flux blocks — the same bake-vs-recompute
trade ops/grid.py measured; both forms are exposed so the production
driver can keep the measured winner.

The matching preconditioner is `Q2MG`: Chebyshev-smoothed p-MG whose
coarse space is the embedded CG-1 lattice (even lattice points), with
transfers that are EXACTLY the Q1->Q2 nodal embedding (per-axis linear
interpolation = solver/multigrid.py's lattice transfers), so the
Galerkin coarse operator equals the rediscretized CG-1 operator, and the
coarse solve is one V-cycle of the production GridMG hierarchy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fem_glass_tempering_tpu.fem.elements import lagrange_element
from fem_glass_tempering_tpu.fem.quadrature import gauss_legendre_01
from fem_glass_tempering_tpu.ops.assembly import build_boundary_geometry
from fem_glass_tempering_tpu.ops.heat import HeatOperator


class _Face2:
    __slots__ = ("axis", "side", "qw", "phi", "np_qw", "np_phi", "cols")

    def __init__(self, axis, side, qw, phi):
        self.axis = axis
        self.side = side
        self.qw = qw          # (q,) facet weights * |detJ|
        self.phi = phi        # (q, nloc) cell basis on the facet


def _assemble_1d_bands(n_cells: int, h: float):
    """Assembled 1D Q2 mass/stiffness on n_cells uniform cells of size h,
    as (5, g) band arrays with band index b = column-row offset + 2 and
    g = 2*n_cells + 1 lattice points. Out-of-range couplings are exact
    zeros (the pad-slice matvec relies on that)."""
    e1 = lagrange_element("interval", 2)
    x, w = gauss_legendre_01(3)               # exact to degree 5 (>= phi*phi)
    phi = e1.tabulate(x.reshape(-1, 1))       # (q, 3)
    dphi = e1.tabulate_grad(x.reshape(-1, 1))[:, :, 0]
    m_el = h * np.einsum("q,ql,qm->lm", w, phi, phi)
    k_el = (1.0 / h) * np.einsum("q,ql,qm->lm", w, dphi, dphi)
    off1 = np.rint(e1.nodes[:, 0] * 2).astype(int)        # local -> lattice
    g = 2 * n_cells + 1
    M = np.zeros((5, g))
    K = np.zeros((5, g))
    for c in range(n_cells):
        base = 2 * c
        for l in range(3):
            row = base + off1[l]
            for m in range(3):
                delta = off1[m] - off1[l]
                M[delta + 2, row] += m_el[l, m]
                K[delta + 2, row] += k_el[l, m]
    return M, K


class GridHeatOperator2:
    """Drop-in replacement for HeatOperator.residual / jacobian_diag /
    make_matvec for CG-2 spaces on uniform box meshes with whole-boundary
    (or whole-face) radiation + convection flux."""

    def __init__(self, op: HeatOperator, flux_marker=None,
                 matvec_form: str = "kron"):
        fs = op.fs
        mesh = fs.mesh
        if mesh.structured is None or fs.family != "CG" or fs.degree != 2:
            raise ValueError("GridHeatOperator2 needs a structured box mesh "
                             "with a CG-2 space")
        if op.source_q is not None:
            raise ValueError("GridHeatOperator2 does not support MMS sources")
        if matvec_form not in ("kron", "table"):
            raise ValueError(matvec_form)
        self.op = op
        self.params = op.params
        self.dtype = op.dtype
        self.matvec_form = matvec_form
        self.dims = tuple(mesh.structured["dims"])
        self.d = d = len(self.dims)
        self.grid = tuple(2 * n + 1 for n in self.dims)
        self.n = fs.n_scalar_dofs
        assert int(np.prod(self.grid)) == self.n
        nloc = fs.element.nloc
        self.nloc = nloc

        # local node l <-> lattice offset (in {0,1,2}^d): reference axis i
        # maps to grid axis i, matching the CG-1 vertex-bit convention
        self.loffs = [tuple(int(v) for v in np.rint(fs.element.nodes[l] * 2))
                      for l in range(nloc)]
        # verify the geometric-dedup dofmap coincides with C-order lattice
        # numbering (fem/functionspace.py sorts quantized coords
        # lexicographically, which is exactly this layout on a box)
        strides = np.array([int(np.prod(self.grid[i + 1:]))
                            for i in range(d)])
        cidx = np.stack(np.meshgrid(*[np.arange(n) for n in self.dims],
                                    indexing="ij"), axis=-1).reshape(-1, d)
        loff_arr = np.array(self.loffs)                     # (nloc, d)
        expected = ((2 * cidx[:, None, :] + loff_arr[None, :, :])
                    @ strides).astype(np.int32)
        if not np.array_equal(expected, fs.dofmap):
            raise ValueError("CG-2 dofmap is not lattice-ordered")

        # 1D assembled band matrices per axis (numpy at setup)
        lengths = tuple(mesh.structured["lengths"])
        self.np_bands = []
        for a in range(d):
            h = lengths[a] / self.dims[a]
            self.np_bands.append(_assemble_1d_bands(self.dims[a], h))
        f = lambda arr: jnp.asarray(arr, dtype=op.dtype)
        # device band tables: tiny ((5, g) per axis)
        self.bands_m = [f(M) for M, _ in self.np_bands]
        self.bands_k = [f(K) for _, K in self.np_bands]

        # UNSCALED mass row sums M3 @ 1 for the constant source term
        # (HeatOperator's -dt*f*v*dx carries no c_mass factor); Kron of
        # 1D row sums; absent-neighbor band slots hold exact zeros
        vecs = [M.sum(axis=0) for M, _ in self.np_bands]
        m1 = vecs[0]
        for v in vecs[1:]:
            m1 = np.multiply.outer(m1, v)
        self.M1g = f(m1)

        # ---- boundary faces (radiation + convection flux) -------------
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
        normal = bg.normal[:, 0, :]
        axis = np.argmax(np.abs(normal), axis=1)
        side = (normal[np.arange(len(axis)), axis] > 0).astype(int)
        cells = bg.cell
        cstrides = np.array([int(np.prod(self.dims[i + 1:]))
                             for i in range(d)])
        self.faces: list[_Face2] = []
        for a in range(d):
            for s in (0, 1):
                sel = (axis == a) & (side == s)
                if not sel.any():
                    continue
                k = keep[sel]
                if not k.any():
                    continue
                if not k.all():
                    raise ValueError("flux_marker cuts through a box face")
                qw = bg.qweights[sel]
                phi = bg.phi[sel]
                if (np.abs(qw - qw[0]).max() > 1e-12 * max(qw.max(), 1e-30)
                        or np.abs(phi - phi[0]).max() > 1e-12):
                    raise ValueError("non-uniform face tables — mesh is not "
                                     "a uniform box")
                layer = cells[sel]
                ca = (layer // cstrides[a]) % self.dims[a]
                expect = 0 if s == 0 else self.dims[a] - 1
                n_layer = int(np.prod(self.dims)) // self.dims[a]
                if not (len(layer) == n_layer and np.all(ca == expect)
                        and len(np.unique(layer)) == n_layer):
                    raise ValueError("face layer mismatch — mesh is not a "
                                     "uniform box")
                fc = _Face2(a, s, f(qw[0]), f(phi[0]))
                fc.np_qw = np.asarray(qw[0])
                fc.np_phi = np.asarray(phi[0])
                fc.cols = [l for l in range(nloc)
                           if float(np.abs(fc.np_phi[:, l]).max()) > 1e-14]
                self.faces.append(fc)
        # per-face (q, lc, lc) basis products for the linearized flux
        self._face_phiphi = [
            f(np.einsum("ql,qm->qlm", fc.np_phi[:, fc.cols],
                        fc.np_phi[:, fc.cols]))
            for fc in self.faces]

        # ---- Dirichlet lifting ----------------------------------------
        self.bc_mask = op.bc_mask
        self.bc_values = op.bc_values
        self.bc_mask_g = op.bc_mask.reshape(self.grid)
        self.bc_values_g = op.bc_values.reshape(self.grid)
        self.has_bc = op.has_bc

        # 5^d lattice offsets, lexicographic (table form)
        self._offsets = [off for off in np.ndindex(*([5] * d))]

        # host Gershgorin statistics for smoother bounds:
        # |A| row sums <= sum_t outer(|band_t| row sums); diag exact
        p = op.params
        dabs_m, dabs_k, dg_m, dg_k = [], [], [], []
        for a in range(d):
            M, K = self.np_bands[a]
            dabs_m.append(np.abs(M).sum(axis=0))
            dabs_k.append(np.abs(K).sum(axis=0))
            dg_m.append(M[2])
            dg_k.append(K[2])

        def _outer(vs):
            out = vs[0]
            for v in vs[1:]:
                out = np.multiply.outer(out, v)
            return out

        mass_abs = _outer(dabs_m)
        stiff_abs = sum(_outer([dabs_k[t] if t == a else dabs_m[t]
                                for t in range(d)]) for a in range(d))
        mass_diag = _outer(dg_m)
        stiff_diag = sum(_outer([dg_k[t] if t == a else dg_m[t]
                                 for t in range(d)]) for a in range(d))
        # boundary linearization at T_0 (abs-sum and diagonal per face)
        b_abs = np.zeros(self.grid)
        b_diag = np.zeros(self.grid)
        dflux0 = p.boundary_scale * (4.0 * p.sigma * p.epsilon
                                     * p.T_0 ** 3 + p.htc)
        for fc in self.faces:
            phi = fc.np_phi[:, fc.cols]
            blocks = dflux0 * np.einsum("q,ql,qm->lm", fc.np_qw, phi, phi)
            for jl, l in enumerate(fc.cols):
                sl = self._np_corner_slices(fc, l)
                b_abs[sl] += np.abs(blocks[jl]).sum()
                b_diag[sl] += blocks[jl, jl]
        self.gersh = {
            "mass_abs": op.c_mass * mass_abs,
            "mass_diag": op.c_mass * mass_diag,
            "stiff_abs": op.c_diff * stiff_abs,
            "stiff_diag": op.c_diff * stiff_diag,
            "b_abs": b_abs, "b_diag": b_diag,
        }

    # ------------------------------------------------------------------
    def _corner_slices(self, face: _Face2, l: int):
        """Static strided lattice slices addressing local node l of every
        cell in the face's boundary layer (stride 2: cell i -> lattice
        2*i + off)."""
        off = self.loffs[l]
        idx = []
        for i in range(self.d):
            if i == face.axis:
                base = (0 if face.side == 0
                        else 2 * (self.dims[i] - 1)) + off[i]
                idx.append(slice(base, base + 1))
            else:
                idx.append(slice(off[i], off[i] + 2 * self.dims[i] - 1, 2))
        return tuple(idx)

    _np_corner_slices = _corner_slices

    def _face_corners(self, Tg, face: _Face2, cols):
        return jnp.stack(
            [Tg[self._corner_slices(face, l)] for l in cols], axis=-1)

    # ---- gather-free face scatter ------------------------------------
    # Strided-slice SCATTER (.at[off::2].add) lowers catastrophically on
    # TPU (measured: 54 strided adds = 83 ms at 41k dofs vs ~1 ms for
    # everything else in the residual); strided READS are fine. The face
    # contributions are therefore assembled onto the full face plane by a
    # vectorized pad+interleave transform per plane axis, then added with
    # ONE contiguous plane slice.
    @staticmethod
    def _interleave_axis(even, odd, axis):
        """even (n+1) and odd (n) along `axis` -> interleaved (2n+1)."""
        n = odd.shape[axis]
        head = jax.lax.slice_in_dim(even, 0, n, axis=axis)
        pairs = jnp.stack([head, odd], axis=axis + 1)
        shp = list(even.shape)
        shp[axis] = 2 * n
        pairs = pairs.reshape(shp)
        last = jax.lax.slice_in_dim(even, n, n + 1, axis=axis)
        return jnp.concatenate([pairs, last], axis=axis)

    @classmethod
    def _assemble_cells_to_lattice(cls, arr, n_cell_axes):
        """(*cell_dims, 3, ..., 3) with one trailing local axis per cell
        axis -> lattice array (*[2n+1]): per axis, out[2i + o] += arr[i, o]
        via pad + interleave (no scatter)."""
        for a in range(n_cell_axes):
            la = arr.ndim - (n_cell_axes - a)
            c0 = jax.lax.index_in_dim(arr, 0, axis=la, keepdims=False)
            c1 = jax.lax.index_in_dim(arr, 1, axis=la, keepdims=False)
            c2 = jax.lax.index_in_dim(arr, 2, axis=la, keepdims=False)
            pad0 = [(0, 0)] * c0.ndim
            pad0[a] = (0, 1)
            pad2 = [(0, 0)] * c0.ndim
            pad2[a] = (1, 0)
            even = jnp.pad(c0, pad0) + jnp.pad(c2, pad2)
            arr = cls._interleave_axis(even, c1, a)
        return arr

    def _face_plane_add(self, yg, face: _Face2, contrib):
        """Add per-cell face contributions (shape: face-layer cells x
        len(cols)) into the lattice array yg, gather-free."""
        d = self.d
        az = face.axis
        plane_axes = [i for i in range(d) if i != az]
        # squeeze the face axis (size 1) and split the col axis into one
        # local axis of size 3 per plane axis (cols are ordered by the
        # element's node ordering — use loffs to place them)
        c = jnp.squeeze(contrib, axis=az)      # (*plane_cells, lc)
        if not plane_axes:                     # 1D: single end point
            base = 0 if face.side == 0 else self.grid[0] - 1
            return yg.at[base].add(jnp.squeeze(c))
        lc = c.shape[-1]
        # position of col j in the (3,)*len(plane_axes) local box
        pos = np.zeros((3,) * len(plane_axes), dtype=np.int64)
        for j, l in enumerate(face.cols):
            key = tuple(self.loffs[l][i] for i in plane_axes)
            pos[key] = j
        c3 = c[..., pos.reshape(-1)].reshape(
            c.shape[:-1] + (3,) * len(plane_axes))
        plane = self._assemble_cells_to_lattice(c3, len(plane_axes))
        base = 0 if face.side == 0 else self.grid[az] - 1
        idx = tuple(slice(base, base + 1) if i == az else slice(None)
                    for i in range(d))
        return yg.at[idx].add(jnp.expand_dims(plane, az))

    # ---- 1D banded applies (sum factorization) -----------------------
    def _apply1d(self, band, xg, axis, diff: bool = False):
        """Apply a (5, g) banded 1D operator along `axis` of the lattice:
        5 static shifted slices with per-plane weights. `diff=True` is the
        difference form sum_{o != 0} band_o (x_{i+o} - x_i), which
        annihilates along-axis-constant fields EXACTLY in floating point
        (zero-row-sum stiffness; the ops/grid.py f32-health rationale)."""
        g = xg.shape[axis]
        pad = [(0, 0)] * xg.ndim
        pad[axis] = (2, 2)
        xp = jnp.pad(xg, pad)
        shape = [1] * xg.ndim
        shape[axis] = g
        acc = jnp.zeros_like(xg)
        for o in range(5):
            if diff and o == 2:
                continue
            sl = jax.lax.slice_in_dim(xp, o, o + g, axis=axis)
            w = band[o].reshape(shape)
            acc = acc + w * ((sl - xg) if diff else sl)
        return acc

    def _mass3(self, xg):
        for a in range(self.d):
            xg = self._apply1d(self.bands_m[a], xg, a)
        return xg

    def _stiff3(self, xg):
        """K3 x by sum factorization, difference-form 1D stiffness passes
        (7 banded applies in 3D instead of 9: the trailing-axis mass
        chain is shared)."""
        d = self.d
        if d == 1:
            return self._apply1d(self.bands_k[0], xg, 0, diff=True)
        # u[t] = (prod of M over axes > t applied) with K at axis t
        # recursive shared-suffix evaluation:
        # S_a = M_{a+1} ... M_{d-1} x  (suffix mass chains)
        suffix = [xg]
        for a in range(d - 1, 0, -1):
            suffix.insert(0, self._apply1d(self.bands_m[a], suffix[0], a))
        # suffix[a] = M_{a+1..d-1} x  for a in 0..d-1 (suffix[d-1] = x)
        # term_a = M_0..M_{a-1} K_a suffix[a]; Horner over the shared
        # prefix: R_a = K_a suffix[a] + M_a R_{a+1}
        acc = self._apply1d(self.bands_k[d - 1], suffix[d - 1], d - 1,
                            diff=True)
        for a in range(d - 2, -1, -1):
            acc = self._apply1d(self.bands_m[a], acc, a)
            acc = acc + self._apply1d(self.bands_k[a], suffix[a], a,
                                      diff=True)
        return acc

    # ------------------------------------------------------------------
    def residual(self, T: jnp.ndarray, T_prev: jnp.ndarray,
                 dt=None) -> jnp.ndarray:
        return self.residual_g(T.reshape(self.grid),
                               T_prev.reshape(self.grid), dt).reshape(-1)

    def residual_g(self, Tg, Tpg, dt=None):
        dt = self.op.dt if dt is None else dt
        if not self.has_bc:
            return self._base_residual_g(Tg, Tpg, dt)
        T_eff = jnp.where(self.bc_mask_g, self.bc_values_g, Tg)
        r = self._base_residual_g(T_eff, Tpg, dt)
        return jnp.where(self.bc_mask_g, Tg - self.bc_values_g, r)

    def _base_residual_g(self, Tg, Tpg, dt):
        p = self.params
        # mass on the per-step DIFFERENCE + difference-form stiffness:
        # no ~800 K cancellation, constants annihilated exactly
        rg = (self.op.c_mass * self._mass3(Tg - Tpg)
              + (dt * self.op.c_diff) * self._stiff3(Tg)
              - (dt * p.f) * self.M1g)
        for fc, phiphi in zip(self.faces, self._face_phiphi):
            phi = fc.phi[:, fc.cols]
            corners = self._face_corners(Tg, fc, fc.cols)   # (..., lc)
            Tb = jnp.einsum("...l,ql->...q", corners, phi)
            gflux = p.boundary_scale * (
                (p.sigma * p.epsilon) * (Tb**4 - p.T_ambient**4)
                + p.htc * (Tb - p.T_ambient))
            contrib = jnp.einsum("...q,q,ql->...l", gflux, dt * fc.qw, phi)
            rg = self._face_plane_add(rg, fc, contrib)
        return rg

    # ------------------------------------------------------------------
    def jacobian_diag(self, T: jnp.ndarray, dt=None) -> jnp.ndarray:
        return self.jacobian_diag_g(T.reshape(self.grid), dt).reshape(-1)

    def jacobian_diag_g(self, Tg, dt=None):
        p = self.params
        dt = self.op.dt if dt is None else dt
        d = self.d

        def outer(vs):
            out = vs[0]
            for v in vs[1:]:
                out = out[..., None] * v
            return out

        dm = [self.bands_m[a][2] for a in range(d)]
        dk = [self.bands_k[a][2] for a in range(d)]
        dg = self.op.c_mass * outer(dm)
        for a in range(d):
            dg = dg + (dt * self.op.c_diff) * outer(
                [dk[t] if t == a else dm[t] for t in range(d)])
        for fc in self.faces:
            phi = fc.phi[:, fc.cols]
            corners = self._face_corners(Tg, fc, fc.cols)
            Tb = jnp.einsum("...l,ql->...q", corners, phi)
            dflux = p.boundary_scale * (
                4.0 * p.sigma * p.epsilon * Tb**3 + p.htc)
            contrib = jnp.einsum("...q,q,ql->...l", dflux, dt * fc.qw,
                                 phi * phi)
            dg = self._face_plane_add(dg, fc, contrib)
        if self.has_bc:
            dg = jnp.where(self.bc_mask_g, 1.0, dg)
        return dg

    # ---- linearized boundary flux (frozen T) -------------------------
    def _flux_lin_tables(self, Tg, dt):
        p = self.params
        out = []
        for fc, phiphi in zip(self.faces, self._face_phiphi):
            phi = fc.phi[:, fc.cols]
            corners = self._face_corners(Tg, fc, fc.cols)
            Tb = jnp.einsum("...l,ql->...q", corners, phi)
            w = (p.boundary_scale
                 * (4.0 * p.sigma * p.epsilon * Tb**3 + p.htc)
                 * (dt * fc.qw))
            # multiply+reduce, not dot_general (tiny batched contractions
            # compile pathologically on the TPU runtime, ops/grid.py)
            out.append((w[..., :, None, None] * phiphi).sum(-3))
        return out

    def _apply_flux_lin(self, WW, xg, yg):
        for fc, W in zip(self.faces, WW):
            xc = self._face_corners(xg, fc, fc.cols)        # (..., m)
            contrib = (W * xc[..., None, :]).sum(-1)        # (..., l)
            yg = self._face_plane_add(yg, fc, contrib)
        return yg

    # ---- Jacobian action ---------------------------------------------
    def _kron_jac_g(self, dt):
        """Linear-part Jacobian apply (sum-factorized): c_mass*M3 +
        dt*c_diff*K3, 2d+1 banded passes."""
        d = self.d
        cm = self.op.c_mass
        ck = self.op.c_diff

        def mv(xg):
            suffix = [xg]
            for a in range(d - 1, 0, -1):
                suffix.insert(0, self._apply1d(self.bands_m[a],
                                               suffix[0], a))
            if d == 1:
                acc = (dt * ck) * self._apply1d(self.bands_k[0], xg, 0,
                                                diff=True)
                return acc + cm * self._apply1d(self.bands_m[0], xg, 0)
            acc = (dt * ck) * self._apply1d(self.bands_k[d - 1],
                                            suffix[d - 1], d - 1, diff=True)
            for a in range(d - 2, -1, -1):
                acc = self._apply1d(self.bands_m[a], acc, a)
                acc = acc + (dt * ck) * self._apply1d(
                    self.bands_k[a], suffix[a], a, diff=True)
            # add cm * M3 x: reuse suffix[0] = M_{1..d-1} x
            acc = acc + cm * self._apply1d(self.bands_m[0], suffix[0], 0)
            return acc
        return mv

    def stencil_values_g(self, Tg, dt):
        """Materialized (5^d, *L) Jacobian value table, built in-graph
        from 1D band outer products + linearized face-flux blocks (the
        ops/grid.py bake form, for consumers that prefer streamed tables
        over sum factorization)."""
        d = self.d
        cm = self.op.c_mass
        ck = dt * self.op.c_diff
        L = self.grid

        vals = []
        for off in self._offsets:
            # cm * prod(M) + ck * sum_a (K at axis a, M elsewhere):
            # each table slot is a sum of d+1 outer products of band rows
            combos = [tuple("m" for _ in range(d))]
            combos += [tuple("k" if t == a else "m" for t in range(d))
                       for a in range(d)]
            coefs = [cm] + [ck] * d
            acc = None
            for combo, coef in zip(combos, coefs):
                prod = None
                for t in range(d):
                    b = (self.bands_m[t] if combo[t] == "m"
                         else self.bands_k[t])
                    v = b[off[t]]
                    prod = v if prod is None else prod[..., None] * v
                prod = coef * prod
                acc = prod if acc is None else acc + prod
            vals.append(acc)
        vals = jnp.stack(vals, axis=0)                      # (5^d, *L)
        # bake the linearized flux: face couplings have face-axis delta 0
        # (all 9 face locals lie on the face plane). Pairs are grouped by
        # coupling delta and assembled plane-wise (no strided scatter —
        # see _face_plane_add).
        p = self.params
        for fc in self.faces:
            az = fc.axis
            plane_axes = [i for i in range(d) if i != az]
            phi = fc.phi[:, fc.cols]
            corners = self._face_corners(Tg, fc, fc.cols)
            Tb = jnp.einsum("...l,ql->...q", corners, phi)
            w = (p.boundary_scale
                 * (4.0 * p.sigma * p.epsilon * Tb**3 + p.htc)
                 * (dt * fc.qw))                            # (..., q)
            # all pair blocks at once: (..., l, m)
            blocks = jnp.einsum("...q,ql,qm->...lm", w, phi, phi)
            blocks = jnp.squeeze(blocks, axis=az)
            base = 0 if fc.side == 0 else self.grid[az] - 1
            npa = len(plane_axes)
            if not plane_axes:                              # 1D end point
                o = (5 ** d - 1) // 2
                vals = vals.at[(o,) + (base,)].add(
                    jnp.squeeze(blocks))
                continue
            for delta in np.ndindex(*([5] * npa)):
                dvec = [int(v) - 2 for v in delta]
                # gather blk_{l, l+delta} into the l-local (3,)^npa box
                sel = np.full((3,) * npa, -1, dtype=np.int64)
                pairj = np.zeros((3,) * npa + (2,), dtype=np.int64)
                any_valid = False
                for jl, l in enumerate(fc.cols):
                    lo = tuple(self.loffs[l][i] for i in plane_axes)
                    mo = tuple(lo[i] + dvec[i] for i in range(npa))
                    if any(v < 0 or v > 2 for v in mo):
                        continue
                    # find col index of the m local
                    for jm, m in enumerate(fc.cols):
                        if tuple(self.loffs[m][i]
                                 for i in plane_axes) == mo:
                            sel[lo] = jl * len(fc.cols) + jm
                            any_valid = True
                            break
                if not any_valid:
                    continue
                lc = len(fc.cols)
                flat = blocks.reshape(blocks.shape[:-2] + (lc * lc,))
                safe = np.where(sel < 0, 0, sel)
                c3 = flat[..., safe.reshape(-1)].reshape(
                    flat.shape[:-1] + (3,) * npa)
                mask = jnp.asarray((sel >= 0).astype(np.float64),
                                   dtype=flat.dtype)
                c3 = c3 * mask
                plane = self._assemble_cells_to_lattice(c3, npa)
                o = 0
                k = 0
                for i in range(d):
                    if i == az:
                        o = o * 5 + 2
                    else:
                        o = o * 5 + (dvec[k] + 2)
                        k += 1
                idx = tuple(slice(base, base + 1) if i == az
                            else slice(None) for i in range(d))
                vals = vals.at[(o,) + idx].add(
                    jnp.expand_dims(plane, az))
        return vals

    def matvec_vals(self, vals, xg):
        """(5^d, *L) table matvec: static pad-2 + slice shifts."""
        xp = jnp.pad(xg, 2)
        acc = jnp.zeros(self.grid, dtype=xg.dtype)
        for o, off in enumerate(self._offsets):
            start = tuple(int(v) for v in off)
            limit = tuple(s + g for s, g in zip(start, self.grid))
            acc = acc + vals[o] * jax.lax.slice(xp, start, limit)
        return acc

    def _flat_shifts(self):
        out = []
        for off in np.ndindex(*([5] * self.d)):
            dx = int(off[0])
            sft = 0
            for a in range(1, self.d):
                sft = sft * self.grid[a] + (int(off[a]) - 2)
            out.append((dx, sft))
        return out

    def matvec_flat(self, vals2, x):
        """2D-flattened table matvec (wide-lane form, ops/stencil.py
        rationale): vals2 (5^d, gx, M), x flat; wrapped edge reads are
        annihilated by assembled zeros."""
        gx = self.grid[0]
        M = vals2.shape[-1]
        shifts = self._flat_shifts()
        P = max(abs(s) for _, s in shifts) if self.d > 1 else 1
        x2 = x.reshape(gx, M)
        xp = jnp.pad(x2, ((2, 2), (P, P)))
        acc = jnp.zeros((gx, M), dtype=x.dtype)
        for o, (dx, sft) in enumerate(shifts):
            acc = acc + vals2[o] * jax.lax.slice(
                xp, (dx, P + sft), (dx + gx, P + sft + M))
        return acc.reshape(-1)

    def make_matvec_g(self, Tg, dt, form: str | None = None):
        """Grid-shaped Jacobian action at the frozen linearization Tg."""
        form = form or self.matvec_form
        if form == "table":
            vals = self.stencil_values_g(Tg, dt)
            mv0 = lambda v: self.matvec_vals(vals, v)
        else:
            lin = self._kron_jac_g(dt)
            WW = self._flux_lin_tables(Tg, dt)

            def mv0(v):
                y = lin(v)
                if WW:
                    y = self._apply_flux_lin(WW, v, y)
                return y
        if self.has_bc:
            mask = self.bc_mask_g
            return lambda v: jnp.where(
                mask, v, mv0(jnp.where(mask, 0.0, v)))
        return mv0

    def make_matvec(self, T: jnp.ndarray, dt, form: str | None = None):
        """Flat-vector Jacobian action (the Krylov-loop operator)."""
        form = form or self.matvec_form
        if form == "table":
            vals = self.stencil_values_g(T.reshape(self.grid), dt)
            if self.d > 1:
                vals2 = vals.reshape(vals.shape[0], self.grid[0], -1)
                mv0 = lambda v: self.matvec_flat(vals2, v)
            else:
                mv0 = lambda v: self.matvec_vals(
                    vals, v.reshape(self.grid)).reshape(-1)
        else:
            g_mv = self.make_matvec_g(T.reshape(self.grid), dt, form=form)
            if self.has_bc:
                return lambda v: g_mv(v.reshape(self.grid)).reshape(-1)
            mv0 = lambda v: g_mv(v.reshape(self.grid)).reshape(-1)
        if self.has_bc:
            mask = self.bc_mask
            return lambda v: jnp.where(
                mask, v, mv0(jnp.where(mask, 0.0, v)))
        return mv0


class Q2MG:
    """p-multigrid preconditioner for GridHeatOperator2: smoothing on the
    Q2 lattice, exact-embedding transfers to the CG-1 node grid (even
    lattice points), and one GridMG V-cycle as the coarse solve.
    Interface mirrors GeometricMG (models/problem.py build_ops):

        mg = Q2MG(grid2_op, make_heat_operator)
        mg.freeze_rhos(dt)
        precond = mg.preconditioner(mg.linearization_states(T), dt)

    Smoother: 'auto' resolves to a Chebyshev-accelerated pentadiagonal
    LINE smoother along the strongly coupled (small-h) axis on
    anisotropic plates — point smoothers cannot damp the through-
    thickness lattice modes (measured on 12x12x4 cells at 100:1 plate
    aspect: 180 MG-CG iterations per Newton with point Chebyshev) — and
    to point Chebyshev-Jacobi on isotropic boxes. The Kronecker structure
    makes the line matrices trivial: each lattice line's restriction of
    the operator is alpha(line)*M1_az + beta(line)*K1_az with per-line
    scalars, factorized once per operator build by a batched banded
    LDL^T."""

    def __init__(self, fine: GridHeatOperator2, make_heat_operator, *,
                 nu_pre: int = 2, nu_post: int = 2, smoother: str = "auto",
                 mg_kwargs: dict | None = None, coarse_pad0: int = 0):
        """`coarse_pad0` pads the CG-1 coarse chain's node-grid axis 0
        with identity ghost rows (the GSPMD divisibility pad,
        parallel/grid_shard.py); the restrict/prolong boundary in
        preconditioner_g pads/slices accordingly."""
        from fem_glass_tempering_tpu.ops.grid import GridHeatOperator
        from fem_glass_tempering_tpu.solver.grid_mg import GridMG
        self.fine = fine
        self.nu_pre, self.nu_post = nu_pre, nu_post
        mesh = fine.op.fs.mesh
        if smoother == "auto":
            h = [ln / dd for ln, dd in zip(mesh.structured["lengths"],
                                           fine.dims)]
            smoother = ("line" if (max(h) / min(h) > 3.0 and fine.d >= 2)
                        else "chebyshev")
        if smoother not in ("chebyshev", "jacobi", "line"):
            raise ValueError(smoother)
        self.smoother = smoother
        if smoother == "line":
            h = [ln / dd for ln, dd in zip(mesh.structured["lengths"],
                                           fine.dims)]
            self.line_axis = int(np.argmin(h))
        else:
            self.line_axis = None
        heat1 = make_heat_operator(mesh)
        if heat1.fs.degree != 1 or heat1.fs.family != "CG":
            raise ValueError("make_heat_operator must build the CG-1 "
                             "operator for the coarse chain")
        self.g1 = GridHeatOperator(heat1, pad_axis0=coarse_pad0,
                                   allow_const=False)
        self.gmg = GridMG(self.g1, make_heat_operator,
                          **(mg_kwargs or {}))
        self._rho2 = None

    def freeze_rhos(self, dt: float) -> None:
        g = self.fine.gersh
        num = (g["mass_abs"] + dt * g["stiff_abs"] + dt * g["b_abs"])
        den = (g["mass_diag"] + dt * g["stiff_diag"] + dt * g["b_diag"])
        self._rho2 = float(np.max(num / den))
        self.gmg.freeze_rhos(dt)

    # GeometricMG-compatible alias (problem.py calls freeze_omegas on mg)
    def freeze_omegas(self, T0, dt) -> None:
        self.freeze_rhos(dt)

    def linearization_states_g(self, Tg: jnp.ndarray):
        """Grid-shaped per-level frozen temperatures: Q2 lattice grid,
        then the CG-1 chain by injection (even lattice points ARE the
        CG-1 nodal values; deeper levels by GridMG's even-node
        injection). The coarse node grid is padded to the GridMG fine
        level's (possibly ghost-padded) axis-0 extent."""
        T1 = Tg
        for a in range(self.fine.d):
            T1 = jax.lax.slice_in_dim(T1, 0, T1.shape[a], stride=2, axis=a)
        if self.gmg.pad0:
            pc = [(0, self.gmg.pad0)] + [(0, 0)] * (T1.ndim - 1)
            T1 = jnp.pad(T1, pc, mode="edge")
        return [Tg] + self.gmg.linearization_states_g(T1)

    def linearization_states(self, T: jnp.ndarray):
        return self.linearization_states_g(T.reshape(self.fine.grid))

    def _restrict(self, rg):
        from fem_glass_tempering_tpu.solver.multigrid import GeometricMG
        for a in range(self.fine.d):
            rg = GeometricMG._restrict_axis(rg, a)
        return rg

    def _prolong(self, xc):
        from fem_glass_tempering_tpu.solver.multigrid import GeometricMG
        for a in range(self.fine.d):
            xc = GeometricMG._prolong_axis(xc, a)
        return xc

    # ---- batched pentadiagonal line solver ---------------------------
    def _line_solver(self, T_lin, dt):
        """Factorize every lattice line along `line_axis` of the frozen
        operator and return zsolve(r_grid) -> Z^{-1} r_grid. The line
        matrix is alpha*M1_az + beta*K1_az (Kronecker separability) with
        the diagonal REPLACED by the exact operator diagonal (folds in the
        linearized boundary flux and Dirichlet identity rows; off-line
        couplings at Dirichlet rows are severed)."""
        fine = self.fine
        az = self.line_axis
        d = fine.d
        cm = fine.op.c_mass
        ck = fine.op.c_diff
        L = fine.grid
        dtype = fine.dtype
        # per-line scalars alpha/beta on the off-line index grid
        dm = [np.asarray(fine.np_bands[t][0][2]) for t in range(d)]
        dk = [np.asarray(fine.np_bands[t][1][2]) for t in range(d)]

        def outer_except(vs):
            out = None
            for t in range(d):
                if t == az:
                    continue
                v = vs[t]
                out = v if out is None else np.multiply.outer(out, v)
            return out

        alpha_np = cm * outer_except(dm)
        for a in range(d):
            if a == az:
                continue
            alpha_np = alpha_np + ck * outer_except(
                [dk[t] if t == a else dm[t] for t in range(d)])
        beta_np = ck * outer_except(dm)
        alpha = jnp.asarray(alpha_np, dtype=dtype)     # (off-line grid)
        beta = jnp.asarray(beta_np, dtype=dtype)
        Mb, Kb = fine.bands_m[az], fine.bands_k[az]    # (5, Lz)
        nz = L[az]
        # line bands (ncol, nz): diag replaced by the exact diagonal
        diag_full = fine.jacobian_diag_g(T_lin, dt)
        perm = tuple(j for j in range(d) if j != az) + (az,)
        inv_perm = tuple(int(j) for j in np.argsort(perm))
        ncol = int(np.prod(L)) // nz

        def to_lines(x):
            return jnp.transpose(x, perm).reshape(ncol, nz)

        def from_lines(x2):
            shape_perm = tuple(L[j] for j in perm)
            return jnp.transpose(x2.reshape(shape_perm), inv_perm)

        a0 = to_lines(diag_full)
        ab = alpha.reshape(ncol, 1)
        bb = beta.reshape(ncol, 1)
        # sub-diagonal bands: A[k+1, k] and A[k+2, k]. The symmetric band
        # layout stores band b of row r as the coupling to column
        # r + b - 2, so A[k+1, k] = band 3 at row k (column k+1) by
        # symmetry, and A[k+2, k] = band 4 at row k. The stiffness part
        # carries the dt factor.
        a1 = ab * Mb[3] + (dt * bb) * Kb[3]            # (ncol, nz)
        a2 = ab * Mb[4] + (dt * bb) * Kb[4]
        # sever couplings at Dirichlet rows (diag there is identity)
        if fine.has_bc:
            free = 1.0 - to_lines(fine.bc_mask_g.astype(dtype))
            free_n1 = jnp.concatenate(
                [free[:, 1:], jnp.zeros_like(free[:, :1])], axis=1)
            free_n2 = jnp.concatenate(
                [free[:, 2:], jnp.zeros_like(free[:, :2])], axis=1)
            a1 = a1 * free * free_n1
            a2 = a2 * free * free_n2
        # batched banded LDL^T (bandwidth 2), Python loop over the line
        d0 = [a0[:, 0]]
        l1 = [a1[:, 0] / d0[0]]
        l2 = [a2[:, 0] / d0[0]]
        for k in range(1, nz):
            dk_ = a0[:, k] - l1[k - 1] ** 2 * d0[k - 1]
            if k >= 2:
                dk_ = dk_ - l2[k - 2] ** 2 * d0[k - 2]
            d0.append(dk_)
            if k < nz - 1:
                lk = a1[:, k] - l2[k - 1] * l1[k - 1] * d0[k - 1]
                l1.append(lk / dk_)
            if k < nz - 2:
                l2.append(a2[:, k] / dk_)

        def zsolve(rg):
            r2 = to_lines(rg)
            y = [r2[:, 0]]
            for k in range(1, nz):
                yk = r2[:, k] - l1[k - 1] * y[k - 1]
                if k >= 2:
                    yk = yk - l2[k - 2] * y[k - 2]
                y.append(yk)
            z = [y[k] / d0[k] for k in range(nz)]
            x = [None] * nz
            x[-1] = z[-1]
            if nz >= 2:
                x[-2] = z[-2] - l1[nz - 2] * x[-1]
            for k in range(nz - 3, -1, -1):
                x[k] = z[k] - l1[k] * x[k + 1] - l2[k] * x[k + 2]
            return from_lines(jnp.stack(x, axis=1))
        return zsolve

    @staticmethod
    def _power_rho(mv, zsolve, shape, dtype, iters: int = 8):
        """Traced power-iteration bound on rho(Z^{-1}A) (the line
        coefficients move with dt/T, so the Chebyshev bound is computed
        in-graph per operator build — GridElastMG._power_rho pattern)."""
        n = int(np.prod(shape))
        v = (jnp.sin(jnp.arange(n, dtype=dtype) * 0.7) + 0.01).reshape(shape)
        rho = jnp.asarray(1.0, dtype)
        for _ in range(iters):
            w = zsolve(mv(v))
            nw = jnp.sqrt(jnp.vdot(w, w).real.astype(dtype))
            rho = nw / jnp.sqrt(jnp.vdot(v, v).real.astype(dtype))
            v = w / nw
        return rho * 1.1

    def preconditioner_g(self, T_levels, dt):
        """Grid-shaped V-cycle apply (r_lattice -> ~A^-1 r_lattice) — no
        flat reshapes, so a sharded lattice stays sharded end to end."""
        assert self._rho2 is not None, "call freeze_rhos(dt) first"
        fine = self.fine
        mv = fine.make_matvec_g(T_levels[0], dt)
        diag = fine.jacobian_diag_g(T_levels[0], dt)
        coarse = self.gmg.preconditioner_g(T_levels[1:], dt)
        nu_pre, nu_post = self.nu_pre, self.nu_post
        gmg_pad0 = self.gmg.pad0
        if self.smoother == "line":
            zsolve = self._line_solver(T_levels[0], dt)
            rho = self._power_rho(mv, zsolve, fine.grid, fine.dtype)
        else:
            zsolve = None
            rho = self._rho2

        zapply = zsolve if zsolve is not None else (lambda r: r / diag)

        def smooth_cheb(x, b, nu):
            lmax = rho
            lmin = lmax / 4.0
            theta = 0.5 * (lmax + lmin)
            delta = 0.5 * (lmax - lmin)
            sigma = theta / delta
            rho_k = 1.0 / sigma
            r = b - mv(x)
            p = zapply(r) / theta
            x = x + p
            for _ in range(max(nu - 1, 0)):
                r = b - mv(x)
                z = zapply(r)
                rho_next = 1.0 / (2.0 * sigma - rho_k)
                p = rho_next * rho_k * p + (2.0 * rho_next / delta) * z
                x = x + p
                rho_k = rho_next
            return x

        def smooth_jac(x, b, nu):
            omega = 4.0 / (3.0 * rho)
            for _ in range(nu):
                x = x + omega * zapply(b - mv(x))
            return x

        smooth = smooth_jac if self.smoother == "jacobi" else smooth_cheb

        def apply_g(rg):
            x = smooth(jnp.zeros_like(rg), rg, nu_pre)
            res = rg - mv(x)
            rc = self._restrict(res)
            if gmg_pad0:
                pc = [(0, gmg_pad0)] + [(0, 0)] * (rc.ndim - 1)
                rc = jnp.pad(rc, pc)     # zero residual on ghost rows
            xc = coarse(rc)
            if gmg_pad0:
                xc = jax.lax.slice_in_dim(
                    xc, 0, xc.shape[0] - gmg_pad0, axis=0)
            x = x + self._prolong(xc)
            x = smooth(x, rg, nu_post)
            return x
        return apply_g

    def preconditioner(self, T_levels, dt):
        """Flat-vector apply (single-device driver interface)."""
        apply_g = self.preconditioner_g(T_levels, dt)
        grid = self.fine.grid
        return lambda r: apply_g(r.reshape(grid)).reshape(-1)
