"""Grid-shaped SIPG-DG operator + p-multigrid for the GSPMD-sharded step.

The reference's *default* temperature element is DG-1
(/root/reference/main.py:25) and its parallel story covers it (mpiexec
domain decomposition, /root/reference/README.md:62-66). This module makes
DG-1 first-class under the flagship GSPMD path (parallel/grid_shard.py):

- `GridDGOperator`: the DG block stencil (ops/stencil.py DGStencilMatrix)
  with GRID-SHAPED, gather-free entry points. The boundary radiation +
  convection terms — which DGStencilMatrix applies through `b_cell`
  gathers/scatter-adds (fine single-device, but an all-gather under a
  sharded cell grid) — are re-expressed as per-face STATIC SLICE updates
  on the boundary cell layers, exactly the face-slice flux of
  ops/grid.py GridHeatOperator at cell-block granularity. Everything the
  partitioner sees is elementwise math, matmuls over the trailing nloc
  axis, and static pad/slice shifts -> local slab work + one-plane
  halo collective-permutes on ICI.

- `DGMultigrid` (solver/multigrid.py) gains a grid-shaped apply through
  the `coarse="grid"` mode wired here: the column smoother and the
  CG-1 p-transfers are already lattice slice ops; the coarse correction
  runs through GridMG (solver/grid_mg.py), the V-cycle that is already
  validated under GSPMD — so the whole DG preconditioner is one sharded
  program with iteration counts identical to single-device.

Matches the flat-path results to machine precision (tests/test_grid_dg.py)
— the same operator-equivalence guarantee GridHeatOperator carries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fem_glass_tempering_tpu.ops.stencil import DGStencilMatrix


class _DGFace:
    __slots__ = ("axis", "side", "layer", "qw", "phi")

    def __init__(self, axis, side, layer, qw, phi):
        self.axis = axis      # grid axis
        self.side = side      # 0 = low face, 1 = high face
        self.layer = layer    # cell-layer index along axis
        self.qw = qw          # (q,) physical facet quad weights
        self.phi = phi        # (q, nloc) cell basis at facet points


class GridDGOperator:
    """Gather-free grid-shaped DG heat operator.

    All entry points take/return (cx, cy, cz, nloc)-shaped arrays (cell
    lattice + local DG dofs). Dirichlet lifting is not supported here (the
    tempering problem's boundary is the Robin radiation+convection flux,
    reference ThermoViscoProblem.py:293-306); construct with bc-free
    HeatOperators.
    """

    def __init__(self, op):
        fs = op.fs
        mesh = fs.mesh
        if mesh.structured is None or fs.family != "DG" or fs.degree != 1:
            raise ValueError("GridDGOperator needs a structured box mesh "
                             "with a DG-1 space")
        if op.has_bc:
            raise ValueError("GridDGOperator does not support Dirichlet "
                             "lifting")
        self.op = op
        self.st = DGStencilMatrix(op, allow_const=True)
        if not self.st.self_const:
            raise ValueError("GridDGOperator needs the uniform-box "
                             "constant-block form")
        self.dims = self.st.cell_dims
        self.d = len(self.dims)
        self.nloc = self.st.nloc
        self.dtype = op.dtype
        self._build_faces()

    # ------------------------------------------------------------------
    def _build_faces(self) -> None:
        """Group boundary facets by (axis, side); verify the uniform-box
        invariant (identical quadrature tables across each face, every
        layer cell covered exactly once) so the flux becomes a per-face
        slice update."""
        op = self.op
        mesh = op.fs.mesh
        from fem_glass_tempering_tpu.ops.assembly import (
            _reference_outward_normals,
        )

        nref = _reference_outward_normals(mesh)       # (n_local_facets, d)
        lf = mesh.boundary_local_facet
        cells = mesh.boundary_cell
        qw = op.np_b_qw                               # (f, q)
        phi = op.np_b_phi                             # (f, q, l)
        if len(cells) != len(qw):
            raise ValueError("grid DG path needs whole-boundary flux")
        n_f = nref[lf]                                # (f, d)
        axis = np.argmax(np.abs(n_f), axis=1)
        side = (n_f[np.arange(len(axis)), axis] > 0).astype(int)
        dims = self.dims
        strides = np.array([int(np.prod(dims[i + 1:]))
                            for i in range(self.d)])
        self.faces: list[_DGFace] = []
        for a in range(self.d):
            for s in (0, 1):
                sel = (axis == a) & (side == s)
                if not sel.any():
                    continue
                qws, phis = qw[sel], phi[sel]
                if (np.abs(qws - qws[0]).max()
                        > 1e-12 * max(qws.max(), 1e-30)
                        or np.abs(phis - phis[0]).max() > 1e-12):
                    raise ValueError("non-uniform face tables — mesh is "
                                     "not a uniform box")
                layer = 0 if s == 0 else dims[a] - 1
                ca = (cells[sel] // strides[a]) % dims[a]
                n_layer = int(np.prod(dims)) // dims[a]
                if not (len(ca) == n_layer and np.all(ca == layer)):
                    raise ValueError("boundary face does not cover its "
                                     "cell layer exactly once")
                f = lambda arr: jnp.asarray(arr, dtype=self.dtype)
                self.faces.append(_DGFace(a, s, layer,
                                          f(qws[0]), f(phis[0])))

    # ------------------------------------------------------------------
    def _face_map(self, y, xg, fn):
        """y[layer] += fn(face, x_layer) for every boundary face, as
        static slice reads + dynamic_update_slice writes."""
        for face in self.faces:
            a, layer = face.axis, face.layer
            seg = jax.lax.slice_in_dim(xg, layer, layer + 1, axis=a)
            contrib = fn(face, seg)
            upd = jax.lax.slice_in_dim(y, layer, layer + 1, axis=a) + contrib
            y = jax.lax.dynamic_update_slice_in_dim(y, upd, layer, axis=a)
        return y

    def residual_g(self, Tg, Tg_prev, dt=None):
        """Grid-shaped DG residual: DGStencilMatrix._base_residual with
        the boundary flux as face slices (bit-equivalent, tested)."""
        st = self.st
        op = self.op
        p = op.params
        dt = op.dt if dt is None else dt
        # mass on the per-step difference + source (difference form:
        # ops/grid.py rationale — f32/emulated-f64 health)
        r = ((Tg - Tg_prev) @ st.A_mass.T) - (dt * p.f) * st.f1_row
        # stiffness + SIPG on the mean-shifted field
        zg = Tg - jnp.mean(Tg)
        y = st._cross_apply(st._self_const_mv(st.A_stiff, 1.0, zg), zg, 1.0)
        r = r + dt * y

        def flux(face, seg):
            Tb = seg @ face.phi.T                     # (..., 1, q)
            g = p.boundary_scale * (
                (p.sigma * p.epsilon) * (Tb**4 - p.T_ambient**4)
                + p.htc * (Tb - p.T_ambient))
            return (dt * face.qw * g) @ face.phi      # (..., 1, nloc)

        return self._face_map(r, Tg, flux)

    def make_matvec_g(self, Tg, dt=None):
        """Frozen-T Jacobian matvec, grid-shaped. The boundary-flux
        linearization rides as per-face quad-point weights (O(surface))."""
        st = self.st
        op = self.op
        p = op.params
        dt = op.dt if dt is None else dt
        A0 = st.A_mass + dt * st.A_stiff
        # frozen per-face dflux at the linearization temperature
        wfaces = []
        for face in self.faces:
            seg = jax.lax.slice_in_dim(Tg, face.layer, face.layer + 1,
                                       axis=face.axis)
            Tb = seg @ face.phi.T
            dflux = p.boundary_scale * (
                4.0 * p.sigma * p.epsilon * Tb**3 + p.htc)
            wfaces.append(dt * face.qw * dflux)       # (..., 1, q)

        def mv(xg):
            y = st._self_const_mv(A0, dt, xg)
            y = st._cross_apply(y, xg, dt)
            for face, w in zip(self.faces, wfaces):
                a, layer = face.axis, face.layer
                seg = jax.lax.slice_in_dim(xg, layer, layer + 1, axis=a)
                contrib = (w * (seg @ face.phi.T)) @ face.phi
                upd = jax.lax.slice_in_dim(y, layer, layer + 1,
                                           axis=a) + contrib
                y = jax.lax.dynamic_update_slice_in_dim(y, upd, layer,
                                                        axis=a)
            return y

        return mv

    def jacobian_diag_g(self, Tg, dt=None):
        st = self.st
        op = self.op
        p = op.params
        dt = op.dt if dt is None else dt
        nloc = self.nloc
        drow = jnp.diagonal(st.A_mass + dt * st.A_stiff)
        dg = jnp.broadcast_to(drow, self.dims + (nloc,)).astype(self.dtype)
        for a, layer, Jc in st._layer_corrections(dt):
            upd = (jax.lax.slice_in_dim(dg, layer, layer + 1, axis=a)
                   - jnp.diagonal(Jc))
            dg = jax.lax.dynamic_update_slice_in_dim(dg, upd, layer, axis=a)

        def dflux_diag(face, seg):
            Tb = seg @ face.phi.T
            dflux = p.boundary_scale * (
                4.0 * p.sigma * p.epsilon * Tb**3 + p.htc)
            return (dt * face.qw * dflux) @ (face.phi**2)

        return self._face_map(dg, Tg, dflux_diag)


# ----------------------------------------------------------------------
def dg_vertex_offsets(mesh):
    """Per-local-vertex lattice offsets of a structured box mesh's DG-1
    dofs: vert_offs[l] is the node-grid offset of cell-local vertex l, so
    cell (i,j,k)'s vertex l sits at node (i,j,k)+vert_offs[l]. Verifies
    translation invariance (same check as DGMultigrid); raises if the
    dofmap is not the lattice layout."""
    dims = tuple(mesh.structured["dims"])
    node_grid = tuple(n + 1 for n in dims)
    nstr = [int(np.prod(node_grid[i + 1:])) for i in range(len(dims))]
    cells_np = mesh.cells
    offs = []
    for l in range(cells_np.shape[1]):
        nid = int(cells_np[0, l])
        o = []
        for s in nstr:
            o.append(nid // s)
            nid %= s
        offs.append(tuple(o))
    cc = np.stack(np.unravel_index(np.arange(mesh.n_cells), dims), axis=-1)
    rec = np.stack([
        sum((cc[:, i] + o[i]) * nstr[i] for i in range(len(dims)))
        for o in offs], axis=-1)
    if not np.array_equal(rec, cells_np):
        raise ValueError("mesh cells are not the translation-invariant "
                         "box lattice layout")
    return offs, node_grid


def dg_to_nodes_g(ag, vert_offs, node_grid):
    """DG-1 cell-grid field (cx, cy, cz, nloc) -> CG-1 node grid, with
    dolfinx's deterministic last-cell-wins overwrite semantics (the
    cross-space interpolation of ops/interpolation.py, reference
    ViscoelasticModel expressions interpolated into the sigma space,
    SURVEY.md §3.5) as 2^d static slice writes: writing local vertices in
    DESCENDING l leaves each node the value from its highest incident cell
    (FunctionSpace._build_ownership), verified exact in tests."""
    out = jnp.zeros(node_grid, dtype=ag.dtype)
    d = len(node_grid)
    for l in reversed(range(ag.shape[-1])):
        out = jax.lax.dynamic_update_slice(out, ag[..., l],
                                           tuple(vert_offs[l]))
    return out
