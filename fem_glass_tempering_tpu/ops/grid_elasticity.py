"""Gather-free vector elasticity operator for CG-1 on uniform box meshes.

The TPU-native fast path for the equilibrium-mechanics solve
(models/mechanics.py; the force balance the reference names and skips,
/root/reference/ViscoelasticModel.py:136-139): the same design that made
the heat solve gather-free (ops/grid.py), applied to the VECTOR
displacement field. Instead of materializing per-node (3^d, d, d) stencil
blocks (9x the scalar stencil memory — ~1 GB at 1M dofs), the operator
is applied CELL-WISE on the node grid:

  1. the 2^d cell-corner fields are static slices of the (gx,gy,gz,d)
     displacement grid;
  2. grad(u) at the cell quadrature points is one einsum with the SINGLE
     uniform-cell gradient table (q,l,g) — every cell of a uniform box
     shares it;
  3. the stress contraction and the r_cell = w sigma : grad(phi) einsum
     run batched over all cells (MXU work, variable G/K coefficients per
     cell-quad supported for free);
  4. the scatter back is 2^d static-slice adds.

Everything is elementwise + static pad/slice + einsum, so under a sharded
node grid XLA partitions it with collective-permute halos exactly like
the heat stencil — mechanics joins the GSPMD path
(parallel/grid_shard.py) instead of being fenced out of it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace
from fem_glass_tempering_tpu.ops.assembly import build_cell_geometry
from fem_glass_tempering_tpu.ops.elasticity import _rigid_body_pins


class GridElasticityOperator:
    """Vector CG-1 equilibrium operator on a uniform box mesh, applied to
    grid-shaped displacement fields (*grid, d). `pad_axis0` appends ghost
    node planes (identity rows) along grid axis 0 for GSPMD divisibility,
    mirroring GridHeatOperator."""

    def __init__(self, fs_sigma: FunctionSpace, dtype=jnp.float32,
                 pad_axis0: int = 0):
        mesh = fs_sigma.mesh
        if mesh.structured is None:
            raise ValueError("GridElasticityOperator needs a structured box")
        self.fs = FunctionSpace(mesh, fs_sigma.family, fs_sigma.degree)
        if self.fs.family != "CG" or self.fs.degree != 1:
            raise ValueError("GridElasticityOperator needs a CG-1 space")
        self.d = mesh.tdim
        self.dtype = dtype
        self.dims = tuple(mesh.structured["dims"])
        base_grid = tuple(n + 1 for n in self.dims)
        self.pad0 = int(pad_axis0)
        self.grid = ((base_grid[0] + self.pad0,) + base_grid[1:]
                     if self.pad0 else base_grid)
        self.base_grid = base_grid
        self.n = self.fs.n_scalar_dofs

        cg = build_cell_geometry(mesh, self.fs)
        qw = np.asarray(cg.qweights)
        gphi = np.asarray(cg.grad_phys)
        if (np.abs(qw - qw[0]).max() > 1e-12 * max(qw.max(), 1e-30)
                or np.abs(gphi - gphi[0]).max() > 1e-12):
            raise ValueError("non-uniform cell tables — mesh is not a "
                             "uniform box")
        f = lambda a: jnp.asarray(a, dtype=dtype)
        self.qw1 = f(qw[0])                  # (q,)
        self.phi1 = f(cg.phi)                # (q, l)
        self.gphi1 = f(gphi[0])              # (q, l, g)
        nloc = self.phi1.shape[1]
        self.nloc = nloc
        # local corner l <-> lattice offset bits (builders' vertex order)
        self.loffs = [tuple((l >> i) & 1 for i in range(self.d))
                      for l in range(nloc)]

        # rigid-body pins, identical choice to the flat operator
        # (ops/elasticity.py), expressed on the node grid
        pins = _rigid_body_pins(self.fs)
        mask = np.zeros(base_grid + (self.d,))
        for dof, comp in pins:
            idx = np.unravel_index(int(dof), base_grid)
            mask[idx + (int(comp),)] = 1.0
        if self.pad0:
            pc = [(0, self.pad0)] + [(0, 0)] * self.d
            mask = np.pad(mask, pc, constant_values=1.0)  # ghosts pinned
        self.pin_mask_g = f(mask)
        self.np_pin_mask = mask           # numpy source (dense coarse solve)

        # host-side diag statistics for smoother bounds: per-cell constant
        # tables |grad phi|^2 and (d phi/d a)^2 summed over quadrature
        self.np_qw1 = qw
        self.np_gphi1 = gphi[0]

        # per-quadrature element tensors for the materialized block-stencil
        # table (stencil_table_g): E(cell)[l,a,m,b] =
        #   sum_q G_q(cell,q) EGq[q,l,a,m,b] + K_q(cell,q) EKq[q,l,a,m,b]
        # with EGq = w (delta_ab gp_l.gp_m + gp[m,a] gp[l,b]
        #              - (2/d) gp[l,a] gp[m,b]) and EKq = w gp[l,a] gp[m,b]
        # — the exact (l,a)x(m,b) coupling of make_matvec_g's residual
        # algebra, q-resolved so per-quad-point coefficients stay exact.
        gp = np.asarray(self.np_gphi1)                    # (q, l, g)
        w = np.asarray(qw[0])                             # (q,)
        gg = np.einsum("qlg,qmg->qlm", gp, gp)
        eye = np.eye(self.d)
        EKq = np.einsum("q,qla,qmb->qlamb", w, gp, gp)
        EGq = (np.einsum("qlm,ab->qlamb", np.einsum("q,qlm->qlm", w, gg),
                         eye)
               + np.einsum("q,qma,qlb->qlamb", w, gp, gp)
               - (2.0 / self.d) * EKq)
        self._EGq = f(EGq)
        self._EKq = f(EKq)
        # lattice offsets of the 3^d-point block stencil: offset index
        # k = sum_i (off_i + 1) * 3^i, off in {-1, 0, 1}^d
        self._offsets = [tuple(int(o) - 1 for o in idx)
                         for idx in np.ndindex(*([3] * self.d))]
        self._offset_index = {off: sum((off[i] + 1) * 3 ** i
                                       for i in range(self.d))
                              for off in self._offsets}

    # ------------------------------------------------------------------
    def _corner_slice(self, l: int):
        """Static slices addressing corner l of every cell: a (dims)-shaped
        window of the node grid."""
        off = self.loffs[l]
        return tuple(slice(off[i], off[i] + self.dims[i])
                     for i in range(self.d))

    def _corners(self, ug):
        """(*grid, d) -> (*dims, l, d) cell-corner values (static slices)."""
        return jnp.stack([ug[self._corner_slice(l)]
                          for l in range(self.nloc)], axis=-2)

    def _scatter(self, r_cell, out_shape, dtype):
        """(*dims, l, d) cell contributions -> (*grid, d) nodal sums via
        2^d static-slice adds."""
        r = jnp.zeros(out_shape, dtype=dtype)
        for l in range(self.nloc):
            r = r.at[self._corner_slice(l)].add(r_cell[..., l, :])
        return r

    # ------------------------------------------------------------------
    def strain_at_q(self, ug):
        """eps(u) at cell quadrature points: (*dims, q, d, d)."""
        uc = self._corners(ug)                                 # (*dims, l, d)
        gu = jnp.einsum("...la,qlg->...qag", uc, self.gphi1)
        return 0.5 * (gu + jnp.swapaxes(gu, -1, -2))

    def residual_g(self, ug, sigma_hist_q, eps0_q, G_q, K_q):
        """Weak equilibrium residual on the grid.

        ug: (*grid, d); sigma_hist_q/eps0_q: (*dims, q, d, d);
        G_q/K_q: (*dims, q). Returns (*grid, d)."""
        d = self.d
        ug = jnp.where(self.pin_mask_g > 0, 0.0, ug)
        eps = self.strain_at_q(ug) - eps0_q
        tr = jnp.trace(eps, axis1=-2, axis2=-1)
        I = jnp.eye(d, dtype=ug.dtype)
        dev = eps - (tr / d)[..., None, None] * I
        sig = (sigma_hist_q + 2.0 * G_q[..., None, None] * dev
               + K_q[..., None, None] * tr[..., None, None] * I)
        r_cell = jnp.einsum("q,...qag,qlg->...la", self.qw1, sig, self.gphi1)
        r = self._scatter(r_cell, ug.shape, ug.dtype)
        return jnp.where(self.pin_mask_g > 0, ug, r)

    def make_matvec_g(self, G_q, K_q):
        """Linear operator apply v -> K v (grid-shaped), coefficients
        frozen — the CG hot loop."""
        d = self.d
        I = jnp.eye(d, dtype=G_q.dtype)

        def mv(vg):
            v0 = jnp.where(self.pin_mask_g > 0, 0.0, vg)
            eps = self.strain_at_q(v0)
            tr = jnp.trace(eps, axis1=-2, axis2=-1)
            dev = eps - (tr / d)[..., None, None] * I
            sig = (2.0 * G_q[..., None, None] * dev
                   + K_q[..., None, None] * tr[..., None, None] * I)
            r_cell = jnp.einsum("q,...qag,qlg->...la", self.qw1, sig,
                                self.gphi1)
            r = self._scatter(r_cell, vg.shape, vg.dtype)
            return jnp.where(self.pin_mask_g > 0, vg, r)
        return mv

    def stencil_table_g(self, G_q, K_q):
        """Materialized block-stencil table of the frozen-coefficient
        operator: B (*grid, 3^d, d, d) with B[n, k] the dxd block coupling
        node n to node n + offset(k). Built once per solve (64 slice-adds
        of per-cell blocks), then streamed by matvec_table_g — the same
        tables-over-recompute trade the heat path measured 13x faster on
        TPU (BENCH.md constant-row post-mortem). Exactly equal to
        make_matvec_g's apply (same element algebra, q-resolved
        coefficients); boundary-absent neighbors hold exact zero blocks."""
        d = self.d
        # per-cell (l, a, m, b) element blocks at the given coefficients
        E = (jnp.einsum("...q,qlamb->...lamb", G_q, self._EGq)
             + jnp.einsum("...q,qlamb->...lamb", K_q, self._EKq))
        B = jnp.zeros(self.grid + (3 ** d, d, d), dtype=G_q.dtype)
        for l in range(self.nloc):
            sl = self._corner_slice(l)
            for m in range(self.nloc):
                off = tuple(self.loffs[m][i] - self.loffs[l][i]
                            for i in range(d))
                k = self._offset_index[off]
                B = B.at[sl + (k,)].add(E[..., l, :, m, :])
        return B

    def matvec_table_g(self, B, vg):
        """v -> K v from the materialized block table: 3^d shifted
        multiply-reduce terms over a zero-padded grid (static pad/slice
        only — shards like the scalar stencil matvec)."""
        v0 = jnp.where(self.pin_mask_g > 0, 0.0, vg)
        vp = jnp.pad(v0, [(1, 1)] * self.d + [(0, 0)])
        r = None
        for off in self._offsets:
            k = self._offset_index[off]
            sl = tuple(slice(1 + off[i], 1 + off[i] + self.grid[i])
                       for i in range(self.d))
            term = (B[..., k, :, :] * vp[sl][..., None, :]).sum(-1)
            r = term if r is None else r + term
        return jnp.where(self.pin_mask_g > 0, vg, r)

    def jacobian_diag_g(self, G_q, K_q):
        """Exact diagonal of the elastic stiffness, (*grid, d): per-cell
        closed form K(ia, ia) = sum_q w [G(|grad phi_l|^2 +
        (d_a phi_l)^2 (1 - 2/d)) + K (d_a phi_l)^2], scattered by slice
        adds."""
        d = self.d
        g2 = jnp.einsum("qlg,qlg->ql", self.gphi1, self.gphi1)
        ga2 = self.gphi1 ** 2                                  # (q, l, g)
        coefG = jnp.einsum("...q,q,ql->...l", G_q, self.qw1, g2)
        term = jnp.einsum("...q,q,qlg->...lg",
                          G_q * (1.0 - 2.0 / d) + K_q, self.qw1, ga2)
        diag_cell = coefG[..., None] + term                    # (*dims, l, d)
        dd = self._scatter(diag_cell, self.grid + (d,), G_q.dtype)
        return jnp.where(self.pin_mask_g > 0, 1.0, dd)

    # ------------------------------------------------------------------
    def cell_avg_from_nodes(self, xg):
        """Nodal grid scalar (*grid) -> (*dims, q) values at quadrature
        points (corner einsum with the cell basis)."""
        xc = jnp.stack([xg[self._corner_slice(l)]
                        for l in range(self.nloc)], axis=-1)   # (*dims, l)
        return jnp.einsum("...l,ql->...q", xc, self.phi1)

    def tensor_at_q(self, sg):
        """Nodal tensor grid (*grid, d, d) -> (*dims, q, d, d)."""
        sc = jnp.stack([sg[self._corner_slice(l)]
                        for l in range(self.nloc)], axis=-3)   # (*dims,l,d,d)
        return jnp.einsum("...lab,ql->...qab", sc, self.phi1)

    def strain_at_nodes(self, ug):
        """eps(u) evaluated AT the grid nodes: for each node, the average
        of eps over the cells whose interpolation point it is — matching
        ops/elasticity.py's owner-cell convention requires one owner per
        node; on a uniform grid the builders' owner is the cell for which
        the node is corner l with the LOWEST cell index, i.e. the cell on
        the node's low side where it exists. Computed with static slices:
        grad phi at corner l of the owner cell."""
        # gradient table at the element's interpolation points: for CG-1
        # the interpolation points are the vertices; grad phi at vertex l
        # in the owner cell
        ipts = self.fs.element.interpolation_points()
        dphi_ip = np.asarray(self.fs.element.tabulate_grad(ipts))  # (p,l,t)
        # physical gradients: uniform cell -> same invJ everywhere; recover
        # it from gphi1 = invJ^T dphi at quadrature points is awkward;
        # instead compute from the mesh spacing directly
        h = [ln / dd for ln, dd in zip(
            self.fs.mesh.structured["lengths"], self.dims)]
        invJ = np.diag([1.0 / hh for hh in h])                 # (t, g)
        gphi_ip = jnp.asarray(np.einsum("tg,plt->plg", invJ, dphi_ip),
                              dtype=self.dtype)                # (p, l, g)

        uc = self._corners(ug)                                 # (*dims, l, d)
        # eps at every cell's every vertex p: (*dims, p, d, d)
        gu = jnp.einsum("...la,plg->...pag", uc, gphi_ip)
        eps_c = 0.5 * (gu + jnp.swapaxes(gu, -1, -2))
        # owner-cell selection (fem/functionspace.py _build_ownership:
        # HIGHEST cell index wins): node i along each axis is corner 0 of
        # cell i, except the last node (i == dims) which is corner 1 of
        # cell dims-1. Built by axis-wise CONCATENATION of corner planes —
        # deliberately NOT .at[region].set writes: the GSPMD partitioner
        # miscompiles those region updates under propagated shardings
        # (measured: every second plane of each shard zeroed on an
        # 8-device mesh; concatenate partitions correctly).
        d = self.d

        def build0(axis, bits_so_far):
            if axis == d:
                p = 0
                for i in range(d):
                    p = p + (bits_so_far[i] << i)
                return eps_c[..., p, :, :]
            low = build0(axis + 1, bits_so_far + (0,))
            high = build0(axis + 1, bits_so_far + (1,))
            last = jax.lax.slice_in_dim(
                high, self.dims[axis] - 1, self.dims[axis], axis=axis)
            return jnp.concatenate([low, last], axis=axis)

        out = build0(0, ())
        if self.pad0:
            pc = [(0, self.pad0)] + [(0, 0)] * (out.ndim - 1)
            out = jnp.pad(out, pc)
        return out
