"""The nonlinear heat operator: residual + exact Jacobi diagonal.

Implements the reference's weak form exactly (ThermoViscoProblem.py:293-326):

  F(T) = (T - T_prev) v dx
       + dt * ( alpha grad(T).grad(v) dx - f v dx
              + s*(sigma_SB*eps)*(T^4 - T_amb^4) v ds
              + s*htc*(T - T_amb) v ds )
       [+ dt * alpha * SIPG interior-penalty terms when T is DG]

with s = 0.001 the reference's undocumented boundary scale
(ThermoViscoProblem.py:302-304, reproduced for parity). The SIPG terms are

  (penalty/h+) <[[v n]],[[T n]]> - <{grad v},[[T n]]> - <[[v n]],{grad T}>

per ThermoViscoProblem.py:318-325, with penalty = 5.0 and h = the '+'
cell's measure divided by the facet measure (its extent normal to the
facet). The reference's 1D form uses CellDiameter
(ThermoViscoProblem.py:313-314), which in 1D equals vol/area exactly, so
1D parity is bit-identical; on anisotropic 3D cells CellDiameter
under-penalizes thin-direction facets and makes the SIPG operator
indefinite (see ops/assembly.py build_interior_geometry for the
measurements), so vol/area is the production choice in every dimension.

Everything here is jit-compatible: geometry factors are baked static arrays,
assembly is gather -> einsum -> segment_sum. The Jacobian is never formed;
Newton uses jax.jvp on `residual`, and the preconditioner uses the exact
diagonal from `jacobian_diag` (constant part precomputed, the T^3 radiation
part recomputed per call).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fem_glass_tempering_tpu.config import ModelParams
from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace
from fem_glass_tempering_tpu.ops.assembly import (
    build_boundary_geometry,
    build_cell_geometry,
    build_interior_geometry,
)


class HeatOperator:
    def __init__(self, fs: FunctionSpace, params: ModelParams, dt: float,
                 dtype=jnp.float64, quad_degree: int | None = None,
                 bc_dofs: np.ndarray | None = None, bc_value: float | None = None,
                 source: np.ndarray | None = None,
                 flux_marker=None, form: str = "reference",
                 interior_device_tables: bool = True):
        from fem_glass_tempering_tpu.models.thermal import ThermalModel

        self.fs = fs
        self.params = params
        self.dt = float(dt)
        self.dtype = dtype
        # (mass, diffusion) coefficients: 'reference' = (1, alpha) exact
        # parity with the reference's non-dimensionalized form
        # (ThermoViscoProblem.py:293-306, SURVEY.md Quirks 6); 'physical'
        # = (rho*cp, k), the dimensional equation
        self.form = form
        self.c_mass, self.c_diff = ThermalModel.from_params(
            params).coefficients(form)
        mesh = fs.mesh
        self.n_dofs = fs.n_scalar_dofs
        self.is_dg = fs.family == "DG"

        cg = build_cell_geometry(mesh, fs, quad_degree)
        # boundary default degree 5p: the T^4 radiation integrand is degree
        # 5p on facets (FFCx would estimate likewise for the reference's
        # form, ThermoViscoProblem.py:302); facet counts are small so the
        # extra points are cheap
        bq = quad_degree if quad_degree is not None else 5 * fs.degree
        bg = build_boundary_geometry(mesh, fs, bq)
        # optional selective flux boundary: marker(midpoints (f, gdim)) ->
        # bool mask selecting the facets that radiate/convect; the rest are
        # insulated. Default None = whole boundary (reference parity, the
        # reference's ds spans all exterior facets, ThermoViscoProblem.py:281)
        if flux_marker is not None and len(bg.cell):
            mids = bg.qpoints_phys.mean(axis=1)
            keep = np.asarray(flux_marker(mids), dtype=bool)
            bg = type(bg)(
                cell=bg.cell[keep], qweights=bg.qweights[keep],
                phi=bg.phi[keep], grad_phys=bg.grad_phys[keep],
                normal=bg.normal[keep], qpoints_phys=bg.qpoints_phys[keep])
        f32 = lambda a: jnp.asarray(a, dtype=dtype)
        i32 = lambda a: jnp.asarray(a, dtype=jnp.int32)

        # numpy sources retained for downstream SETUP consumers
        # (StencilMatrix/EllMatrix/GridHeatOperator): reading them back
        # from the device (np.asarray on a jax.Array) is a host transfer
        # that can stall indefinitely through a remote-TPU tunnel
        self.np_dofmap = fs.dofmap
        self.np_phi = np.asarray(cg.phi)
        self.np_b_dofmap = fs.dofmap[bg.cell]
        self.np_b_qw = np.asarray(bg.qweights)
        self.np_b_phi = np.asarray(bg.phi)

        self.dofmap = i32(fs.dofmap)                      # (c, l)
        # uniform box meshes: all cells congruent -> single-cell tables
        # ((q,) weights, (q,l,g) gradients) instead of O(n_cells) arrays
        self.uniform = mesh.structured is not None
        if self.uniform:
            self.np_qw = np.asarray(cg.qweights[0])
            self.np_gphi = np.asarray(cg.grad_phys[0])
        else:
            self.np_qw = np.asarray(cg.qweights)
            self.np_gphi = np.asarray(cg.grad_phys)
        self.qw = f32(self.np_qw)
        self.gphi = f32(self.np_gphi)
        self.phi = f32(cg.phi)                            # (q, l)

        self.b_dofmap = i32(self.np_b_dofmap)             # (f, l)
        self.b_qw = f32(bg.qweights)                      # (f, q)
        self.b_phi = f32(bg.phi)                          # (f, q, l)

        # optional spatially varying source field (dof array of fs); adds to
        # the constant params.f in the -f*v*dx term. Used by the MMS tests.
        if source is not None:
            src_q = np.einsum("ql,cl->cq", np.asarray(cg.phi),
                              np.asarray(source)[fs.dofmap])
            self.source_q = f32(src_q)                    # (c, q)
        else:
            self.source_q = None

        if self.is_dg:
            ig = build_interior_geometry(mesh, fs, quad_degree)
            self.np_i = {
                "dofmap_p": fs.dofmap[ig.cell_p],
                "dofmap_m": fs.dofmap[ig.cell_m],
                "qw": np.asarray(ig.qweights),
                "phi_p": np.asarray(ig.phi_p),
                "phi_m": np.asarray(ig.phi_m),
                "dnphi_p": np.einsum("fqlg,fqg->fql", ig.grad_p, ig.normal_p),
                "dnphi_m": np.einsum("fqlg,fqg->fql", ig.grad_m, ig.normal_p),
                "h_p": np.asarray(ig.h_p),
            }
            # device copies of the interior facet tables are the dominant
            # setup upload for a large DG mesh (O(3*n_cells) facets x q x
            # nloc, several GB at 1M cells in f64 through the remote-TPU
            # tunnel). When the gather-free DG block stencil
            # (ops/stencil.py DGStencilMatrix) carries the whole outer
            # loop they are never read on device — the driver passes
            # interior_device_tables=False and only np_i exists; the
            # matrix-free fallback calls ensure_interior_tables().
            self.i_dofmap_p = self.i_dofmap_m = None
            self.i_qw = self.i_phi_p = self.i_phi_m = None
            self.i_dnphi_p = self.i_dnphi_m = self.i_h_p = None
            if interior_device_tables:
                self.ensure_interior_tables()

        # Dirichlet lifting (working replacement for the reference's broken
        # path, SURVEY.md §Quirks 3)
        mask = np.zeros(self.n_dofs, dtype=bool)
        vals = np.zeros(self.n_dofs)
        if bc_dofs is not None and len(bc_dofs):
            mask[np.asarray(bc_dofs)] = True
            vals[np.asarray(bc_dofs)] = bc_value if bc_value is not None else 0.0
        self.bc_mask = jnp.asarray(mask)
        self.np_bc_mask = mask          # retained: setup-time consumers
        # (np_dense) must not read bc_mask back off the device
        self.has_bc = bool(mask.any())
        self.bc_values = jnp.asarray(vals, dtype=dtype)

        self._const_diag = self._build_constant_diag()

    # ------------------------------------------------------------------
    def ensure_interior_tables(self) -> None:
        """Materialize the interior-facet device tables from the retained
        numpy sources (idempotent). Must be called OUTSIDE jit, before the
        first traced use of the SIPG residual."""
        if not self.is_dg or self.i_qw is not None:
            return
        f32 = lambda a: jnp.asarray(a, dtype=self.dtype)
        i32 = lambda a: jnp.asarray(a, dtype=jnp.int32)
        self.i_dofmap_p = i32(self.np_i["dofmap_p"])
        self.i_dofmap_m = i32(self.np_i["dofmap_m"])
        self.i_qw = f32(self.np_i["qw"])
        self.i_phi_p = f32(self.np_i["phi_p"])
        self.i_phi_m = f32(self.np_i["phi_m"])
        # normal derivative tables: grad(phi) . n+  -> (f, q, l)
        self.i_dnphi_p = f32(self.np_i["dnphi_p"])
        self.i_dnphi_m = f32(self.np_i["dnphi_m"])
        self.i_h_p = f32(self.np_i["h_p"])                # (f,)

    def _scatter(self, vals_cell: jnp.ndarray, dofmap: jnp.ndarray) -> jnp.ndarray:
        return jax.ops.segment_sum(
            vals_cell.reshape(-1), dofmap.reshape(-1),
            num_segments=self.n_dofs,
        )

    def _base_residual(self, T: jnp.ndarray, T_prev: jnp.ndarray,
                       dt=None) -> jnp.ndarray:
        p = self.params
        dt = self.dt if dt is None else dt
        # ---- cell integrals ----
        Tc = T[self.dofmap]                                # (c, l)
        Tpc = T_prev[self.dofmap]
        Tq = Tc @ self.phi.T                               # (c, q)
        Tpq = Tpc @ self.phi.T
        if self.uniform:
            gTq = jnp.einsum("cl,qlg->cqg", Tc, self.gphi)  # (c, q, g)
        else:
            gTq = jnp.einsum("cl,cqlg->cqg", Tc, self.gphi)
        f_q = p.f if self.source_q is None else p.f + self.source_q
        mass_src = self.qw * (self.c_mass * (Tq - Tpq) - dt * f_q)  # (c, q)
        r_cell = jnp.einsum("cq,ql->cl", mass_src, self.phi)
        if self.uniform:
            r_cell += dt * self.c_diff * jnp.einsum(
                "cqg,qlg->cl", self.qw[None, :, None] * gTq, self.gphi)
        else:
            r_cell += dt * self.c_diff * jnp.einsum(
                "cqg,cqlg->cl", self.qw[..., None] * gTq, self.gphi)
        r = self._scatter(r_cell, self.dofmap)

        # ---- boundary (radiation + convection, Robin-type) ----
        Tb = jnp.einsum("fql,fl->fq", self.b_phi, T[self.b_dofmap])
        gflux = p.boundary_scale * (
            (p.sigma * p.epsilon) * (Tb**4 - p.T_ambient**4)
            + p.htc * (Tb - p.T_ambient)
        )
        r_b = jnp.einsum("fq,fql->fl", self.b_qw * dt * gflux, self.b_phi)
        r += self._scatter(r_b, self.b_dofmap)

        # ---- SIPG interior facets (DG only) ----
        if self.is_dg:
            Tp = jnp.einsum("fql,fl->fq", self.i_phi_p, T[self.i_dofmap_p])
            Tm = jnp.einsum("fql,fl->fq", self.i_phi_m, T[self.i_dofmap_m])
            dTp = jnp.einsum("fql,fl->fq", self.i_dnphi_p, T[self.i_dofmap_p])
            dTm = jnp.einsum("fql,fl->fq", self.i_dnphi_m, T[self.i_dofmap_m])
            jumpT = Tp - Tm
            avg_dT = 0.5 * (dTp + dTm)
            coef = dt * self.c_diff * self.i_qw            # (f, q)
            pen_h = (p.dg_penalty / self.i_h_p)[:, None]   # (f, 1)
            r_p = jnp.einsum(
                "fq,fql->fl",
                coef * pen_h * jumpT, self.i_phi_p,
            ) - jnp.einsum(
                "fq,fql->fl", coef * 0.5 * jumpT, self.i_dnphi_p,
            ) - jnp.einsum(
                "fq,fql->fl", coef * avg_dT, self.i_phi_p,
            )
            r_m = -jnp.einsum(
                "fq,fql->fl", coef * pen_h * jumpT, self.i_phi_m,
            ) - jnp.einsum(
                "fq,fql->fl", coef * 0.5 * jumpT, self.i_dnphi_m,
            ) + jnp.einsum(
                "fq,fql->fl", coef * avg_dT, self.i_phi_m,
            )
            r += self._scatter(r_p, self.i_dofmap_p)
            r += self._scatter(r_m, self.i_dofmap_m)
        return r

    def residual(self, T: jnp.ndarray, T_prev: jnp.ndarray,
                 dt=None) -> jnp.ndarray:
        """Assembled residual, with Dirichlet lifting if configured.
        `dt` may be a traced scalar (dt-adaptive retry path) or None for
        the constructor value."""
        if not self.has_bc:
            return self._base_residual(T, T_prev, dt)
        T_eff = jnp.where(self.bc_mask, self.bc_values, T)
        r = self._base_residual(T_eff, T_prev, dt)
        return jnp.where(self.bc_mask, T - self.bc_values, r)

    # ------------------------------------------------------------------
    def _build_constant_diag(self) -> tuple:
        """T-independent parts of diag(J), split so dt can stay a traced
        scalar: (mass_diag, stiff_diag) with diag = mass + dt * stiff.

        Computed entirely in NUMPY: eager jnp ops at construction each
        compile and dispatch a tiny program through the remote-TPU tunnel
        (measured: a DG HeatOperator cost ~670 s in setup dominated by a
        handful of eager einsum/scatter compiles; every MG level repeats
        the constructor). Host assembly transfers two vectors once."""
        p = self.params
        c = self.np_dofmap.shape[0]
        n = self.n_dofs
        phi = self.np_phi

        def scat(vals_cell, dofmap):
            return np.bincount(dofmap.reshape(-1),
                               weights=vals_cell.reshape(-1), minlength=n)

        if self.uniform:
            dm_row = self.c_mass * np.einsum(
                "q,ql,ql->l", self.np_qw, phi, phi)
            ds_row = self.c_diff * np.einsum(
                "q,qlg,qlg->l", self.np_qw, self.np_gphi, self.np_gphi)
            d_mass = scat(np.broadcast_to(dm_row, (c,) + dm_row.shape),
                          self.np_dofmap)
            d_stiff = scat(np.broadcast_to(ds_row, (c,) + ds_row.shape),
                           self.np_dofmap)
        else:
            d_mass = scat(self.c_mass * np.einsum(
                "cq,ql,ql->cl", self.np_qw, phi, phi), self.np_dofmap)
            d_stiff = scat(self.c_diff * np.einsum(
                "cq,cqlg,cqlg->cl", self.np_qw, self.np_gphi, self.np_gphi),
                self.np_dofmap)
        if self.is_dg:
            coef = self.c_diff * self.np_i["qw"]
            pen_h = (p.dg_penalty / self.np_i["h_p"])[:, None]
            phi_p, phi_m = self.np_i["phi_p"], self.np_i["phi_m"]
            dn_p, dn_m = self.np_i["dnphi_p"], self.np_i["dnphi_m"]
            d_p = np.einsum("fq,fql,fql->fl", coef * pen_h, phi_p, phi_p) \
                - np.einsum("fq,fql,fql->fl", coef, phi_p, dn_p)
            d_m = np.einsum("fq,fql,fql->fl", coef * pen_h, phi_m, phi_m) \
                + np.einsum("fq,fql,fql->fl", coef, phi_m, dn_m)
            d_stiff += scat(d_p, self.np_i["dofmap_p"])
            d_stiff += scat(d_m, self.np_i["dofmap_m"])
        return (jnp.asarray(d_mass, dtype=self.dtype),
                jnp.asarray(d_stiff, dtype=self.dtype))

    def jacobian_diag(self, T: jnp.ndarray, dt=None) -> jnp.ndarray:
        """Exact diag(dF/dT) at T — Jacobi preconditioner for CG."""
        p = self.params
        dt = self.dt if dt is None else dt
        Tb = jnp.einsum("fql,fl->fq", self.b_phi, T[self.b_dofmap])
        dflux = p.boundary_scale * (4.0 * p.sigma * p.epsilon * Tb**3 + p.htc)
        d_b = jnp.einsum(
            "fq,fql,fql->fl", self.b_qw * dt * dflux, self.b_phi, self.b_phi
        )
        d_mass, d_stiff = self._const_diag
        d = d_mass + dt * d_stiff + self._scatter(d_b, self.b_dofmap)
        if self.has_bc:
            d = jnp.where(self.bc_mask, 1.0, d)
        return d
