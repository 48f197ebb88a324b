"""Generic scalar weak forms: the UFL-replacement surface.

The reference expresses its PDE in UFL and lets FFCx generate kernels
(SURVEY.md §2b). Here a weak form is three plain-JAX callables in
*residual form* — for trial/test functions u, v:

  F(u; v) = ∫_cells [ a(u, ∇u, x) · v + b(u, ∇u, x) · ∇v ] dx
          + ∫_boundary c(u, x, n) · v ds

with a: scalars -> scalar, b: -> (gdim,) vector, c: -> scalar, all written
as vectorized jnp functions of quadrature-point arrays. That decomposition
covers every scalar 2nd-order PDE weak form (diffusion, advection,
reaction, Robin/flux boundaries); the Jacobian comes from jax.jvp like
everything else — UFL's automatic differentiation becomes JAX AD.

`ScalarResidualForm.residual` plugs directly into solver.newton_solve, so a
user can solve e.g. nonlinear reaction-diffusion in ~10 lines (see
tests/test_forms.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace
from fem_glass_tempering_tpu.ops.assembly import (
    build_boundary_geometry,
    build_cell_geometry,
    build_interior_geometry,
)


def jump(u_p, u_m):
    """UFL jump([[u]]) across an interior facet, '+' minus '-' side
    (reference ThermoViscoProblem.py:318-325 uses jump(T, n))."""
    return u_p - u_m


def avg(u_p, u_m):
    """UFL avg({u}) across an interior facet."""
    return 0.5 * (u_p + u_m)


class ScalarResidualForm:
    """Assembled residual of a generic scalar weak form on a CG/DG space.

    Arguments are vectorized over quadrature points:
      cell_source  a(u, grad_u, x) -> (...,)          [multiplies v]
      cell_flux    b(u, grad_u, x) -> (..., gdim)     [dotted with grad v]
      boundary_flux c(u, x, n) -> (...,)              [multiplies v on ds]
    Each may be None. Extra per-call parameters can be closed over or passed
    via `params` (a pytree forwarded to every callable as keyword `p`).

    Interior-facet (dS) terms — the UFL jump/avg/FacetNormal surface the
    reference uses for its SIPG DG form (ThermoViscoProblem.py:308-326):

      interior_flux d(u_p, u_m, dn_u_p, dn_u_m, x, n, h)
                    -> (a_p, a_m, b_p, b_m), each (f, q)

    where u_p/u_m are the '+'/'-' side traces, dn_u_* = grad(u_*) . n with
    n the '+'-outward unit facet normal for BOTH sides, x the physical
    facet quadrature points (f, q, g), and h (f,) the anisotropy-robust
    penalty length vol(K+)/area(F) (== CellDiameter in 1D). The residual
    contribution is

      r_p += sum_q w [ a_p * v_p + b_p * dn_v_p ]
      r_m += sum_q w [ a_m * v_m + b_m * dn_v_m ]

    which spans every linear-in-v interior-facet form: SIPG, upwind DG
    fluxes, Nitsche couplings. Use the module-level `jump`/`avg` helpers
    for UFL-parity spelling; tests/test_forms.py reproduces HeatOperator's
    SIPG residual to machine precision through this surface.
    """

    def __init__(self, fs: FunctionSpace,
                 cell_source: Callable | None = None,
                 cell_flux: Callable | None = None,
                 boundary_flux: Callable | None = None,
                 interior_flux: Callable | None = None,
                 quad_degree: int | None = None,
                 dtype=jnp.float64,
                 bc_dofs: np.ndarray | None = None,
                 bc_values: np.ndarray | float | None = None):
        self.fs = fs
        self.cell_source = cell_source
        self.cell_flux = cell_flux
        self.boundary_flux = boundary_flux
        self.interior_flux = interior_flux
        self.n_dofs = fs.n_scalar_dofs
        cg = build_cell_geometry(fs.mesh, fs, quad_degree)
        bg = build_boundary_geometry(fs.mesh, fs, quad_degree)
        f = lambda a: jnp.asarray(a, dtype=dtype)
        i = lambda a: jnp.asarray(a, dtype=jnp.int32)
        self.dofmap = i(fs.dofmap)
        self.qw = f(cg.qweights)
        self.phi = f(cg.phi)
        self.gphi = f(cg.grad_phys)
        self.xq = f(cg.qpoints_phys)
        self.b_dofmap = i(fs.dofmap[bg.cell])
        self.b_qw = f(bg.qweights)
        self.b_phi = f(bg.phi)
        self.b_xq = f(bg.qpoints_phys)
        self.b_n = f(bg.normal)
        if interior_flux is not None:
            ig = build_interior_geometry(fs.mesh, fs, quad_degree)
            self.i_dofmap_p = i(fs.dofmap[ig.cell_p])
            self.i_dofmap_m = i(fs.dofmap[ig.cell_m])
            self.i_qw = f(ig.qweights)
            self.i_phi_p = f(ig.phi_p)
            self.i_phi_m = f(ig.phi_m)
            self.i_dn_p = f(np.einsum("fqlg,fqg->fql", ig.grad_p, ig.normal_p))
            self.i_dn_m = f(np.einsum("fqlg,fqg->fql", ig.grad_m, ig.normal_p))
            self.i_n = f(ig.normal_p)
            self.i_h = f(ig.h_p)
            self.i_xq = f(ig.qpoints_phys)
        mask = np.zeros(self.n_dofs, dtype=bool)
        vals = np.zeros(self.n_dofs)
        if bc_dofs is not None and len(bc_dofs):
            mask[np.asarray(bc_dofs)] = True
            vals[np.asarray(bc_dofs)] = bc_values if bc_values is not None else 0.0
        self.bc_mask = jnp.asarray(mask)
        self.has_bc = bool(mask.any())
        self.bc_values = f(vals)

    def _scatter(self, vals, dofmap):
        return jax.ops.segment_sum(vals.reshape(-1), dofmap.reshape(-1),
                                   num_segments=self.n_dofs)

    def _base_residual(self, u: jnp.ndarray, **params) -> jnp.ndarray:
        uc = u[self.dofmap]                                # (c, l)
        uq = uc @ self.phi.T                               # (c, q)
        guq = jnp.einsum("cl,cqlg->cqg", uc, self.gphi)    # (c, q, g)
        r = jnp.zeros(self.n_dofs, dtype=u.dtype)
        r_cell = None
        if self.cell_source is not None:
            a = self.cell_source(uq, guq, self.xq, **params)
            r_cell = jnp.einsum("cq,ql->cl", self.qw * a, self.phi)
        if self.cell_flux is not None:
            b = self.cell_flux(uq, guq, self.xq, **params)
            term = jnp.einsum("cqg,cqlg->cl", self.qw[..., None] * b, self.gphi)
            r_cell = term if r_cell is None else r_cell + term
        if r_cell is not None:
            r = r + self._scatter(r_cell, self.dofmap)
        if self.boundary_flux is not None and self.b_dofmap.shape[0]:
            ub = jnp.einsum("fql,fl->fq", self.b_phi, u[self.b_dofmap])
            c = self.boundary_flux(ub, self.b_xq, self.b_n, **params)
            r_b = jnp.einsum("fq,fql->fl", self.b_qw * c, self.b_phi)
            r = r + self._scatter(r_b, self.b_dofmap)
        if self.interior_flux is not None and self.i_dofmap_p.shape[0]:
            up = jnp.einsum("fql,fl->fq", self.i_phi_p, u[self.i_dofmap_p])
            um = jnp.einsum("fql,fl->fq", self.i_phi_m, u[self.i_dofmap_m])
            dup = jnp.einsum("fql,fl->fq", self.i_dn_p, u[self.i_dofmap_p])
            dum = jnp.einsum("fql,fl->fq", self.i_dn_m, u[self.i_dofmap_m])
            a_p, a_m, b_p, b_m = self.interior_flux(
                up, um, dup, dum, self.i_xq, self.i_n, self.i_h, **params)
            r_p = jnp.einsum("fq,fql->fl", self.i_qw * a_p, self.i_phi_p) \
                + jnp.einsum("fq,fql->fl", self.i_qw * b_p, self.i_dn_p)
            r_m = jnp.einsum("fq,fql->fl", self.i_qw * a_m, self.i_phi_m) \
                + jnp.einsum("fq,fql->fl", self.i_qw * b_m, self.i_dn_m)
            r = r + self._scatter(r_p, self.i_dofmap_p)
            r = r + self._scatter(r_m, self.i_dofmap_m)
        return r

    def residual(self, u: jnp.ndarray, **params) -> jnp.ndarray:
        if not self.has_bc:
            return self._base_residual(u, **params)
        u_eff = jnp.where(self.bc_mask, self.bc_values, u)
        r = self._base_residual(u_eff, **params)
        return jnp.where(self.bc_mask, u - self.bc_values, r)


class VectorResidualForm:
    """Generic weak form for VECTOR/TENSOR-valued fields — the UFL tensor
    surface (reference ThermoViscoProblem.py:280-326, ViscoelasticModel.py
    expresses sigma/strain forms in UFL's tensor algebra; here the same
    role is three vectorized jnp callables). For a field u with value
    shape V (e.g. (d,) displacement, (d, d) tensor):

      F(u; v) = ∫ [ a(u, ∇u, x) · v + b(u, ∇u, x) : ∇v ] dx
              + ∫_∂ c(u, x, n) · v ds

      cell_source   a(uq, guq, xq, **p) -> (c, q, *V)
      cell_flux     b(uq, guq, xq, **p) -> (c, q, *V, gdim)   [:: ∇v]
      boundary_flux c(ub, xb, n, **p)   -> (f, q, *V)

    with uq (c, q, *V) and guq (c, q, *V, gdim). The Jacobian is jax.jvp
    of `residual`, exactly like the scalar form. `pin_mask` (broadcastable
    to (n_dofs, *V), nonzero = constrained to `pin_values`) imposes
    component-wise point constraints (e.g. rigid-body pins,
    ops/elasticity.py). Covers every 2nd-order vector/tensor PDE weak
    form: elasticity, Stokes-like momentum balance, tensor transport."""

    def __init__(self, fs: FunctionSpace, value_shape: tuple,
                 cell_source: Callable | None = None,
                 cell_flux: Callable | None = None,
                 boundary_flux: Callable | None = None,
                 interior_flux: Callable | None = None,
                 quad_degree: int | None = None,
                 dtype=jnp.float64,
                 pin_mask: np.ndarray | None = None,
                 pin_values: np.ndarray | float = 0.0):
        self.fs = fs
        self.value_shape = tuple(value_shape)
        self.cell_source = cell_source
        self.cell_flux = cell_flux
        self.boundary_flux = boundary_flux
        # interior_flux d(u_p, u_m, dn_u_p, dn_u_m, x, n, h, **p)
        #   -> (a_p, a_m, b_p, b_m), each (f, q, *V); same contract as
        # ScalarResidualForm.interior_flux with vector/tensor coefficients
        self.interior_flux = interior_flux
        self.n_dofs = fs.n_scalar_dofs
        cg = build_cell_geometry(fs.mesh, fs, quad_degree)
        bg = build_boundary_geometry(fs.mesh, fs, quad_degree)
        f = lambda a: jnp.asarray(a, dtype=dtype)
        i = lambda a: jnp.asarray(a, dtype=jnp.int32)
        self.dofmap = i(fs.dofmap)
        self.qw = f(cg.qweights)
        self.phi = f(cg.phi)
        self.gphi = f(cg.grad_phys)
        self.xq = f(cg.qpoints_phys)
        self.b_dofmap = i(fs.dofmap[bg.cell])
        self.b_qw = f(bg.qweights)
        self.b_phi = f(bg.phi)
        self.b_xq = f(bg.qpoints_phys)
        self.b_n = f(bg.normal)
        if interior_flux is not None:
            ig = build_interior_geometry(fs.mesh, fs, quad_degree)
            self.i_dofmap_p = i(fs.dofmap[ig.cell_p])
            self.i_dofmap_m = i(fs.dofmap[ig.cell_m])
            self.i_qw = f(ig.qweights)
            self.i_phi_p = f(ig.phi_p)
            self.i_phi_m = f(ig.phi_m)
            self.i_dn_p = f(np.einsum("fqlg,fqg->fql", ig.grad_p, ig.normal_p))
            self.i_dn_m = f(np.einsum("fqlg,fqg->fql", ig.grad_m, ig.normal_p))
            self.i_n = f(ig.normal_p)
            self.i_h = f(ig.h_p)
            self.i_xq = f(ig.qpoints_phys)
        self.has_pins = pin_mask is not None
        if self.has_pins:
            self.pin_mask = f(np.broadcast_to(
                np.asarray(pin_mask), (self.n_dofs,) + self.value_shape))
            self.pin_values = f(np.broadcast_to(
                np.asarray(pin_values), (self.n_dofs,) + self.value_shape))

    def _scatter(self, vals, dofmap):
        V = self.value_shape
        return jax.ops.segment_sum(
            vals.reshape((-1,) + V), dofmap.reshape(-1),
            num_segments=self.n_dofs)

    def _base_residual(self, u: jnp.ndarray, **params) -> jnp.ndarray:
        uc = u[self.dofmap]                                   # (c, l, *V)
        uq = jnp.einsum("ql,cl...->cq...", self.phi, uc)      # (c, q, *V)
        guq = jnp.einsum("cqlg,cl...->cq...g", self.gphi, uc)
        r = jnp.zeros((self.n_dofs,) + self.value_shape, dtype=u.dtype)
        r_cell = None
        if self.cell_source is not None:
            a = self.cell_source(uq, guq, self.xq, **params)
            r_cell = jnp.einsum("cq,cq...,ql->cl...", self.qw, a, self.phi)
        if self.cell_flux is not None:
            b = self.cell_flux(uq, guq, self.xq, **params)
            term = jnp.einsum("cq,cq...g,cqlg->cl...", self.qw, b, self.gphi)
            r_cell = term if r_cell is None else r_cell + term
        if r_cell is not None:
            r = r + self._scatter(r_cell, self.dofmap)
        if self.boundary_flux is not None and self.b_dofmap.shape[0]:
            ub = jnp.einsum("fql,fl...->fq...", self.b_phi, u[self.b_dofmap])
            c = self.boundary_flux(ub, self.b_xq, self.b_n, **params)
            r_b = jnp.einsum("fq,fq...,fql->fl...", self.b_qw, c, self.b_phi)
            r = r + self._scatter(r_b, self.b_dofmap)
        if self.interior_flux is not None and self.i_dofmap_p.shape[0]:
            up = jnp.einsum("fql,fl...->fq...", self.i_phi_p,
                            u[self.i_dofmap_p])
            um = jnp.einsum("fql,fl...->fq...", self.i_phi_m,
                            u[self.i_dofmap_m])
            dup = jnp.einsum("fql,fl...->fq...", self.i_dn_p,
                             u[self.i_dofmap_p])
            dum = jnp.einsum("fql,fl...->fq...", self.i_dn_m,
                             u[self.i_dofmap_m])
            a_p, a_m, b_p, b_m = self.interior_flux(
                up, um, dup, dum, self.i_xq, self.i_n, self.i_h, **params)
            r_p = jnp.einsum("fq,fq...,fql->fl...",
                             self.i_qw, a_p, self.i_phi_p) \
                + jnp.einsum("fq,fq...,fql->fl...",
                             self.i_qw, b_p, self.i_dn_p)
            r_m = jnp.einsum("fq,fq...,fql->fl...",
                             self.i_qw, a_m, self.i_phi_m) \
                + jnp.einsum("fq,fq...,fql->fl...",
                             self.i_qw, b_m, self.i_dn_m)
            r = r + self._scatter(r_p, self.i_dofmap_p)
            r = r + self._scatter(r_m, self.i_dofmap_m)
        return r

    def residual(self, u: jnp.ndarray, **params) -> jnp.ndarray:
        if not self.has_pins:
            return self._base_residual(u, **params)
        u_eff = jnp.where(self.pin_mask > 0, self.pin_values, u)
        r = self._base_residual(u_eff, **params)
        return jnp.where(self.pin_mask > 0, u - self.pin_values, r)
