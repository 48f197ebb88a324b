"""Incremental linear-elastic equilibrium operator (vector displacement).

The reference never solves mechanical equilibrium: its total strain is
defined as MINUS the thermal strain (ViscoelasticModel.py:136-139, with the
comment 'normally from thermal and mechanical strain'), so its stresses are
a pointwise history integral with no force balance. This operator supplies
the missing mechanics as an opt-in (`RunConfig.mechanics='equilibrium'`):
each step solves the quasi-static balance

  div( sigma_hist + C_eff : (eps(du) - d_eps_th) ) = 0,   traction-free,

for the displacement increment du, where C_eff is the isotropic effective
tangent from the Prony tableau at the current scaled-time increment,

  G_eff = sum_n g_n (1 - xi/(2 lambda_g,n)),
  K_eff = sum_n k_n (1 - xi/(2 lambda_k,n)),

and sigma_hist is the decayed accumulated stress (zero in 'reference'
physics mode). The solve is one SPD CG (the operator is linear in du);
rigid-body modes are removed by 3-2-1 point constraints.

Assembly uses the same gather -> einsum -> segment_sum pattern as the heat
operator, vectorized over the displacement components.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace
from fem_glass_tempering_tpu.ops.assembly import build_cell_geometry
from fem_glass_tempering_tpu.solver.krylov import pcg


def _rigid_body_pins(fs: FunctionSpace) -> np.ndarray:
    """(n_pins, 2) [scalar_dof, component] pairs pinning all rigid modes:
    3-2-1 in 3D, 2-1 in 2D, 1 in 1D. Chooses extremal nodes for a
    well-conditioned constraint."""
    x = fs.dof_coords
    d = x.shape[1]
    origin = int(np.argmin(np.sum((x - x.min(axis=0)) ** 2, axis=1)))
    pins = [(origin, a) for a in range(d)]
    if d >= 2:
        # farthest node along x: pin transverse components (kills rotations
        # about axes orthogonal to x)
        px = int(np.argmax(x[:, 0] - x[origin, 0] + 1e-12 * x[:, 1]))
        for a in range(1, d):
            pins.append((px, a))
    if d == 3:
        py = int(np.argmax(x[:, 1]))
        pins.append((py, 2))
    return np.asarray(pins, dtype=np.int64)


class ElasticityOperator:
    """Vector CG space on the sigma-space mesh/degree; solves for du."""

    def __init__(self, fs_sigma: FunctionSpace, dtype=jnp.float64,
                 quad_degree: int | None = None):
        mesh = fs_sigma.mesh
        self.d = mesh.tdim
        # displacement shares the sigma space's scalar structure
        self.fs = FunctionSpace(mesh, fs_sigma.family, fs_sigma.degree)
        cg = build_cell_geometry(mesh, self.fs, quad_degree)
        f = lambda a: jnp.asarray(a, dtype=dtype)
        i = lambda a: jnp.asarray(a, dtype=jnp.int32)
        self.dofmap = i(self.fs.dofmap)       # (c, l)
        self.qw = f(cg.qweights)              # (c, q)
        self.gphi = f(cg.grad_phys)           # (c, q, l, g)
        self.phi = f(cg.phi)                  # (q, l)
        self.n = self.fs.n_scalar_dofs
        self.dtype = dtype
        pins = _rigid_body_pins(self.fs)
        mask = np.zeros((self.n, self.d))
        mask[pins[:, 0], pins[:, 1]] = 1.0
        self.pin_mask = f(mask)               # (n, d)
        # interpolation-point ownership for evaluating strains at the
        # sigma-space dofs (same scalar structure -> same owners)
        self.owner_cell = i(self.fs.owner_cell)
        self.owner_lp = i(self.fs.owner_lpoint)
        # tabulated basis gradients at the element's own interpolation
        # points, per cell (for strain evaluation at sigma dofs)
        ipts = self.fs.element.interpolation_points()
        dphi_ip = self.fs.element.tabulate_grad(ipts)   # (p, l, t)
        # physical gradients at interpolation points need invJ per cell at
        # those points: reuse the machinery from assembly
        from fem_glass_tempering_tpu.ops.assembly import _jacobians
        _, _, invJ = _jacobians(mesh, ipts, np.arange(mesh.n_cells))
        gphi_ip = np.einsum("cptg,plt->cplg", invJ, dphi_ip)
        self.gphi_ip = f(gphi_ip)             # (c, p, l, g)

    # ------------------------------------------------------------------
    def _strain_at_q(self, u: jnp.ndarray) -> jnp.ndarray:
        """eps(u) at quadrature points: (c, q, d, d)."""
        uc = u[self.dofmap]                               # (c, l, d)
        gu = jnp.einsum("cla,cqlg->cqag", uc, self.gphi)  # (c, q, a, g)
        return 0.5 * (gu + jnp.swapaxes(gu, -1, -2))

    def residual(self, u, sigma_hist_q, eps0_q, G_eff_q, K_eff_q):
        """Weak-form residual of equilibrium for displacement u.

        sigma_hist_q: (c, q, d, d) decayed history stress at quad points.
        eps0_q:       (c, q, d, d) imposed (thermal) strain increment.
        G_eff_q/K_eff_q: (c, q) effective tangent moduli.
        Returns (n, d).
        """
        d = self.d
        u = jnp.where(self.pin_mask > 0, 0.0, u)
        eps = self._strain_at_q(u) - eps0_q               # (c, q, d, d)
        tr = jnp.trace(eps, axis1=-2, axis2=-1)
        I = jnp.eye(d, dtype=u.dtype)
        dev = eps - (tr / d)[..., None, None] * I
        sig = (sigma_hist_q + 2.0 * G_eff_q[..., None, None] * dev
               + K_eff_q[..., None, None] * tr[..., None, None] * I)
        # r[i, a] = sum_q w sig[a, :] . grad(phi_i)  (sigma symmetric)
        r_cell = jnp.einsum("cq,cqag,cqlg->cla", self.qw, sig, self.gphi)
        r = jax.ops.segment_sum(
            r_cell.reshape(-1, d), self.dofmap.reshape(-1),
            num_segments=self.n)
        return jnp.where(self.pin_mask > 0, u, r)

    def jacobian_diag(self, G_eff_q, K_eff_q) -> jnp.ndarray:
        """Exact diagonal of the elastic stiffness (for Jacobi-CG)."""
        d = self.d
        # diag entry for (dof i, comp a):
        # sum_q w [ 2G ( sum_g 0.5*(delta + ...) ) ... ] — compute via the
        # closed form: K(i a, i a) = sum_q w [ G (|grad phi|^2 + (d phi/d a)^2 (1 - 2/d))
        #                                      + K (d phi/d a)^2 ]
        g2 = jnp.einsum("cqlg,cqlg->cql", self.gphi, self.gphi)  # |grad|^2
        ga2 = self.gphi ** 2                                     # (c,q,l,g)
        coefG = jnp.einsum("cq,cql->cl", self.qw * G_eff_q, g2)
        diag = (coefG[..., None]
                + jnp.einsum("cq,cqlg->clg", self.qw * G_eff_q * (1.0 - 2.0 / d)
                             + self.qw * K_eff_q, ga2))
        dd = jax.ops.segment_sum(
            diag.reshape(-1, d), self.dofmap.reshape(-1), num_segments=self.n)
        return jnp.where(self.pin_mask > 0, 1.0, dd)

    # ------------------------------------------------------------------
    def solve_increment(self, sigma_hist_q, eps0_q, G_eff_q, K_eff_q, *,
                        rtol=1e-10, atol=0.0, max_it=2000, x0=None,
                        rtol_r0=0.0):
        """Solve the linear equilibrium for du. Returns (du (n, d), iters).
        `x0` warm-starts CG (e.g. the previous step's displacement); the
        convergence test stays relative to ||b||, optionally relaxed by
        the increment-relative rtol_r0 term (solver/krylov.py pcg)."""
        zero = jnp.zeros((self.n, self.d), dtype=self.dtype)
        b = -self.residual(zero, sigma_hist_q, eps0_q, G_eff_q, K_eff_q)

        def matvec(v):
            # linear part only: residual at v minus residual at 0
            return self.residual(v, jnp.zeros_like(sigma_hist_q), eps0_q * 0.0,
                                 G_eff_q, K_eff_q)

        diag = self.jacobian_diag(G_eff_q, K_eff_q)
        if x0 is not None:
            x0 = x0.astype(b.dtype)
        res = pcg(matvec, b, x0=x0, diag=diag, rtol=rtol, atol=atol,
                  max_it=max_it, dot=lambda a, c: jnp.vdot(a, c),
                  rtol_r0=rtol_r0)
        return res.x, res.iters

    # ------------------------------------------------------------------
    def strain_at_sigma_dofs(self, u: jnp.ndarray) -> jnp.ndarray:
        """eps(u) evaluated at the sigma-space interpolation points
        (owner-cell gather, consistent with ops/interpolation semantics)."""
        uc = u[self.dofmap[self.owner_cell]]               # (n, l, d)
        g = self.gphi_ip[self.owner_cell, self.owner_lp]   # (n, l, g)
        gu = jnp.einsum("nla,nlg->nag", uc, g)
        return 0.5 * (gu + jnp.swapaxes(gu, -1, -2))
