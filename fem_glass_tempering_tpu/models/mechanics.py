"""Mechanical-equilibrium coupling for the viscoelastic chain.

Opt-in (`RunConfig.mechanics='equilibrium'`) extension beyond the
reference, which sets total strain := -thermal strain with the comment
'normally from thermal and mechanical strain' (ViscoelasticModel.py:136-139)
— i.e. it knowingly skips force balance. With this coupling, each step:

  1. the thermal strain increment d_eps_th = scalar_th * I and the scaled
     time xi come from the usual T-space chain;
  2. the displacement increment du solves quasi-static equilibrium
     div( sigma_hist + C_eff : (eps(du) - d_eps_th) ) = 0 (ops/elasticity),
     with C_eff the effective Prony tangent at xi and sigma_hist the
     decayed accumulated stress;
  3. the engine's `total_strain` becomes eps(du) - d_eps_th, and the
     standard eq. 15-18 updates then produce a stress field in (weak)
     equilibrium — surface compression balanced by mid-plane tension, the
     actual tempering stress profile.

With du = 0 this reduces exactly to the reference semantics.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace
from fem_glass_tempering_tpu.ops.elasticity import ElasticityOperator


class MechanicsCoupling:
    def __init__(self, fs_T: FunctionSpace, fs_sigma: FunctionSpace,
                 engine, dtype=jnp.float64, cg_rtol: float = 1e-10,
                 cg_max_it: int = 2000):
        self.engine = engine
        self.d = fs_T.mesh.tdim
        self.elast = ElasticityOperator(fs_sigma, dtype=dtype)
        self.cg_rtol = cg_rtol
        self.cg_max_it = cg_max_it
        # tabulations at the elasticity operator's quadrature points
        from fem_glass_tempering_tpu.ops.assembly import build_cell_geometry
        cg = build_cell_geometry(fs_T.mesh, self.elast.fs)
        qp = cg.qpoints_ref
        f = lambda a: jnp.asarray(a, dtype=dtype)
        i = lambda a: jnp.asarray(a, dtype=jnp.int32)
        self.tab_T = f(fs_T.element.tabulate(qp))         # (q, lT)
        self.dof_T = i(fs_T.dofmap)                       # (c, lT)
        self.tab_S = f(fs_sigma.element.tabulate(qp))     # (q, lS)
        self.dof_S = i(fs_sigma.dofmap)                   # (c, lS)
        self.I = f(np.eye(self.d))
        self.last_cg_iters = None

    def _T_at_q(self, arr):
        """T-space dof array -> (c, q) values at elasticity quad points."""
        return jnp.einsum("ql,cl->cq", self.tab_T, arr[self.dof_T])

    def _S_at_q(self, arr):
        """sigma-space dof array (n, ...) -> (c, q, ...) at quad points."""
        vals = arr[self.dof_S]                            # (c, lS, ...)
        return jnp.einsum("ql,cl...->cq...", self.tab_S, vals)

    def __call__(self, state, xi, scalar_th):
        """Return the mechanical strain eps(du) at the sigma-space dofs.

        xi, scalar_th: T-space dof arrays (scaled time; thermal strain
        scalar, mode-consistent). state provides the decayed history.
        """
        eng = self.engine
        xi_q = self._T_at_q(xi)                            # (c, q)
        th_q = self._T_at_q(scalar_th)
        eps0_q = th_q[..., None, None] * self.I            # (c, q, d, d)
        # effective tangent moduli from the Prony tableau at xi (the same
        # relax factor the stress update uses, mode-consistent)
        G_eff = jnp.sum(
            eng.g_n[None, None, :]
            * eng._relax_factor(xi_q[..., None] / eng.lambda_g_n[None, None, :]),
            axis=-1)
        K_eff = jnp.sum(
            eng.k_n[None, None, :]
            * eng._relax_factor(xi_q[..., None] / eng.lambda_k_n[None, None, :]),
            axis=-1)
        # decayed history stress at quad points (matches the engine's
        # eq. 16a/b decay with the mode's source fields)
        ref = eng.mode == "reference"
        s_src = state.s_tilde if ref else state.s_partial
        sig_src = state.sigma_tilde if ref else state.sigma_partial
        xi_dofs_S = eng.to_sigma.eval("T", xi)             # (nS,)
        texp_g = eng._decay(
            xi_dofs_S[:, None] / eng.lambda_g_n[None, :])[:, :, None, None]
        texp_k = eng._decay(
            xi_dofs_S[:, None] / eng.lambda_k_n[None, :])[:, :, None, None]
        sigma_hist = jnp.sum(s_src * texp_g + sig_src * texp_k, axis=1)
        sigma_hist_q = self._S_at_q(sigma_hist)            # (c, q, d, d)

        du, iters = self.elast.solve_increment(
            sigma_hist_q, eps0_q, G_eff, K_eff,
            rtol=self.cg_rtol, max_it=self.cg_max_it)
        self.last_cg_iters = iters
        return self.elast.strain_at_sigma_dofs(du)
