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


class DGNodeMechAdapter:
    """Adapts GridMechanicsCoupling to a DG T space: the elasticity solve
    lives on the sigma-space NODE grid, so the DG dof arrays (xi,
    thermal-strain scalar) are converted through the T->sigma cross-eval
    (last-cell-wins vertex map) first — the same semantics as the sharded
    DG path (parallel/grid_shard.py), which makes single-device and
    sharded DG mechanics agree to solver tolerance."""

    def __init__(self, inner, ev):
        self.inner = inner
        self._ev = ev

    def __call__(self, state, xi, scalar_th, precond=None):
        return self.inner(state, self._ev("T", xi),
                          self._ev("T", scalar_th), precond=precond)

    def build_precond(self, state):
        return self.inner.build_precond(
            state._replace(xi=self._ev("T", state.xi)))


class MechanicsCoupling:
    def __init__(self, fs_T: FunctionSpace, fs_sigma: FunctionSpace,
                 engine, dtype=jnp.float64, cg_rtol: float = 1e-10,
                 cg_max_it: int = 2000, inc_rtol: float = 0.0):
        self.engine = engine
        self.d = fs_T.mesh.tdim
        self.elast = ElasticityOperator(fs_sigma, dtype=dtype)
        self.cg_rtol = cg_rtol
        self.cg_max_it = cg_max_it
        self.inc_rtol = inc_rtol
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

    def build_precond(self, state):
        """Gather-path coupling has no lagged preconditioner (Jacobi-CG
        only) — duck-typed no-op matching GridMechanicsCoupling."""
        return None

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
            rtol=self.cg_rtol, max_it=self.cg_max_it,
            x0=getattr(state, "du", None), rtol_r0=self.inc_rtol)
        self.last_cg_iters = iters
        return self.elast.strain_at_sigma_dofs(du), du


class GridMechanicsCoupling:
    """Gather-free equilibrium mechanics on uniform box meshes
    (ops/grid_elasticity.py): the same coupling as MechanicsCoupling,
    expressed entirely in grid-shaped static-slice/einsum ops, so it runs
    inside the GSPMD-sharded step (parallel/grid_shard.py) and as the
    fast path of the single-device grid-native solve.

    `grid_shaped=True` (the sharded path) takes/returns (*grid, ...)
    arrays directly; False adapts the flat (n, ...) ViscoState layout by
    reshaping at the boundary (free on a single device)."""

    def __init__(self, fs_sigma, engine, dtype=jnp.float32,
                 cg_rtol: float = 1e-10, cg_max_it: int = 2000,
                 pad_axis0: int = 0, grid_shaped: bool = False,
                 preconditioner: str = "mg", inc_rtol: float = 0.0,
                 use_tables: bool = True):
        from fem_glass_tempering_tpu.ops.grid_elasticity import (
            GridElasticityOperator,
        )
        from fem_glass_tempering_tpu.solver.krylov import pcg

        self._pcg = pcg
        self.engine = engine
        self.el = GridElasticityOperator(fs_sigma, dtype=dtype,
                                         pad_axis0=pad_axis0)
        self.d = self.el.d
        self.cg_rtol = cg_rtol
        self.cg_max_it = cg_max_it
        self.inc_rtol = inc_rtol
        # materialized block-stencil tables for the CG/V-cycle matvecs
        # (ops/grid_elasticity.py stencil_table_g; A/B: cell recompute)
        self.use_tables = use_tables
        self.grid_shaped = grid_shaped
        self.I = jnp.eye(self.d, dtype=dtype)
        self.last_cg_iters = None
        # vector geometric MG: mandatory in practice — Jacobi-CG stalls on
        # thin plates (2000+ unconverged iterations measured at aspect 50)
        self.mg = None
        if preconditioner == "mg":
            from fem_glass_tempering_tpu.solver.grid_mg import GridElastMG

            def make_level_op(level_mesh):
                fsl = FunctionSpace(level_mesh, "CG", 1,
                                    value_shape=(self.d, self.d))
                return GridElasticityOperator(fsl, dtype=dtype)

            # frozen instantaneous moduli for the dense coarse solve
            # (xi = 0: relax factor = 1 -> G = sum g_n, K = sum k_n).
            # Only valid in trapezoid-xi mode: the reference-parity Taylor
            # relax factor 1 - y/2 goes NEGATIVE for y > 2, flipping the
            # operator's sign — a positive frozen coarse inverse then
            # breaks CG outright (measured: 10 -> no convergence)
            frozen = None
            if engine.xi_formula == "trapezoid":
                # numpy tableau source, NOT engine.g_n/k_n: those are
                # device arrays and the first device->host readback in a
                # process costs ~1 min flat here (66 s measured on this
                # very line for a 6-element array)
                tb = engine.tableaus
                frozen = (float(np.sum(tb.g_n)), float(np.sum(tb.k_n)))
            self.mg = GridElastMG(self.el, make_level_op,
                                  frozen_moduli=frozen,
                                  use_tables=use_tables)

    def _moduli_at(self, xi_g):
        """Effective Prony tangent moduli (G_q, K_q) at the scaled-time
        field xi_g (grid-shaped nodal values -> per-cell-quad)."""
        eng = self.engine
        xi_q = self.el.cell_avg_from_nodes(xi_g)          # (*dims, q)
        G_eff = jnp.sum(
            eng.g_n * eng._relax_factor(
                xi_q[..., None] / eng.lambda_g_n), axis=-1)
        K_eff = jnp.sum(
            eng.k_n * eng._relax_factor(
                xi_q[..., None] / eng.lambda_k_n), axis=-1)
        return G_eff, K_eff

    def build_precond(self, state):
        """Frozen elasticity PRECONDITIONER at the chunk-start state (the
        mechanics analog of SolverConfig.jac_every, VERDICT r4 #2): the
        V-cycle build — per-level block-stencil tables, column-smoother
        block-Thomas factorizations, power-iteration spectrum bounds —
        was measured as a 30.9 ms/step PROLOGUE rebuilt every step at
        64x64x16 (examples/profile_mech.py) for a quasi-static solve
        whose tangents barely move between steps. The CG SYSTEM stays
        exact: matvec/rhs/diag are rebuilt fresh per step in __call__;
        only the preconditioner closure is reused, which perturbs
        iteration counts, never the solution. Returns None when no MG is
        configured."""
        if self.mg is None:
            return None
        xi = state.xi
        if not self.grid_shaped:
            xi = xi.reshape(self.el.grid)
        G_eff, K_eff = self._moduli_at(xi)
        return self.mg.preconditioner_g(G_eff, K_eff)

    def __call__(self, state, xi, scalar_th, precond=None):
        el = self.el
        eng = self.engine
        grid = el.grid
        d = self.d
        if self.grid_shaped:
            xi_g = xi
            th_g = scalar_th
        else:
            xi_g = xi.reshape(grid)
            th_g = scalar_th.reshape(grid)

        th_q = el.cell_avg_from_nodes(th_g)
        eps0_q = th_q[..., None, None] * self.I
        G_eff, K_eff = self._moduli_at(xi_g)

        # decayed history stress at the nodes, then at quad points
        ref = eng.mode == "reference"
        s_src = state.s_tilde if ref else state.s_partial
        sig_src = state.sigma_tilde if ref else state.sigma_partial
        if not self.grid_shaped:
            s_src = s_src.reshape(grid + s_src.shape[1:])
            sig_src = sig_src.reshape(grid + sig_src.shape[1:])
        texp_g = eng._decay(
            xi_g[..., None] / eng.lambda_g_n)[..., None, None]
        texp_k = eng._decay(
            xi_g[..., None] / eng.lambda_k_n)[..., None, None]
        sigma_hist = jnp.sum(s_src * texp_g + sig_src * texp_k, axis=-3)
        sigma_hist_q = el.tensor_at_q(sigma_hist)         # (*dims, q, d, d)

        zero = jnp.zeros(grid + (d,), dtype=G_eff.dtype)
        b = -el.residual_g(zero, sigma_hist_q, eps0_q, G_eff, K_eff)
        if self.use_tables:
            tbl = el.stencil_table_g(G_eff, K_eff)
            mv = lambda v: el.matvec_table_g(tbl, v)
        else:
            tbl = None
            mv = el.make_matvec_g(G_eff, K_eff)
        diag = el.jacobian_diag_g(G_eff, K_eff)
        if precond is None and self.mg is not None:
            precond = self.mg.preconditioner_g(G_eff, K_eff,
                                               fine_table=tbl)
        # warm start from the previous step's displacement (state.du):
        # the quasi-static solution drifts slowly between steps, and
        # pcg's convergence test stays relative to ||b|| — same accuracy,
        # far fewer iterations through the transient
        du_prev = getattr(state, "du", None)
        x0 = None
        if du_prev is not None:
            x0 = (du_prev if self.grid_shaped
                  else du_prev.reshape(grid + (d,))).astype(b.dtype)
        res = self._pcg(mv, b, x0=x0, diag=diag, precond=precond,
                        rtol=self.cg_rtol, max_it=self.cg_max_it,
                        rtol_r0=self.inc_rtol)
        self.last_cg_iters = res.iters
        eps = el.strain_at_nodes(res.x)                   # (*grid, d, d)
        if self.grid_shaped:
            return eps, res.x
        return eps.reshape(-1, d, d), res.x.reshape(-1, d)
