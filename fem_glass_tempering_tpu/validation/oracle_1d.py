"""Independent 1D oracle for the default tempering workload.

A second, from-scratch implementation of the reference's algorithm
(/root/reference/ThermoViscoProblem.py + ViscoelasticModel.py) in pure
numpy + scipy.sparse:

- hand-integrated DG-1/CG-1 element matrices (the framework assembles via
  quadrature einsum + segment_sum instead),
- explicit sparse SIPG matrix for the interior-penalty terms
  (ThermoViscoProblem.py:308-326; the framework evaluates them matrix-free),
- Newton with an ASSEMBLED exact sparse Jacobian and scipy spsolve
  (direct; the framework is matrix-free Newton-CG with jvp actions),
- the viscoelastic cascade written directly from the reference's
  expression definitions (ViscoelasticModel.py:86-230) in plain numpy.

Because no assembly/solver/material code is shared with the framework,
agreement of the two implementations over a full transient is genuine
differential evidence (the role BASELINE.md assigns to a dolfinx run,
which is not installable in this environment: no dolfinx wheel, no
docker, zero egress). Conventions that are *data*, not algorithm — mesh
nodes, the '+' = lower-cell-index facet restriction, the
highest-cell-wins cross-space evaluation order — are matched explicitly
and documented inline, exactly as the dolfinx comparison would have to
match mesh and dof ordering.

Semantics replicated (reference quirks included, SURVEY.md §Quirks):
- phi = exp(H/Rg (1/Tb - 1/T)) (eq. 5, the live dict-overwrite winner),
- xi = dt/2 (phi_next - phi) as coded (minus sign),
- Tf_prev is rotated before the thermal strain evaluates, so the
  (alpha_l - alpha_s) dTf term vanishes at runtime,
- s_tilde/sigma_tilde start at zero and only ever decay, so stress
  carries no history: sigma = sum_n (ds_n + dsigma_n),
- 0.001 scale on both boundary flux terms, SIPG penalty 5.0 with
  h('+') = diameter of the '+' cell.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

# Prony tableaus (Nielsen et al., reference ViscoelasticModel.py:19-68).
# Physical constants, i.e. shared *data* — required for parity.
_M_N = np.array([5.523e-2, 8.205e-2, 1.215e-1, 2.286e-1, 2.860e-1, 2.265e-1])
_LAM_M = np.array([5.965e-4, 1.077e-2, 1.362e-1, 1.505e-1, 6.747e0, 2.963e1])
_G_N = np.array([1.585, 2.354, 3.486, 6.558, 8.205, 6.498])
_LAM_G = np.array([6.658e-5, 1.197e-3, 1.514e-2, 1.672e-1, 7.497e-1, 3.292e0])
_K_N = np.array([7.588e-1, 7.650e-1, 9.806e-1, 7.301e0, 1.347e1, 1.090e1])
_LAM_K = np.array([5.009e-5, 9.945e-4, 2.022e-3, 1.925e-2, 1.199e-1, 2.033e0])

DEFAULT_PARAMS = dict(
    f=0.0, epsilon=0.93, sigma=5.670e-8, T_ambient=600.0, T_0=800.0,
    alpha=1.0, htc=280.1, H=627.8e3, Tb=869.0, Rg=8.314,
    alpha_solid=9.10e-6, alpha_liquid=25.10e-6,
    boundary_scale=0.001, dg_penalty=5.0,
)


class _HeatDiscretization1D:
    """Sparse backward-Euler heat discretization on a 1D mesh: F(T) =
    M (T - T_prev) + dt (A T - b_f + g(T)) with A = alpha*(K + SIPG)."""

    def __init__(self, nodes: np.ndarray, family: str, p: dict, dt: float):
        assert family in ("CG", "DG")
        self.p = p
        self.dt = float(dt)
        self.family = family
        x = np.asarray(nodes, dtype=np.float64).reshape(-1)
        nc = len(x) - 1
        h = np.diff(x)
        self.nc, self.h, self.x = nc, h, x
        if family == "DG":
            self.ndof = 2 * nc
            dofmap = np.stack([2 * np.arange(nc), 2 * np.arange(nc) + 1], 1)
        else:
            self.ndof = nc + 1
            dofmap = np.stack([np.arange(nc), np.arange(nc) + 1], 1)
        self.dofmap = dofmap

        # mass + stiffness from the exact linear-element integrals
        rows, cols, mv, kv = [], [], [], []
        Me = np.array([[2.0, 1.0], [1.0, 2.0]]) / 6.0
        Ke = np.array([[1.0, -1.0], [-1.0, 1.0]])
        for c in range(nc):
            d = dofmap[c]
            for a in range(2):
                for b in range(2):
                    rows.append(d[a]); cols.append(d[b])
                    mv.append(h[c] * Me[a, b]); kv.append(Ke[a, b] / h[c])
        n = self.ndof
        self.M = sp.csr_matrix((mv, (rows, cols)), shape=(n, n))
        K = sp.csr_matrix((kv, (rows, cols)), shape=(n, n))

        if family == "DG":
            K = K + self._sipg_matrix()
        self.A = p["alpha"] * K

        # source load vector: f * v dx, exact for constant f
        bf = np.zeros(n)
        np.add.at(bf, dofmap[:, 0], 0.5 * h * p["f"])
        np.add.at(bf, dofmap[:, 1], 0.5 * h * p["f"])
        self.b_f = bf

        # boundary dofs (1D exterior facets are the two endpoints; the
        # boundary integrand is a point evaluation with unit weight)
        self.bdofs = np.array([dofmap[0, 0], dofmap[nc - 1, 1]])

    def _sipg_matrix(self) -> sp.csr_matrix:
        """SIPG interior-facet terms as an explicit sparse matrix.

        Convention matched as *data*: '+' = lower cell index (the left
        cell), h('+') = that cell's diameter, exactly the reference's
        arbitrary-but-fixed dolfinx restriction and the framework's
        documented choice. At the interior vertex between cells c ('+')
        and c+1 ('-'): jump(u,n) = u+ - u-, avg(u') = (u+' + u-')/2.
        """
        pen = self.p["dg_penalty"]
        nc, h = self.nc, self.h
        rows, cols, vals = [], [], []

        def add(r, c, v):
            rows.append(r); cols.append(c); vals.append(v)

        for c in range(nc - 1):
            hp = h[c]
            hm = h[c + 1]
            # dofs: [2c, 2c+1 | 2c+2, 2c+3]; traces at the shared vertex:
            # u+ = u[2c+1], u- = u[2c+2];
            # u+' = (u[2c+1]-u[2c])/hp, u-' = (u[2c+3]-u[2c+2])/hm
            dofs = [2 * c, 2 * c + 1, 2 * c + 2, 2 * c + 3]
            tr = np.array([0.0, 1.0, -1.0, 0.0])          # jump(v) weights
            gp = np.array([-1.0 / hp, 1.0 / hp, 0.0, 0.0])  # v+' weights
            gm = np.array([0.0, 0.0, -1.0 / hm, 1.0 / hm])  # v-' weights
            ag = 0.5 * (gp + gm)                           # avg(v')
            # (pen/h+)*jump(v)*jump(T) - avg(v')*jump(T) - jump(v)*avg(T')
            for a in range(4):
                for b in range(4):
                    v = (pen / hp) * tr[a] * tr[b] \
                        - ag[a] * tr[b] - tr[a] * ag[b]
                    if v != 0.0:
                        add(dofs[a], dofs[b], v)
        n = self.ndof
        return sp.csr_matrix((vals, (rows, cols)), shape=(n, n))

    # -- nonlinear boundary flux g(T) = s*(sig*eps*(T^4-Ta^4)+htc*(T-Ta)) --
    def _flux(self, Tb):
        p = self.p
        return p["boundary_scale"] * (
            p["sigma"] * p["epsilon"] * (Tb ** 4 - p["T_ambient"] ** 4)
            + p["htc"] * (Tb - p["T_ambient"]))

    def _dflux(self, Tb):
        p = self.p
        return p["boundary_scale"] * (
            4.0 * p["sigma"] * p["epsilon"] * Tb ** 3 + p["htc"])

    def residual(self, T, T_prev):
        F = self.M @ (T - T_prev) + self.dt * (self.A @ T - self.b_f)
        F[self.bdofs] += self.dt * self._flux(T[self.bdofs])
        return F

    def newton(self, T_prev, rtol=1e-12, atol=1e-14, max_it=50):
        """Assembled-Jacobian Newton + sparse direct solve, incremental
        criterion (reference ThermoViscoProblem.py:335-336)."""
        T = T_prev.copy()
        lin = (self.M + self.dt * self.A).tocsr()
        for _ in range(max_it):
            F = self.residual(T, T_prev)
            J = lin.tolil(copy=True)
            for d in self.bdofs:
                J[d, d] += self.dt * self._dflux(T[d])
            du = spla.spsolve(J.tocsr(), -F)
            T = T + du
            if np.linalg.norm(du) <= rtol * np.linalg.norm(T) + atol:
                return T
        raise RuntimeError("oracle Newton did not converge")


def run_oracle(nodes: np.ndarray, n_steps: int, dt: float,
               params: dict | None = None, T_family: str = "DG",
               literal_fp: bool = False) -> dict:
    """Run the full coupled transient; return final fields.

    Spaces: T on `T_family`-1 (reference default DG-1, main.py:25), all
    material tensors at the CG-1 vertices (sigma space, main.py:26). In 1D
    tensors are 1x1 scalars; the deviatoric branch is identically zero
    (dev = total - tr(total)*I in dim 1), so sigma is hydrostatic-only —
    the oracle still evaluates the full ds/dsigma chain.
    """
    p = dict(DEFAULT_PARAMS, **(params or {}))
    heat = _HeatDiscretization1D(nodes, T_family, p, dt)
    x = heat.x
    nT = heat.ndof
    nS = len(x)                       # CG-1 vertices
    nc = heat.nc

    # cross-space evaluation T-space -> sigma vertices. Data convention
    # matched to sequential per-cell interpolation overwrite order
    # (highest cell index wins): vertex i is evaluated in cell i (its left
    # trace dof in DG), the last vertex in cell nc-1 (right trace).
    if T_family == "DG":
        eval_idx = np.concatenate([2 * np.arange(nc), [2 * nc - 1]])
    else:
        eval_idx = np.arange(nS)

    H_Rg, Tb_ = p["H"] / p["Rg"], p["Tb"]
    phi_of = lambda T: np.exp(H_Rg * (1.0 / Tb_ - 1.0 / T))
    texp = lambda y: 1.0 - y + 0.5 * y * y   # 3-term Taylor of exp(-y)

    T = np.full(nT, p["T_0"])
    T_prev = T.copy()
    Tf_partial = np.full((nT, 6), p["T_0"])
    Tf = np.full(nT, p["T_0"])
    s_tilde = np.zeros((nS, 6))       # 1x1 tensors stored as scalars
    sigma_tilde = np.zeros((nS, 6))
    sigma = np.zeros(nS)
    phi = np.zeros(nT)
    xi = np.zeros(nT)

    for _ in range(n_steps):
        T = heat.newton(T_prev)

        # --- Tf chain (reference _solve_Tf, ThermoViscoProblem.py:393-407)
        phi = phi_of(T)
        Tf_partial = (_LAM_M[None, :] * Tf_partial
                      + (T * dt * phi)[:, None]) / (
                      _LAM_M[None, :] + (dt * phi)[:, None])      # eq. 24
        Tf = Tf_partial @ _M_N                                     # eq. 26
        # quirk: Tf_prev is rotated HERE, before the strain evaluates,
        # so dTf == 0 in the thermal strain below.

        # --- strains (at sigma vertices); T_prev not yet rotated
        dT_s = (T - T_prev)[eval_idx]
        thermal = p["alpha_solid"] * dT_s                          # eq. 9
        total = -thermal                                           # eq. 28
        # eq. 29: dev = total - (1/dim) tr(total) I == 0 in 1D
        tr_total = total

        # --- shifted time (reference _solve_shifted_time, :426-435)
        T_next = 2.0 * T - T_prev
        phi_next = phi_of(T_next)
        xi = 0.5 * dt * (phi_next - phi)            # eq. 19 as coded (minus)
        xi_s = xi[eval_idx]

        # --- stress chain (reference _solve_stress, :438-452). Eq. 15
        # increment factor (lam/xi)(1 - texp(xi/lam)). The literal form
        # cancels catastrophically for tiny xi/lam (1 - texp(y) == y - y^2/2
        # computed by subtracting from 1 loses ~eps/y relative digits — fp
        # noise the reference's own output carries, ~1e-6 relative here);
        # the default expands it exactly: (lam/xi)(y - y^2/2) == 1 - y/2.
        y_k = xi_s[:, None] / _LAM_K[None, :]
        if literal_fp:
            with np.errstate(divide="ignore", invalid="ignore"):
                fac_k = np.where(
                    xi_s[:, None] == 0.0, 1.0 - 0.5 * y_k,
                    (_LAM_K[None, :] / xi_s[:, None]) * (1.0 - texp(y_k)))
        else:
            fac_k = 1.0 - 0.5 * y_k
        dsig = _K_N[None, :] * tr_total[:, None] * fac_k           # eq. 15b
        # deviatoric branch: dev == 0 in 1D, ds == 0 (evaluated for shape)
        ds = np.zeros_like(dsig)                                   # eq. 15a
        s_tilde = s_tilde * texp(xi_s[:, None] / _LAM_G[None, :])  # eq. 16a
        sigma_tilde = sigma_tilde * texp(y_k)                      # eq. 16b
        s_part = ds + s_tilde                                      # eq. 17a
        sig_part = dsig + sigma_tilde                              # eq. 17b
        sigma = (s_part + sig_part).sum(axis=1)                    # eq. 18

        T_prev = T.copy()  # rotated at end of step (:378-379)

    cells = np.stack([np.arange(nc), np.arange(nc) + 1], 1)
    return dict(x_T=x[cells].reshape(-1) if T_family == "DG" else x,
                T=T, Tf=Tf, Tf_partial=Tf_partial, phi=phi, xi=xi,
                x_s=x, sigma=sigma)
