"""Tool-Narayanaswamy / Prony-series viscoelastic tempering engine.

TPU-native re-design of the reference's per-step expression cascade
(ViscoelasticModel.py:86-230 + the ~15 interpolate calls in
ThermoViscoProblem.py:455-595): the whole chain is ONE fused pointwise
function over dof arrays — T-space quantities (shift function, fictive
temperatures, scaled time) on (n_T,) arrays, strain/stress quantities on
(n_S, dim, dim) arrays at the sigma-space points, with the 6-term Prony
tableau as a leading broadcast axis. Under jit, XLA fuses it into a few
elementwise kernels; a hand-fused Pallas version lives in ops/pallas_kernels.

Update chain per step (Nielsen et al. eq. numbers as cited by the reference):
  phi      = exp(H/Rg (1/Tb - 1/T))                                 [eq. 5]
  Tf_p[n]  = (lam_m[n] Tf_p_prev[n] + T dt phi) / (lam_m[n] + dt phi) [eq. 24]
  Tf       = sum_n m[n] Tf_p[n]                                     [eq. 26]
  eps_th   = I (a_s dT + (a_l - a_s) dTf)                           [eq. 9]
  eps_tot  = -eps_th                                                [eq. 28]
  eps_dev  = eps_tot - (1/dim) I tr(eps_tot)                        [eq. 29]
  T_next   = 2 T - T_prev (linear predictor)
  xi       = dt/2 (phi(T_next) - phi(T))                            [eq. 19 as coded]
  texp(y)  = 1 - y + y^2/2   (3-term Taylor of exp(-y))             [eq. 20]
  ds[n]    = 2 g[n] eps_dev (1 - xi/(2 lam_g[n]))                   [eq. 15a+20]
  dsig[n]  = k[n] tr(eps_tot) I (1 - xi/(2 lam_k[n]))               [eq. 15b+20]
  s~[n]'   = decay_src[n] * texp(xi/lam_g[n])                       [eq. 16a]
  s[n]'    = ds[n] + s~[n]'                                         [eq. 17a]
  sigma    = sum_n (s[n]' + sig[n]')                                [eq. 18]

ds/dsig use the algebraically identical singularity-free form
(dev/xi)*lam*(1-texp(xi/lam)) == dev*(1 - xi/(2 lam)) — exact for the 3-term
Taylor, no 0/0 at xi=0 (the reference divides and would NaN at xi==0).

physics_mode:
  'reference' — byte-faithful to the reference's *runtime* semantics,
    including two rotation quirks we verified in its update ordering:
    (a) Tf_prev is overwritten with Tf BEFORE the thermal strain evaluates
        (ThermoViscoProblem.py:475-484 rotates, then :487-496 interpolates),
        so the (a_l - a_s) dTf term is identically zero at runtime;
    (b) the decayed stresses s~/sig~ start at 0 and are only ever multiplied
        by texp (ThermoViscoProblem.py:552-562: s_tilde_next is computed from
        s_tilde_current, never from s_partial), so they remain 0 and stress
        never accumulates history: sigma = sum_n (ds[n] + dsig[n]).
  'corrected' — the literature semantics: dTf uses the step-start Tf, and
    the decay recursion reads the accumulated partial stress,
    s~[n]' = s[n] * texp, so stress history integrates properly.

shift_function: 'eq5' (Arrhenius, the live definition after the reference's
dict-overwrite at ViscoelasticModel.py:156-161) or 'eq25' (the chi-weighted
Tool-Narayanaswamy form from the dead first definition at :100-108).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fem_glass_tempering_tpu.config import ModelParams
from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace
from fem_glass_tempering_tpu.ops.interpolation import build_cross_eval


# 6-term Prony tableaus for float glass (Nielsen et al., as carried by the
# reference ViscoelasticModel.py:19-68): structural weights/relax times,
# shear moduli/relax times, bulk moduli/relax times.
TABLEAU_SIZE = 6
M_N = np.array([5.523e-2, 8.205e-2, 1.215e-1, 2.286e-1, 2.860e-1, 2.265e-1])
LAMBDA_M_N = np.array([5.965e-4, 1.077e-2, 1.362e-1, 1.505e-1, 6.747e0, 2.963e1])
G_N = np.array([1.585, 2.354, 3.486, 6.558, 8.205, 6.498])
LAMBDA_G_N = np.array([6.658e-5, 1.197e-3, 1.514e-2, 1.672e-1, 7.497e-1, 3.292e0])
K_N = np.array([7.588e-1, 7.650e-1, 9.806e-1, 7.301e0, 1.347e1, 1.090e1])
LAMBDA_K_N = np.array([5.009e-5, 9.945e-4, 2.022e-3, 1.925e-2, 1.199e-1, 2.033e0])


@dataclass(frozen=True)
class PronyTableaus:
    m_n: np.ndarray
    lambda_m_n: np.ndarray
    g_n: np.ndarray
    lambda_g_n: np.ndarray
    k_n: np.ndarray
    lambda_k_n: np.ndarray

    @staticmethod
    def nielsen() -> "PronyTableaus":
        return PronyTableaus(M_N, LAMBDA_M_N, G_N, LAMBDA_G_N, K_N, LAMBDA_K_N)


class ViscoState(NamedTuple):
    """Full per-step field state (the reference's 22 Function allocations,
    ThermoViscoProblem.py:106-173, §2d of SURVEY.md) as a flat pytree of
    dof arrays. Shapes: (n_T,) scalars on the T space; (n_S, d, d) tensors
    at the sigma-space points; tableau axis leads where present."""

    t: jnp.ndarray                 # () current time
    T: jnp.ndarray                 # (n_T,) current temperature
    T_prev: jnp.ndarray            # (n_T,)
    Tf: jnp.ndarray                # (n_T,) fictive temperature
    Tf_prev: jnp.ndarray           # (n_T,)
    Tf_partial: jnp.ndarray        # (n_T, 6)
    phi: jnp.ndarray               # (n_T,) shift function
    xi: jnp.ndarray                # (n_T,) scaled-time increment
    thermal_strain: jnp.ndarray    # (n_S, d, d)
    total_strain: jnp.ndarray      # (n_S, d, d)
    deviatoric_strain: jnp.ndarray # (n_S, d, d)
    s_tilde: jnp.ndarray           # (n_S, 6, d, d) decayed deviatoric partials
    sigma_tilde: jnp.ndarray       # (n_S, 6, d, d) decayed hydrostatic partials
    s_partial: jnp.ndarray         # (n_S, 6, d, d) total deviatoric partials
    sigma_partial: jnp.ndarray     # (n_S, 6, d, d) total hydrostatic partials
    sigma: jnp.ndarray             # (n_S, d, d) total stress
    # (n_S, d) displacement of the last equilibrium-mechanics solve;
    # warm-starts the next step's elasticity CG (zeros when mechanics off)
    du: jnp.ndarray | None = None


class ViscoelasticEngine:
    """Builds the fused material step for a (T-space, sigma-space) pair."""

    def __init__(self, fs_T: FunctionSpace, fs_sigma: FunctionSpace,
                 params: ModelParams, dt: float, *,
                 tableaus: PronyTableaus | None = None,
                 physics_mode: str = "reference",
                 shift_function: str = "eq5",
                 xi_formula: str = "reference",
                 use_pallas: bool = False,
                 dtype=jnp.float64):
        if physics_mode not in ("reference", "corrected"):
            raise ValueError(physics_mode)
        if shift_function not in ("eq5", "eq25"):
            raise ValueError(shift_function)
        if xi_formula not in ("reference", "trapezoid"):
            raise ValueError(xi_formula)
        # 'reference': xi = dt/2 (phi_next - phi) as coded by the reference
        # (SURVEY.md §Quirks 4) — NEGATIVE while cooling, so the 'decay'
        # factor exceeds 1 and no true relaxation happens. 'trapezoid':
        # xi = dt/2 (phi_next + phi), the physical shifted-time increment
        # (positive; hot glass relaxes, cold glass freezes) — required for
        # residual-stress inversion in full tempering runs.
        self.xi_formula = xi_formula
        # hand-fused Pallas path for the T-space chain (eq5 + reference-xi).
        # "auto" resolves to off: the XLA-fused chain matches the hand
        # kernel at every measured size (BENCH.md); the kernel stays as a
        # validated opt-in (use_pallas=True)
        if use_pallas == "auto":
            use_pallas = False
        self.use_pallas = (bool(use_pallas) and shift_function == "eq5"
                           and xi_formula == "reference")
        self.fs_T = fs_T
        self.fs_sigma = fs_sigma
        self.params = params
        self.dt = float(dt)
        self.mode = physics_mode
        self.shift_function = shift_function
        self.dtype = dtype
        self.dim = fs_T.mesh.tdim
        tb = tableaus or PronyTableaus.nielsen()
        self.tableaus = tb        # numpy source: setup-time consumers
        # (mechanics frozen moduli) must not read the device copies back
        f = lambda a: jnp.asarray(a, dtype=dtype)
        self.m_n = f(tb.m_n)
        self.lambda_m_n = f(tb.lambda_m_n)
        self.g_n = f(tb.g_n)
        self.lambda_g_n = f(tb.lambda_g_n)
        self.k_n = f(tb.k_n)
        self.lambda_k_n = f(tb.lambda_k_n)
        # evaluator of T-space fields at sigma-space interpolation points
        # (the reference's cross-space Expression interpolation, SURVEY.md §3.5)
        self.to_sigma = build_cross_eval(fs_sigma, {"T": fs_T})
        self.I = f(np.eye(self.dim))

    # ------------------------------------------------------------------
    def init_state(self) -> ViscoState:
        """Initial conditions (reference ThermoViscoProblem.py:187-233):
        T = Tf = Tf_partial[n] = T_0 everywhere; all stresses zero."""
        p = self.params
        nT = self.fs_T.n_scalar_dofs
        nS = self.fs_sigma.n_scalar_dofs
        d = self.dim
        # numpy + device_put, NOT jnp.full: each eager fill compiles a tiny
        # program — ~8 distinct shapes per init through the remote-TPU
        # tunnel is tens of seconds of pure compile latency
        f = lambda shape, v=0.0: jax.device_put(
            np.full(shape, v, dtype=np.dtype(self.dtype)))
        return ViscoState(
            t=jnp.asarray(0.0, dtype=self.dtype),
            T=f((nT,), p.T_0),
            T_prev=f((nT,), p.T_0),
            Tf=f((nT,), p.T_0),
            Tf_prev=f((nT,), p.T_0),
            Tf_partial=f((nT, TABLEAU_SIZE), p.T_0),
            phi=f((nT,)),
            xi=f((nT,)),
            thermal_strain=f((nS, d, d)),
            total_strain=f((nS, d, d)),
            deviatoric_strain=f((nS, d, d)),
            s_tilde=f((nS, TABLEAU_SIZE, d, d)),
            sigma_tilde=f((nS, TABLEAU_SIZE, d, d)),
            s_partial=f((nS, TABLEAU_SIZE, d, d)),
            sigma_partial=f((nS, TABLEAU_SIZE, d, d)),
            sigma=f((nS, d, d)),
            du=f((nS, d)),
        )

    # ------------------------------------------------------------------
    def _phi_of(self, T, Tf_prev):
        p = self.params
        if self.shift_function == "eq5":
            return jnp.exp(p.H / p.Rg * (1.0 / p.Tb - 1.0 / T))
        # eq. 25: chi-weighted TN shift (the reference's dead first
        # definition, ViscoelasticModel.py:100-108)
        return jnp.exp(p.H / p.Rg * (
            1.0 / p.Tb - p.chi / T - (1.0 - p.chi) / Tf_prev
        ))

    @staticmethod
    def _taylor_exp(y):
        """3-term Taylor of exp(-y) (Nielsen eq. 20; reference
        ViscoelasticModel.py:233-242)."""
        return 1.0 - y + 0.5 * y * y

    def _decay(self, y):
        """Stress decay factor e^{-y}: Taylor in reference-xi mode (parity;
        only valid for |y| << 1), exact exponential in trapezoid mode
        (xi/lambda reaches 1e4+ above the transition, where the Taylor
        explodes)."""
        if self.xi_formula == "reference":
            return self._taylor_exp(y)
        return jnp.exp(-y)

    def _relax_factor(self, y):
        """(lambda/xi)(1 - e^{-xi/lambda}), the eq. 15 increment factor.
        Reference-xi mode uses the Taylor-consistent 1 - y/2; trapezoid mode
        the exact, singularity-free form (series for tiny y)."""
        if self.xi_formula == "reference":
            return 1.0 - 0.5 * y
        safe = jnp.where(jnp.abs(y) < 1e-8, 1.0, y)
        return jnp.where(jnp.abs(y) < 1e-8, 1.0 - 0.5 * y,
                         (1.0 - jnp.exp(-safe)) / safe)

    def material_step(self, state: ViscoState, T_new: jnp.ndarray,
                      dt=None, mech=None) -> ViscoState:
        return self.material_step_with(state, T_new, self.to_sigma.eval, dt,
                                       mech=mech)

    def material_step_with(self, state: ViscoState, T_new: jnp.ndarray,
                           ev, dt=None, mech=None) -> ViscoState:
        """Advance all material fields given the freshly solved temperature.

        Mirrors solve_timestep's post-heat cascade
        (ThermoViscoProblem.py:370-379) with the rotation semantics of the
        selected physics_mode. `ev(name, dof_array)` evaluates a T-space
        field at the sigma-space points — the default is the global
        CrossEval; the domain-decomposed path passes a device-local
        evaluator (parallel/domain.py). `mech(state, xi, scalar_th)` (see
        models/mechanics.py) returns `(eps(du), du)` at the sigma points
        — `du` is stored in the state and warm-starts the next step's
        elasticity CG; None reproduces the reference's no-equilibrium
        semantics (total strain = -thermal strain).
        """
        p = self.params
        dt = self.dt if dt is None else dt
        ref = self.mode == "reference"

        # ---- T-space pointwise chain ----
        if self.use_pallas:
            from fem_glass_tempering_tpu.ops.pallas_kernels import (
                material_tspace_pallas,
            )
            phi, Tf_partial, Tf, xi = material_tspace_pallas(
                T_new, state.T_prev, state.Tf_partial, dt=dt,
                H_over_Rg=p.H / p.Rg, Tb=p.Tb, m_n=self.m_n,
                lambda_m_n=self.lambda_m_n)
        else:
            phi = self._phi_of(T_new, state.Tf)       # shift function
            Tf_partial = (
                self.lambda_m_n * state.Tf_partial
                + (T_new * dt * phi)[..., None]
            ) / (self.lambda_m_n + (dt * phi)[..., None])             # eq. 24
            Tf = Tf_partial @ self.m_n                                 # eq. 26
            T_next = 2.0 * T_new - state.T_prev       # linear predictor
            phi_next = self._phi_of(T_next, Tf)
            if self.xi_formula == "reference":
                xi = 0.5 * dt * (phi_next - phi)                       # eq. 19 as coded
            else:
                xi = 0.5 * dt * (phi_next + phi)      # physical trapezoid

        # ---- evaluate T-space quantities at sigma-space points ----
        T_s = ev("T", T_new)
        T_prev_s = ev("T", state.T_prev)
        xi_s = ev("T", xi)
        if ref:
            # quirk (a): Tf_prev was already overwritten with Tf when the
            # thermal strain evaluates -> dTf term vanishes identically
            dTf_s = jnp.zeros_like(T_s)
        else:
            dTf_s = ev("T", Tf - state.Tf)

        # ---- strain chain (sigma-space points) ----
        dT_s = T_s - T_prev_s
        scalar_th = p.alpha_solid * dT_s + (p.alpha_liquid - p.alpha_solid) * dTf_s
        thermal_strain = scalar_th[..., None, None] * self.I           # eq. 9
        du_new = state.du
        if mech is None:
            total_strain = -thermal_strain                             # eq. 28
        else:
            # equilibrium mechanics: total = eps(du) - d_eps_th (the
            # reference's eq. 28 is the du = 0 special case)
            dTf_T = jnp.zeros_like(T_new) if ref else Tf - state.Tf
            scalar_th_T = (p.alpha_solid * (T_new - state.T_prev)
                           + (p.alpha_liquid - p.alpha_solid) * dTf_T)
            eps_mech, du_new = mech(state, xi, scalar_th_T)
            total_strain = eps_mech - thermal_strain
        tr_tot = jnp.trace(total_strain, axis1=-2, axis2=-1)
        deviatoric_strain = total_strain - (
            tr_tot[..., None, None] / self.dim
        ) * self.I                                                     # eq. 29

        # ---- Prony stress updates (tableau axis n broadcast) ----
        y_g = xi_s[..., None] / self.lambda_g_n                       # (..., 6)
        y_k = xi_s[..., None] / self.lambda_k_n
        texp_g = self._decay(y_g)[..., None, None]
        texp_k = self._decay(y_k)[..., None, None]
        # eq. 15a+20, singularity-free exact form
        ds = (2.0 * self.g_n[:, None, None]
              * deviatoric_strain[..., None, :, :]
              * self._relax_factor(y_g)[..., None, None])
        # eq. 15b+20
        dsig = (self.k_n[:, None, None]
                * (tr_tot[..., None, None] * self.I)[..., None, :, :]
                * self._relax_factor(y_k)[..., None, None])
        # eq. 16a/b: decay. reference mode decays s_tilde (which stays 0,
        # quirk (b)); corrected mode decays the accumulated partial stress.
        s_decay_src = state.s_tilde if ref else state.s_partial
        sig_decay_src = state.sigma_tilde if ref else state.sigma_partial
        s_tilde = s_decay_src * texp_g
        sigma_tilde = sig_decay_src * texp_k
        # eq. 17a/b
        s_partial = ds + s_tilde
        sigma_partial = dsig + sigma_tilde
        # eq. 18
        sigma = jnp.sum(s_partial + sigma_partial, axis=-3)

        return ViscoState(
            t=state.t + dt,
            T=T_new,
            T_prev=T_new,      # rotated at end of step (ThermoViscoProblem.py:378-379)
            Tf=Tf,
            Tf_prev=Tf,
            Tf_partial=Tf_partial,
            phi=phi,
            xi=xi,
            thermal_strain=thermal_strain,
            total_strain=total_strain,
            deviatoric_strain=deviatoric_strain,
            s_tilde=s_tilde,
            sigma_tilde=sigma_tilde,
            s_partial=s_partial,
            sigma_partial=sigma_partial,
            sigma=sigma,
            du=du_new,
        )
