"""Viscoelastic engine unit tests against hand-computed Nielsen-equation
values (SURVEY.md §4 test pyramid, level 1), plus mode-semantics checks."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from fem_glass_tempering_tpu.config import ModelParams
from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace
from fem_glass_tempering_tpu.fem.mesh import box_mesh_2d, interval_mesh
from fem_glass_tempering_tpu.models.viscoelastic import (
    LAMBDA_G_N,
    LAMBDA_K_N,
    LAMBDA_M_N,
    G_N,
    K_N,
    M_N,
    ViscoelasticEngine,
)

P = ModelParams()


def _phi(T):
    return np.exp(P.H / P.Rg * (1.0 / P.Tb - 1.0 / T))


def _engine_1d(mode="reference", dt=0.1):
    m = interval_mesh(4, 0.0, 1.0)
    fs_T = FunctionSpace(m, "DG", 1)
    fs_s = FunctionSpace(m, "CG", 1, value_shape=(1, 1))
    return ViscoelasticEngine(fs_T, fs_s, P, dt, physics_mode=mode)


def _engine_2d(mode="reference", dt=0.1):
    m = box_mesh_2d(2, 2)
    fs_T = FunctionSpace(m, "CG", 1)
    fs_s = FunctionSpace(m, "CG", 1, value_shape=(2, 2))
    return ViscoelasticEngine(fs_T, fs_s, P, dt, physics_mode=mode)


def test_shift_function_eq5():
    """phi = exp(H/Rg (1/Tb - 1/T)), reference ViscoelasticModel.py:156-161."""
    eng = _engine_1d()
    st = eng.init_state()
    T = jnp.full_like(st.T, 700.0)
    st2 = eng.material_step(st, T)
    np.testing.assert_allclose(np.asarray(st2.phi), _phi(700.0), rtol=1e-13)


def test_partial_fictive_temperature_eq24():
    """Tf_p[n] = (lam_m[n] Tf_p_prev[n] + T dt phi)/(lam_m[n] + dt phi)."""
    eng = _engine_1d(dt=0.1)
    st = eng.init_state()   # Tf_partial_prev = 800
    T = jnp.full_like(st.T, 780.0)
    st2 = eng.material_step(st, T)
    phi = _phi(780.0)
    expected = (LAMBDA_M_N * 800.0 + 780.0 * 0.1 * phi) / (LAMBDA_M_N + 0.1 * phi)
    np.testing.assert_allclose(np.asarray(st2.Tf_partial)[0], expected, rtol=1e-13)
    # eq. 26: weighted sum
    np.testing.assert_allclose(np.asarray(st2.Tf)[0], M_N @ expected, rtol=1e-13)


def test_shifted_time_eq19():
    """xi = dt/2 (phi(T_next) - phi(T)), T_next = 2T - T_prev."""
    eng = _engine_1d(dt=0.1)
    st = eng.init_state()   # T_prev = 800
    T = jnp.full_like(st.T, 780.0)
    st2 = eng.material_step(st, T)
    xi_expected = 0.05 * (_phi(760.0) - _phi(780.0))
    np.testing.assert_allclose(np.asarray(st2.xi), xi_expected, rtol=1e-12)
    assert xi_expected < 0  # cooling -> phi decreases -> xi negative (as coded)


def test_thermal_strain_reference_mode_drops_dTf():
    """Quirk (a): in reference mode the (a_l - a_s) dTf term is dead because
    Tf_prev is rotated before the strain evaluates
    (ThermoViscoProblem.py:475-484 then :487-496)."""
    eng = _engine_1d("reference")
    st = eng.init_state()
    T = jnp.full_like(st.T, 780.0)
    st2 = eng.material_step(st, T)
    expected = P.alpha_solid * (780.0 - 800.0)
    np.testing.assert_allclose(
        np.asarray(st2.thermal_strain)[:, 0, 0], expected, rtol=1e-12)


def test_thermal_strain_corrected_mode_keeps_dTf():
    eng = _engine_1d("corrected")
    st = eng.init_state()
    T = jnp.full_like(st.T, 780.0)
    st2 = eng.material_step(st, T)
    dTf = float(np.asarray(st2.Tf)[0]) - 800.0
    expected = P.alpha_solid * (780.0 - 800.0) + (P.alpha_liquid - P.alpha_solid) * dTf
    np.testing.assert_allclose(
        np.asarray(st2.thermal_strain)[:, 0, 0], expected, rtol=1e-12)
    assert dTf != 0.0


def test_deviatoric_strain_zero_in_1d():
    """eq. 29 with dim=1: dev = eps - (1/1) I tr(eps) = 0 -> all deviatoric
    partial stresses vanish; sigma is purely hydrostatic."""
    eng = _engine_1d()
    st = eng.init_state()
    st2 = eng.material_step(st, jnp.full_like(st.T, 750.0))
    np.testing.assert_allclose(np.asarray(st2.deviatoric_strain), 0.0, atol=1e-18)
    np.testing.assert_allclose(np.asarray(st2.s_partial), 0.0, atol=1e-18)


def test_hydrostatic_stress_hand_computed_1d():
    """eq. 15b+20 + 18 in reference mode: sigma = sum_n k_n tr(eps_tot)
    (1 - xi/(2 lam_k[n])) with eps_tot = -alpha_s dT."""
    eng = _engine_1d("reference", dt=0.1)
    st = eng.init_state()
    T_val = 780.0
    st2 = eng.material_step(st, jnp.full_like(st.T, T_val))
    xi = 0.05 * (_phi(760.0) - _phi(780.0))
    tr_tot = -P.alpha_solid * (T_val - 800.0)
    expected = np.sum(K_N * tr_tot * (1.0 - xi / (2.0 * LAMBDA_K_N)))
    np.testing.assert_allclose(np.asarray(st2.sigma)[:, 0, 0], expected, rtol=1e-12)


def test_reference_mode_no_history_accumulation():
    """Quirk (b): s_tilde/sigma_tilde stay identically zero, so two identical
    cooling steps produce stresses proportional to each step's own increment
    only (no decay memory)."""
    eng = _engine_1d("reference")
    st = eng.init_state()
    st = eng.material_step(st, jnp.full_like(st.T, 780.0))
    np.testing.assert_allclose(np.asarray(st.s_tilde), 0.0, atol=0.0)
    np.testing.assert_allclose(np.asarray(st.sigma_tilde), 0.0, atol=0.0)
    st = eng.material_step(st, jnp.full_like(st.T, 760.0))
    np.testing.assert_allclose(np.asarray(st.s_tilde), 0.0, atol=0.0)
    np.testing.assert_allclose(np.asarray(st.sigma_tilde), 0.0, atol=0.0)


def test_corrected_mode_accumulates_history():
    """Corrected semantics: sigma~' = sigma_partial * texp(xi/lam); second
    step's hydrostatic stress includes the decayed first-step stress."""
    dt = 0.1
    eng = _engine_1d("corrected", dt=dt)
    st0 = eng.init_state()
    st1 = eng.material_step(st0, jnp.full_like(st0.T, 780.0))
    st2 = eng.material_step(st1, jnp.full_like(st0.T, 760.0))
    # manual recursion for tableau n at one point, corrected mode
    def phi_xi(T, Tprev):
        Tn = 2 * T - Tprev
        return dt / 2 * (_phi(Tn) - _phi(T))
    # step 1
    xi1 = phi_xi(780.0, 800.0)
    # corrected mode keeps dTf term; compute Tf after step1
    phi1 = _phi(780.0)
    Tfp1 = (LAMBDA_M_N * 800.0 + 780.0 * dt * phi1) / (LAMBDA_M_N + dt * phi1)
    Tf1 = M_N @ Tfp1
    tr1 = -(P.alpha_solid * (780.0 - 800.0) + (P.alpha_liquid - P.alpha_solid) * (Tf1 - 800.0))
    sp1 = K_N * tr1 * (1.0 - xi1 / (2.0 * LAMBDA_K_N))
    # step 2
    xi2 = phi_xi(760.0, 780.0)
    phi2 = _phi(760.0)
    Tfp2 = (LAMBDA_M_N * Tfp1 + 760.0 * dt * phi2) / (LAMBDA_M_N + dt * phi2)
    Tf2 = M_N @ Tfp2
    tr2 = -(P.alpha_solid * (760.0 - 780.0) + (P.alpha_liquid - P.alpha_solid) * (Tf2 - Tf1))
    texp = lambda y: 1.0 - y + 0.5 * y * y
    sp2 = K_N * tr2 * (1.0 - xi2 / (2.0 * LAMBDA_K_N)) + sp1 * texp(xi2 / LAMBDA_K_N)
    np.testing.assert_allclose(np.asarray(st2.sigma)[:, 0, 0], sp2.sum(), rtol=1e-11)


def test_2d_deviatoric_and_trace_consistency():
    """In 2D with isotropic thermal strain: dev = 0 (eps ∝ I and
    tr(eps)/2 * I == eps), sigma symmetric and isotropic."""
    eng = _engine_2d("reference")
    st = eng.init_state()
    st2 = eng.material_step(st, jnp.full_like(st.T, 770.0))
    s = np.asarray(st2.sigma)
    np.testing.assert_allclose(np.asarray(st2.deviatoric_strain), 0.0, atol=1e-18)
    np.testing.assert_allclose(s[:, 0, 1], 0.0, atol=1e-18)
    np.testing.assert_allclose(s[:, 0, 0], s[:, 1, 1], rtol=1e-13)


def test_cross_space_eval_dg_to_cg():
    """T lives on DG-1, strain targets CG-1 points: with a spatially varying
    discontinuous T, the CG target dof takes the last-incident-cell value
    (deterministic last-cell-wins, matching sequential interpolate)."""
    m = interval_mesh(3, 0.0, 3.0)
    fs_T = FunctionSpace(m, "DG", 1)
    fs_s = FunctionSpace(m, "CG", 1, value_shape=(1, 1))
    eng = ViscoelasticEngine(fs_T, fs_s, P, 0.1)
    st = eng.init_state()
    # T distinct per cell: cell c has constant value 800 - 10*c
    T = jnp.asarray(np.repeat([800.0, 790.0, 780.0], 2))
    st2 = eng.material_step(st, T)
    th = np.asarray(st2.thermal_strain)[:, 0, 0]
    # CG node at x=1 is shared by cells 0,1 -> takes cell 1's value (last)
    order = np.argsort(fs_s.dof_coords[:, 0])
    dT_at_nodes = th[order] / P.alpha_solid
    np.testing.assert_allclose(dT_at_nodes, [0.0, -10.0, -20.0, -20.0], atol=1e-10)
