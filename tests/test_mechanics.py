"""Mechanical-equilibrium coupling tests (beyond-reference capability)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from fem_glass_tempering_tpu.config import (
    FEConfig,
    ModelParams,
    OutputConfig,
    RunConfig,
    SolverConfig,
    TimeConfig,
)
from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace
from fem_glass_tempering_tpu.fem.mesh import box_mesh_2d, box_mesh_3d
from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem
from fem_glass_tempering_tpu.ops.elasticity import ElasticityOperator


def test_elasticity_free_expansion_is_stress_free():
    """Uniform imposed strain on a traction-free body: equilibrium gives
    eps(du) = eps0 (free expansion), i.e. stress-generating strain ~ 0."""
    mesh = box_mesh_2d(6, 6)
    fs_sigma = FunctionSpace(mesh, "CG", 1, value_shape=(2, 2))
    el = ElasticityOperator(fs_sigma)
    c = el.qw.shape[0]
    q = el.qw.shape[1]
    eps0 = jnp.broadcast_to(0.01 * jnp.eye(2), (c, q, 2, 2))
    G = jnp.full((c, q), 5.0)
    K = jnp.full((c, q), 8.0)
    sig_hist = jnp.zeros((c, q, 2, 2))
    du, iters = el.solve_increment(sig_hist, eps0, G, K, rtol=1e-12)
    eps_mech = np.asarray(el.strain_at_sigma_dofs(du))
    expect = np.broadcast_to(0.01 * np.eye(2), eps_mech.shape)
    np.testing.assert_allclose(eps_mech, expect, atol=1e-8)


def test_elasticity_patch_linear_displacement():
    """A linear displacement field (uniform strain) is reproduced exactly:
    impose eps0 equal to a traceless shear; solution strain == eps0."""
    mesh = box_mesh_3d(3, 3, 2)
    fs_sigma = FunctionSpace(mesh, "CG", 1, value_shape=(3, 3))
    el = ElasticityOperator(fs_sigma)
    c, q = el.qw.shape
    e = np.zeros((3, 3))
    e[0, 1] = e[1, 0] = 0.005
    e[2, 2] = -0.002
    eps0 = jnp.broadcast_to(jnp.asarray(e), (c, q, 3, 3))
    G = jnp.full((c, q), 3.0)
    K = jnp.full((c, q), 7.0)
    du, _ = el.solve_increment(jnp.zeros((c, q, 3, 3)), eps0, G, K, rtol=1e-12)
    eps_mech = np.asarray(el.strain_at_sigma_dofs(du))
    np.testing.assert_allclose(eps_mech, np.broadcast_to(e, eps_mech.shape),
                               atol=1e-8)


def _run(mechanics, n_steps=50):
    """Quenching PLATE: in-plane 50x50 >> thickness 10, cooled only on the
    z faces (insulated sides via flux_marker) so a through-thickness
    temperature gradient persists over the window."""
    cfg = RunConfig(
        fe=FEConfig(T_family="CG", T_degree=1),
        time=TimeConfig(0.0, n_steps * 0.1, 0.1),
        solver=SolverConfig(),
        output=OutputConfig(write_every=0, formats=()),
        physics_mode="corrected",
        mechanics=mechanics,
    )
    mesh = box_mesh_3d(4, 4, 16, 50.0, 50.0, 10.0)
    prob = ThermoViscoProblem(mesh=mesh, config=cfg)
    zmark = lambda m: (m[:, 2] < 1e-9) | (m[:, 2] > 10.0 - 1e-9)
    prob.setup(flux_marker=zmark)
    st = prob.solve()
    return prob, st


def _center_profile(prob, st):
    xs = prob.fs_sigma.dof_coords
    center = (np.abs(xs[:, 0] - 25) < 1e-9) & (np.abs(xs[:, 1] - 25) < 1e-9)
    sig = np.asarray(st.sigma)[:, 0, 0]
    z = xs[center][:, 2]
    order = np.argsort(z)
    return z[order], sig[center][order]


@pytest.mark.slow
def test_equilibrium_membrane_balance():
    """With equilibrium mechanics the mid-plate through-thickness stress
    profile is (weakly) self-balanced — |thickness-mean| a small fraction
    of the profile scale — and shows the mid-quench tempering signature
    (surface tension, core compression while cooling). Without mechanics
    (reference semantics) the profile is one-signed and unbalanced."""
    prob_n, st_n = _run("none")
    z, pn = _center_profile(prob_n, st_n)
    mem_n = abs(np.trapezoid(pn, z) / (z[-1] - z[0]))
    assert mem_n > 0.2 * np.abs(pn).max()
    # one-signed (no force balance at all)
    assert pn.min() > 0

    prob_e, st_e = _run("equilibrium")
    z, pe = _center_profile(prob_e, st_e)
    mem_e = abs(np.trapezoid(pe, z) / (z[-1] - z[0]))
    assert mem_e < 0.05 * np.abs(pe).max(), (mem_e, np.abs(pe).max())
    # mid-quench signature: surfaces in tension, core in compression
    assert pe[0] > 0 and pe[-1] > 0
    assert pe[len(pe) // 2] < 0
    # symmetric plate -> symmetric profile
    np.testing.assert_allclose(pe, pe[::-1], atol=0.05 * np.abs(pe).max())


@pytest.mark.slow
def test_equilibrium_reduces_to_reference_when_clamped_uniform():
    """Sanity: with mechanics enabled, a SPATIALLY UNIFORM cooling step on
    a free body produces near-zero stress (free contraction), unlike the
    no-equilibrium mode which produces large fictitious stress."""
    import dataclasses as dc

    cfg = RunConfig(
        fe=FEConfig(T_family="CG", T_degree=1),
        time=TimeConfig(0.0, 0.1, 0.1),
        output=OutputConfig(write_every=0, formats=()),
        physics_mode="corrected",
        mechanics="equilibrium",
        # kill boundary flux -> uniform temperature drop via source
        params=dc.replace(ModelParams(), epsilon=0.0, sigma=0.0, htc=0.0,
                          f=-50.0),
    )
    prob = ThermoViscoProblem(mesh=box_mesh_3d(3, 3, 2), config=cfg)
    prob.setup()
    st = prob.solve()
    T = np.asarray(st.T)
    assert T.std() < 1e-6          # uniform cooling
    sig = np.asarray(st.sigma)
    # free uniform contraction -> (near) zero stress
    assert np.abs(sig).max() < 1e-8, np.abs(sig).max()


def test_residual_stress_inversion_full_temper():
    """THE tempering result: quench a plate from above the transition
    (T0=900 K > Tb=869 K) with equilibrium mechanics, corrected history and
    the physical scaled-time increment — after cooldown the residual
    profile INVERTS to surface COMPRESSION balanced by core TENSION (the
    property that makes tempered glass strong). The reference cannot
    produce this in any configuration (no force balance, no relaxation:
    its xi is negative while cooling)."""
    params = dataclasses.replace(ModelParams(), T_0=900.0)
    cfg = RunConfig(
        fe=FEConfig(T_family="CG", T_degree=1),
        time=TimeConfig(0.0, 40.0, 0.2),
        output=OutputConfig(write_every=0, formats=()),
        params=params,
        physics_mode="corrected", mechanics="equilibrium",
        xi_formula="trapezoid",
    )
    mesh = box_mesh_3d(3, 3, 12, 50.0, 50.0, 10.0)
    prob = ThermoViscoProblem(mesh=mesh, config=cfg)
    zmark = lambda m: (m[:, 2] < 1e-9) | (m[:, 2] > 10.0 - 1e-9)
    prob.setup(flux_marker=zmark)
    st = prob.solve()
    xs = prob.fs_sigma.dof_coords
    cx = 50.0 / 3.0
    center = (np.abs(xs[:, 0] - cx) < 1e-6) & (np.abs(xs[:, 1] - cx) < 1e-6)
    sig = np.asarray(st.sigma)[:, 0, 0]
    z = xs[center][:, 2]
    o = np.argsort(z)
    pc = sig[center][o]
    # surfaces compressive, core tensile
    assert pc[0] < 0 and pc[-1] < 0, pc
    assert pc[len(pc) // 2] > 0, pc
    # canonical magnitude ordering: |surface compression| > core tension
    assert abs(pc[0]) > pc[len(pc) // 2]
    # symmetric, approximately balanced
    np.testing.assert_allclose(pc, pc[::-1], atol=0.1 * np.abs(pc).max())
    mem = abs(np.trapezoid(pc, z[o]) / (z[o][-1] - z[o][0]))
    assert mem < 0.1 * np.abs(pc).max()


@pytest.mark.slow
def test_mechanics_warm_start_cuts_iterations_and_matches():
    """state.du warm-starts the equilibrium CG: a repeat solve from the
    previous displacement converges in far fewer iterations and to the
    same solution (pcg tolerance stays relative to ||b||)."""
    from fem_glass_tempering_tpu.models.mechanics import GridMechanicsCoupling
    from fem_glass_tempering_tpu.models.viscoelastic import ViscoelasticEngine

    mesh = box_mesh_3d(8, 8, 4, 1.0, 1.0, 0.01)
    fs_T = FunctionSpace(mesh, "CG", 1)
    fs_S = FunctionSpace(mesh, "CG", 1, value_shape=(3, 3))
    eng = ViscoelasticEngine(fs_T, fs_S, ModelParams(), 0.1,
                             dtype=jnp.float64)
    mech = GridMechanicsCoupling(fs_S, eng, dtype=jnp.float64,
                                 cg_rtol=1e-10, cg_max_it=2000)
    n = fs_T.n_scalar_dofs
    state = eng.init_state()
    rng = np.random.default_rng(3)
    xi = jnp.asarray(0.05 + 0.01 * rng.random(n))
    th = jnp.asarray(-5e-5 * (1.0 + 0.3 * rng.random(n)))

    eps_cold, du = mech(state, xi, th)
    iters_cold = int(mech.last_cg_iters)

    # next step: slightly drifted fields, previous du in the state
    xi2 = xi * 1.02
    th2 = th * 1.01
    eps_ref, _ = mech(state, xi2, th2)          # cold solve of step 2
    ref_iters = int(mech.last_cg_iters)
    state_warm = state._replace(du=du)
    eps_warm, du2 = mech(state_warm, xi2, th2)
    iters_warm = int(mech.last_cg_iters)

    # MG-CG converges at a roughly constant rate, so the saving is the
    # log of the initial-residual cut — modest here, larger the closer
    # the transient is to equilibrium
    assert iters_warm < ref_iters, (iters_warm, ref_iters)
    np.testing.assert_allclose(np.asarray(eps_warm), np.asarray(eps_ref),
                               rtol=0.0, atol=1e-12)
    assert du2.shape == (n, 3)


@pytest.mark.slow
def test_mechanics_increment_tolerance_cuts_iterations_bounded_error():
    """inc_rtol (pcg rtol_r0) relaxes the warm-started solve to a fixed
    reduction of the residual AT the warm start: far fewer iterations on
    a near-converged step, with the solve error bounded by inc_rtol
    times the step's change. Cold solves (x0 residual = ||b||) keep the
    same relative accuracy."""
    from fem_glass_tempering_tpu.models.mechanics import GridMechanicsCoupling
    from fem_glass_tempering_tpu.models.viscoelastic import ViscoelasticEngine

    mesh = box_mesh_3d(8, 8, 4, 1.0, 1.0, 0.01)
    fs_T = FunctionSpace(mesh, "CG", 1)
    fs_S = FunctionSpace(mesh, "CG", 1, value_shape=(3, 3))
    eng = ViscoelasticEngine(fs_T, fs_S, ModelParams(), 0.1,
                             dtype=jnp.float64)
    tight = GridMechanicsCoupling(fs_S, eng, dtype=jnp.float64,
                                  cg_rtol=1e-12, cg_max_it=2000)
    sched = GridMechanicsCoupling(fs_S, eng, dtype=jnp.float64,
                                  cg_rtol=1e-12, cg_max_it=2000,
                                  inc_rtol=1e-2)
    n = fs_T.n_scalar_dofs
    state = eng.init_state()
    rng = np.random.default_rng(7)
    xi = jnp.asarray(0.05 + 0.01 * rng.random(n))
    th = jnp.asarray(-5e-5 * (1.0 + 0.3 * rng.random(n)))

    eps1, du1 = tight(state, xi, th)
    # step 2: small drift, warm start from du1
    state2 = state._replace(du=du1)
    xi2, th2 = xi * 1.02, th * 1.01
    eps_t, _ = tight(state2, xi2, th2)
    it_t = int(tight.last_cg_iters)
    eps_s, _ = sched(state2, xi2, th2)
    it_s = int(sched.last_cg_iters)

    assert it_s < it_t, (it_s, it_t)
    # error bounded by the step's strain CHANGE (the residual-norm cut
    # does not map 1:1 onto max-norm strain error, but the error must
    # stay a fraction of the change and far below the solution scale)
    change = float(jnp.max(jnp.abs(eps_t - eps1)))
    err = float(jnp.max(jnp.abs(eps_s - eps_t)))
    scale = float(jnp.max(jnp.abs(eps_t)))
    assert err <= 0.5 * change, (err, change)
    assert err <= 1e-2 * scale, (err, scale)


def test_thermoelastic_plate_analytic_profile():
    """EXTERNAL anchor for the equilibrium mechanics (VERDICT r3 #6): the
    classic thermoelastic free-plate solution. For a traction-free plate
    with isotropic eigenstrain eps0 = alpha*dT(zbar)*I where the
    through-thickness profile dT(zbar) = A*(zbar^2 - h^2/12) has zero
    mean and zero first moment, the exact in-plane stress away from the
    edges is

        sigma_xx = sigma_yy = -E*alpha*dT(z)/(1-nu),   sigma_zz = 0

    (Timoshenko & Goodier, thermal stress in plates). This pins the
    elasticity solve to a closed-form solution independent of this
    codebase."""
    import jax.numpy as jnp

    from fem_glass_tempering_tpu.fem.mesh import box_mesh_3d
    from fem_glass_tempering_tpu.ops.assembly import build_cell_geometry
    from fem_glass_tempering_tpu.ops.elasticity import ElasticityOperator

    # moderate thickness: the analytic solution is exact for ANY h on a
    # laterally infinite plate (1D fields => sigma_zz = 0 exactly), and
    # the 3:1 cell aspect keeps the Jacobi-CG solve well conditioned
    h = 0.2
    mesh = box_mesh_3d(12, 12, 8, 1.0, 1.0, h)
    fs_sigma = FunctionSpace(mesh, "CG", 1, value_shape=(3, 3))
    el = ElasticityOperator(fs_sigma, dtype=jnp.float64)
    G, K = 1.0, 2.0
    E = 9 * K * G / (3 * K + G)
    nu = (3 * K - 2 * G) / (2 * (3 * K + G))
    alpha = 9.1e-6
    A = 1000.0

    def dT(z):
        zb = z - h / 2
        return A * (zb**2 - h**2 / 12.0)

    cg = build_cell_geometry(mesh, el.fs)
    zq = jnp.asarray(cg.qpoints_phys[..., 2])             # (c, q)
    C, Q = zq.shape
    eps0_q = (alpha * dT(zq))[..., None, None] * jnp.eye(3)
    Gq = jnp.full((C, Q), G)
    Kq = jnp.full((C, Q), K)
    sig_hist = jnp.zeros((C, Q, 3, 3))
    du, iters = el.solve_increment(sig_hist, eps0_q, Gq, Kq,
                                   rtol=1e-11, max_it=6000)
    assert int(iters) < 6000, "elasticity CG did not converge"
    # compare CELL AVERAGES: the trilinear strain oscillates linearly
    # about the parabolic profile within each cell (standard FE gradient
    # behavior — measured ±15% pointwise at 8 cells through thickness,
    # std ~1e-9 laterally i.e. NO edge effect), while the cell mean is
    # superconvergent (measured 0.05% against the Gauss-averaged theory)
    eps_q = el._strain_at_q(du)                           # (c, q, 3, 3)
    em = eps_q - eps0_q
    tr = jnp.trace(em, axis1=-2, axis2=-1)
    dev = em - (tr / 3.0)[..., None, None] * jnp.eye(3)
    sigma = np.asarray(2 * G * dev + K * tr[..., None, None] * jnp.eye(3))
    sigma_cell = sigma.mean(axis=1)                       # (c, 3, 3)

    xq = np.asarray(cg.qpoints_phys)                      # (c, q, 3)
    s_theory_q = -E * alpha * np.asarray(dT(jnp.asarray(xq[..., 2]))) \
        / (1 - nu)
    s_theory_cell = s_theory_q.mean(axis=1)               # (c,)
    xc = xq.mean(axis=1)                                  # cell centroids
    # interior region: far from every lateral edge
    sel = ((np.abs(xc[:, 0] - 0.5) < 0.25)
           & (np.abs(xc[:, 1] - 0.5) < 0.25))
    scale = np.abs(s_theory_cell).max()
    err_xx = np.abs(sigma_cell[sel, 0, 0] - s_theory_cell[sel]).max() / scale
    err_yy = np.abs(sigma_cell[sel, 1, 1] - s_theory_cell[sel]).max() / scale
    err_zz = np.abs(sigma_cell[sel, 2, 2]).max() / scale
    assert err_xx < 0.025, err_xx
    assert err_yy < 0.025, err_yy
    assert err_zz < 0.025, err_zz
