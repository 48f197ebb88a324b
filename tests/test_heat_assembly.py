"""Heat operator assembly + Newton-Krylov solver tests.

Validates the batched assembly against analytic integrals, the SIPG-DG
branch against the CG solution, Dirichlet lifting against exact harmonic
solutions, and radiative/convective equilibrium.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from fem_glass_tempering_tpu.config import ModelParams
from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace
from fem_glass_tempering_tpu.fem.mesh import (
    box_mesh_2d,
    box_mesh_3d,
    interval_mesh,
    reference_glass_mesh_1d,
)
from fem_glass_tempering_tpu.ops.heat import HeatOperator
from fem_glass_tempering_tpu.solver.newton import newton_solve


def _params(**kw):
    return dataclasses.replace(ModelParams(), **kw)


NOFLUX = dict(epsilon=0.0, htc=0.0, sigma=0.0)


def test_mass_matrix_row_sums_1d():
    """dt=0 => residual = M (T - T_prev); sum_i (M 1)_i = |domain|."""
    m = interval_mesh(13, 0.0, 2.0)
    fs = FunctionSpace(m, "CG", 1)
    op = HeatOperator(fs, _params(**NOFLUX), dt=0.0)
    ones = jnp.ones(fs.n_scalar_dofs)
    r = op.residual(ones, 0.0 * ones)
    np.testing.assert_allclose(float(r.sum()), 2.0, rtol=1e-12)
    # ∫ x dx over [0,2] = 2
    x = jnp.asarray(fs.dof_coords[:, 0])
    r = op.residual(x, 0.0 * x)
    np.testing.assert_allclose(float(r.sum()), 2.0, rtol=1e-12)


@pytest.mark.parametrize("mesher,vol", [
    (lambda: interval_mesh(7, 0, 3.0), 3.0),
    (lambda: box_mesh_2d(3, 4, 2.0, 1.0), 2.0),
    (lambda: box_mesh_2d(3, 4, 2.0, 1.0, cell_type="triangle"), 2.0),
    (lambda: box_mesh_3d(2, 2, 3, 1.0, 1.0, 2.0), 2.0),
    (lambda: box_mesh_3d(2, 2, 2, cell_type="tet"), 1.0),
])
def test_mass_volume_all_cells(mesher, vol):
    m = mesher()
    for fam, deg in [("CG", 1), ("CG", 2), ("DG", 1)]:
        fs = FunctionSpace(m, fam, deg)
        op = HeatOperator(fs, _params(**NOFLUX), dt=0.0)
        ones = jnp.ones(fs.n_scalar_dofs)
        r = op.residual(ones, 0.0 * ones)
        np.testing.assert_allclose(float(r.sum()), vol, rtol=1e-11,
                                   err_msg=f"{m.cell_type} {fam}{deg}")


@pytest.mark.parametrize("mesher", [
    lambda: interval_mesh(9, 0, 1.0),
    lambda: box_mesh_2d(4, 3),
    lambda: box_mesh_2d(4, 3, cell_type="triangle"),
    lambda: box_mesh_3d(2, 2, 2),
    lambda: box_mesh_3d(2, 2, 2, cell_type="tet"),
])
def test_stiffness_energy_linear_field(mesher):
    """dt=1, alpha=1, no flux: vdot(T, K T) = ∫|grad T|^2; T = a.x linear."""
    m = mesher()
    for fam, deg in [("CG", 1), ("CG", 2)]:
        fs = FunctionSpace(m, fam, deg)
        p = _params(**NOFLUX, alpha=1.0)
        op = HeatOperator(fs, p, dt=1.0)
        a = np.arange(1, m.gdim + 1, dtype=float)
        T = jnp.asarray(fs.dof_coords @ a)
        # subtract the mass part: residual(T, T) leaves only dt*K*T
        r = op.residual(T, T)
        energy = float(jnp.vdot(T, r))
        vol = {1: 1.0, 2: 1.0, 3: 1.0}[m.gdim]
        np.testing.assert_allclose(energy, float(a @ a) * vol, rtol=1e-10,
                                   err_msg=f"{m.cell_type} {fam}{deg}")


def test_radiative_equilibrium_is_exact_zero():
    """T = T_ambient is a steady state of the full nonlinear operator."""
    m = reference_glass_mesh_1d()
    fs = FunctionSpace(m, "DG", 1)
    p = _params()
    op = HeatOperator(fs, p, dt=0.1)
    T = jnp.full(fs.n_scalar_dofs, p.T_ambient)
    r = op.residual(T, T)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-10)


@pytest.mark.parametrize("mesher,fam,deg", [
    (lambda: box_mesh_2d(5, 5), "CG", 1),
    (lambda: box_mesh_2d(4, 4, cell_type="triangle"), "CG", 2),
    (lambda: box_mesh_3d(2, 3, 2), "CG", 1),
    (lambda: box_mesh_3d(2, 2, 2, cell_type="tet"), "CG", 2),
])
def test_dirichlet_harmonic_exact(mesher, fam, deg):
    """Steady diffusion with T = 1 + 2x on the whole boundary reproduces the
    linear field exactly (it lies in every FE space)."""
    m = mesher()
    fs = FunctionSpace(m, fam, deg)
    bd = fs.boundary_scalar_dofs()
    bvals = 1.0 + 2.0 * fs.dof_coords[bd, 0]
    p = _params(**NOFLUX, alpha=1.0)
    op = HeatOperator(fs, p, dt=1e8, bc_dofs=bd, bc_value=bvals)
    T0 = jnp.zeros(fs.n_scalar_dofs)
    res = newton_solve(
        lambda T: op.residual(T, T0), T0,
        jac_diag_fn=op.jacobian_diag, rtol=1e-12, cg_rtol=1e-13, cg_max_it=2000,
    )
    assert bool(res.converged)
    exact = 1.0 + 2.0 * fs.dof_coords[:, 0]
    np.testing.assert_allclose(np.asarray(res.x), exact, atol=2e-6)


def test_nonlinear_step_newton_converges_fast():
    """One real tempering heat step (radiation + convection) on the reference
    mesh: Newton converges to rtol 1e-12 in a few iterations and cools the
    surface below the core."""
    m = reference_glass_mesh_1d()
    fs = FunctionSpace(m, "DG", 1)
    p = _params()
    op = HeatOperator(fs, p, dt=0.1)
    T_prev = jnp.full(fs.n_scalar_dofs, p.T_0)
    res = newton_solve(
        lambda T: op.residual(T, T_prev), T_prev,
        jac_diag_fn=op.jacobian_diag, rtol=1e-12,
    )
    assert bool(res.converged)
    assert int(res.iters) <= 10
    T = np.asarray(res.x)
    x = fs.dof_coords[:, 0]
    # surface dofs cooled the most; everything within (T_ambient, T_0]
    # (up to the usual small FEM overshoot near the boundary layer)
    assert T.min() > p.T_ambient
    assert T.max() <= p.T_0 + 0.01
    surf = T[np.argmin(x)]
    core = T[np.argmin(np.abs(x - 25.0))]
    assert surf < core


def test_dg_matches_cg_smooth():
    """SIPG-DG and CG discretizations of the same nonlinear step converge to
    each other at ~2nd order under mesh refinement (consistency of the SIPG
    facet terms with the CG diffusion operator)."""
    p = _params()
    errs = {}
    for n in (64, 256):
        m = interval_mesh(n, 0.0, 50.0)
        sols = {}
        for fam in ("CG", "DG"):
            fs = FunctionSpace(m, fam, 1)
            op = HeatOperator(fs, p, dt=0.1)
            T_prev = jnp.full(fs.n_scalar_dofs, p.T_0)
            res = newton_solve(lambda T: op.residual(T, T_prev), T_prev,
                               jac_diag_fn=op.jacobian_diag)
            assert bool(res.converged)
            # compare at cell midpoints via averaging cell dof values
            Tc = np.asarray(res.x)[fs.dofmap]
            sols[fam] = Tc.mean(axis=1)
        errs[n] = np.abs(sols["CG"] - sols["DG"]).max()
    assert errs[64] < 0.5
    assert errs[256] < errs[64] / 8.0, errs  # ~O(h^2): 4x refinement => >=8x drop


def test_jacobian_diag_matches_jvp():
    """Exact diagonal equals the diagonal extracted via jvp probes."""
    m = reference_glass_mesh_1d()
    fs = FunctionSpace(m, "DG", 1)
    p = _params()
    op = HeatOperator(fs, p, dt=0.1)
    rng = np.random.default_rng(0)
    T = jnp.asarray(700.0 + 100.0 * rng.random(fs.n_scalar_dofs))
    T_prev = jnp.full(fs.n_scalar_dofs, p.T_0)
    import jax

    f = lambda U: op.residual(U, T_prev)
    n = fs.n_scalar_dofs
    # probe a handful of unit vectors
    idxs = rng.integers(0, n, size=10)
    diag = op.jacobian_diag(T)
    for i in idxs:
        e = jnp.zeros(n).at[i].set(1.0)
        col = jax.jvp(f, (T,), (e,))[1]
        np.testing.assert_allclose(float(diag[i]), float(col[i]), rtol=1e-9)


def test_flux_marker_insulates_selected_faces():
    """flux_marker restricts Robin flux to chosen facets: with only the
    x=0 face cooling, the opposite face stays (nearly) at T_0 after a few
    steps while the cooled face drops."""
    from fem_glass_tempering_tpu.fem.mesh import box_mesh_2d

    m = box_mesh_2d(6, 4, 1.0, 1.0)
    fs = FunctionSpace(m, "CG", 1)
    p = _params()
    op = HeatOperator(fs, p, dt=0.1,
                      flux_marker=lambda mid: mid[:, 0] < 1e-9)
    T = jnp.full(fs.n_scalar_dofs, p.T_0)
    for _ in range(3):
        res = newton_solve(lambda U: op.residual(U, T),
                           T, jac_diag_fn=op.jacobian_diag)
        assert bool(res.converged)
        T = res.x
    x = fs.dof_coords
    left = np.asarray(T)[x[:, 0] < 1e-9]
    right = np.asarray(T)[x[:, 0] > 1.0 - 1e-9]
    assert left.max() < p.T_0 - 10.0           # cooled face drops hard
    # insulated face only loses heat via conduction -> clearly warmer
    assert right.min() > left.max() + 10.0


def test_physical_heat_form():
    """form='physical' assembles the dimensional rho*cp / k equation the
    reference's parameters imply but never use (ThermalModel.py:23-25
    created, unused in the form — SURVEY.md Quirks 6)."""
    import dataclasses

    import jax.numpy as jnp

    from fem_glass_tempering_tpu.fem.mesh import box_mesh_2d
    from fem_glass_tempering_tpu.models.thermal import ThermalModel

    mesh = box_mesh_2d(4, 3)
    fs = FunctionSpace(mesh, "CG", 1)
    p = ModelParams()
    # with rho*cp == 1 and k == alpha the two forms coincide
    p_match = dataclasses.replace(p, rho=1.0, cp=1.0, k=p.alpha)
    rng = np.random.default_rng(0)
    T = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    Tp = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    r_ref = HeatOperator(fs, p_match, 0.1, form="reference").residual(T, Tp)
    r_phys = HeatOperator(fs, p_match, 0.1, form="physical").residual(T, Tp)
    np.testing.assert_allclose(np.asarray(r_phys), np.asarray(r_ref),
                               rtol=1e-12)
    # dimensional coefficients actually enter the operator
    op = HeatOperator(fs, p, 0.1, form="physical")
    assert op.c_mass == p.rho * p.cp and op.c_diff == p.k
    tm = ThermalModel.from_params(p)
    assert np.isclose(tm.diffusivity(), p.k / (p.rho * p.cp))
    assert tm.radiation_htc(800.0) > 0
