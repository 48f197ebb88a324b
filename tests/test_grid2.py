"""CG-2 lattice-native operator (ops/grid2.py): parity + solver tests.

The reference stack solves degree-configurable spaces via PETSc assembly
(/root/reference/ThermoViscoProblem.py:77-100); GridHeatOperator2 must
reproduce the gather-assembled HeatOperator exactly on uniform boxes."""

import jax
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
from fem_glass_tempering_tpu.fem.mesh import (
    box_mesh_2d,
    box_mesh_3d,
    interval_mesh,
)
from fem_glass_tempering_tpu.ops.grid2 import GridHeatOperator2, Q2MG
from fem_glass_tempering_tpu.ops.heat import HeatOperator
from fem_glass_tempering_tpu.solver.newton import newton_solve

DT = 0.1


def _meshes():
    return [
        (box_mesh_3d(4, 3, 2, lx=1.0, ly=0.8, lz=0.05), "3d"),
        (box_mesh_2d(5, 3, 1.0, 0.5), "2d"),
        (interval_mesh(6, 0.0, 50.0), "1d"),
    ]


@pytest.mark.parametrize("mesh,name", _meshes(), ids=lambda m: getattr(m, "tdim", m) if not isinstance(m, str) else m)
def test_grid2_parity_vs_heat_operator(mesh, name):
    """Residual, Jacobi diagonal, and BOTH Jacobian-action forms match
    the gather-assembled HeatOperator to machine precision."""
    fs = FunctionSpace(mesh, "CG", 2)
    op = HeatOperator(fs, ModelParams(), DT, dtype=jnp.float64)
    g2 = GridHeatOperator2(op)
    n = fs.n_scalar_dofs
    rng = np.random.default_rng(0)
    T = jnp.asarray(800.0 + 10 * rng.standard_normal(n))
    Tp = jnp.asarray(800.0 + 10 * rng.standard_normal(n))
    v = jnp.asarray(rng.standard_normal(n))

    r0 = op.residual(T, Tp)
    assert float(jnp.abs(g2.residual(T, Tp) - r0).max()) <= \
        1e-12 * float(jnp.abs(r0).max())
    d0 = op.jacobian_diag(T)
    assert float(jnp.abs(g2.jacobian_diag(T) - d0).max()) <= \
        1e-12 * float(jnp.abs(d0).max())
    jv = jax.jvp(lambda u: op.residual(u, Tp), (T,), (v,))[1]
    scale = float(jnp.abs(jv).max())
    for form in ("kron", "table"):
        mv = g2.make_matvec(T, DT, form=form)(v)
        assert float(jnp.abs(mv - jv).max()) <= 1e-12 * scale, form


def test_grid2_parity_with_dirichlet():
    mesh = box_mesh_3d(4, 3, 2, lx=1.0, ly=0.8, lz=0.05)
    fs = FunctionSpace(mesh, "CG", 2)
    bc = fs.boundary_scalar_dofs()
    op = HeatOperator(fs, ModelParams(), DT, dtype=jnp.float64,
                      bc_dofs=bc, bc_value=600.0)
    g2 = GridHeatOperator2(op)
    n = fs.n_scalar_dofs
    rng = np.random.default_rng(1)
    T = jnp.asarray(800.0 + 10 * rng.standard_normal(n))
    Tp = jnp.asarray(800.0 + 10 * rng.standard_normal(n))
    v = jnp.asarray(rng.standard_normal(n))
    r0 = op.residual(T, Tp)
    assert float(jnp.abs(g2.residual(T, Tp) - r0).max()) <= 1e-10
    jv = jax.jvp(lambda u: op.residual(u, Tp), (T,), (v,))[1]
    for form in ("kron", "table"):
        mv = g2.make_matvec(T, DT, form=form)(v)
        assert float(jnp.abs(mv - jv).max()) <= 1e-12, form


def test_grid2_stiffness_annihilates_constants_exactly():
    """The difference-form 1D stiffness passes must annihilate constant
    fields to EXACT floating-point zero (the ops/grid.py f32-health
    property the sum factorization preserves)."""
    mesh = box_mesh_3d(4, 3, 2, lx=1.0, ly=0.8, lz=0.05)
    fs = FunctionSpace(mesh, "CG", 2)
    op = HeatOperator(fs, ModelParams(), DT, dtype=jnp.float64)
    g2 = GridHeatOperator2(op)
    c = jnp.full(g2.grid, 800.0)
    assert float(jnp.abs(g2._stiff3(c)).max()) == 0.0


def test_q2mg_smoke_quick():
    """Quick-tier Q2MG coverage: tiny plate, line smoother engaged,
    Newton converges with few MG-CG iterations (the full-strength
    comparisons against Jacobi are in the slow tier below)."""
    mesh = box_mesh_3d(6, 6, 3, lx=1.0, ly=1.0, lz=0.01)
    fs = FunctionSpace(mesh, "CG", 2)
    p = ModelParams()
    op = HeatOperator(fs, p, DT, dtype=jnp.float64)
    g2 = GridHeatOperator2(op)

    def make_op(level_mesh):
        return HeatOperator(FunctionSpace(level_mesh, "CG", 1), p, DT,
                            dtype=jnp.float64)

    mg = Q2MG(g2, make_op)
    assert mg.smoother == "line"
    mg.freeze_rhos(DT)
    T0 = jnp.full(fs.n_scalar_dofs, 800.0)
    res = newton_solve(
        lambda T: g2.residual(T, T0, DT), T0,
        matvec_fn=lambda T: g2.make_matvec(T, DT),
        precond_fn=lambda T: mg.preconditioner(
            mg.linearization_states(T), DT),
        rtol=1e-10, atol=1e-10, cg_rtol=1e-10, cg_max_it=200)
    assert bool(res.converged)
    assert int(res.krylov_iters) < 80


@pytest.mark.slow
@pytest.mark.parametrize("geom", ["iso", "plate"])
def test_q2mg_preconditioned_newton(geom):
    """Q2MG-preconditioned Newton at reference tolerance matches the
    Jacobi-CG solve and cuts the iteration count by an order of
    magnitude; the anisotropic plate engages the line smoother."""
    if geom == "iso":
        mesh = box_mesh_3d(6, 6, 6, lx=1.0, ly=1.0, lz=1.0)
    else:
        mesh = box_mesh_3d(8, 8, 4, lx=1.0, ly=1.0, lz=0.01)
    fs = FunctionSpace(mesh, "CG", 2)
    p = ModelParams()
    op = HeatOperator(fs, p, DT, dtype=jnp.float64)
    g2 = GridHeatOperator2(op)

    def make_op(level_mesh):
        return HeatOperator(FunctionSpace(level_mesh, "CG", 1), p, DT,
                            dtype=jnp.float64)

    mg = Q2MG(g2, make_op)
    if geom == "plate":
        assert mg.smoother == "line"
    mg.freeze_rhos(DT)
    T0 = jnp.full(fs.n_scalar_dofs, 800.0)
    res = newton_solve(
        lambda T: g2.residual(T, T0, DT), T0,
        matvec_fn=lambda T: g2.make_matvec(T, DT),
        precond_fn=lambda T: mg.preconditioner(
            mg.linearization_states(T), DT),
        rtol=1e-12, atol=1e-10, cg_rtol=1e-12, cg_max_it=400)
    assert bool(res.converged)
    res_j = newton_solve(
        lambda T: g2.residual(T, T0, DT), T0,
        matvec_fn=lambda T: g2.make_matvec(T, DT),
        jac_diag_fn=lambda T: g2.jacobian_diag(T, DT),
        rtol=1e-12, atol=1e-10, cg_rtol=1e-12, cg_max_it=8000)
    assert bool(res_j.converged)
    assert float(jnp.abs(res.x - res_j.x).max()) <= 1e-9
    # iteration-count win (the tiny iso box is barely stiff — dt*a/h^2 =
    # 3.6 — so its Jacobi baseline is mild; the plate's is catastrophic:
    # 900 vs 55 CG measured at 12x12x4, and the gap grows with size)
    factor = 2 if geom == "iso" else 5
    assert int(res.krylov_iters) < int(res_j.krylov_iters) / factor


@pytest.mark.slow
def test_problem_cg2_fast_path_matches_gather_path():
    """End-to-end coupled CG-2 problem: the lattice-native stencil + Q2MG
    path reproduces the gather/matrix-free Jacobi path at the incremental
    criterion's accuracy envelope."""
    mesh = box_mesh_3d(5, 5, 3, lx=1.0, ly=1.0, lz=0.01)
    base = dict(
        fe=FEConfig(T_family="CG", T_degree=2,
                    sigma_family="CG", sigma_degree=1),
        time=TimeConfig(0.0, 0.3, 0.1),
        output=OutputConfig(write_every=0, formats=()),
        dtype="float64",
    )
    cfg_fast = RunConfig(solver=SolverConfig(
        newton_rtol=1e-12, newton_atol=1e-10, cg_rtol=1e-12, cg_max_it=500,
        linear_operator="stencil", preconditioner="auto",
        mg_smoother="chebyshev"), **base)
    p1 = ThermoViscoProblemFactory(mesh, cfg_fast)
    assert p1._grid2 is not None
    assert type(p1._mg).__name__ == "Q2MG"
    s1 = p1.solve()

    cfg_ref = RunConfig(solver=SolverConfig(
        newton_rtol=1e-12, newton_atol=1e-10, cg_rtol=1e-12,
        cg_max_it=20000, linear_operator="matrix_free",
        preconditioner="jacobi", grid_native="off",
        jac_lag="newton"), **base)
    p2 = ThermoViscoProblemFactory(mesh, cfg_ref)
    s2 = p2.solve()
    for f in ("T", "Tf", "sigma"):
        a, b = getattr(s1, f), getattr(s2, f)
        scale = float(jnp.abs(b).max()) + 1e-30
        assert float(jnp.abs(a - b).max()) <= 1e-8 * scale, f


@pytest.mark.slow
def test_problem_cg2_mixed_precision_runs():
    """The TPU matched-tolerance configuration (f64 outer / f32 Krylov)
    builds the Q2 twins and converges at rtol 1e-12."""
    mesh = box_mesh_3d(5, 5, 3, lx=1.0, ly=1.0, lz=0.01)
    cfg = RunConfig(
        fe=FEConfig(T_family="CG", T_degree=2,
                    sigma_family="CG", sigma_degree=1),
        time=TimeConfig(0.0, 0.2, 0.1),
        solver=SolverConfig(newton_rtol=1e-12, newton_atol=1e-10,
                            cg_rtol=1e-12, cg_max_it=500,
                            linear_operator="stencil", preconditioner="mg",
                            mg_smoother="chebyshev", cg_dtype="float32"),
        output=OutputConfig(write_every=0, formats=()),
        dtype="float64",
    )
    p = ThermoViscoProblemFactory(mesh, cfg)
    assert p._grid2_32 is not None
    assert type(p._mg32).__name__ == "Q2MG"
    s = p.solve()
    assert bool(jnp.isfinite(s.T).all())


def ThermoViscoProblemFactory(mesh, cfg):
    from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem
    prob = ThermoViscoProblem(mesh=mesh, config=cfg)
    prob.setup()
    return prob


@pytest.mark.slow
def test_sharded_q2_matches_single_device():
    """GSPMD CG-2 (r5): lattice-sharded Q2 state with the state-level
    ghost pad, sum-factorized banded operator + Q2MG grid-shaped p-MG —
    8-virtual-device run matches the single-device CG-2 driver."""
    import jax

    from fem_glass_tempering_tpu.parallel.grid_shard import (
        GridShardedProblem,
    )

    assert len(jax.devices()) >= 8
    mesh = box_mesh_3d(6, 4, 3, lx=1.0, ly=0.7, lz=0.01)
    cfg = RunConfig(
        fe=FEConfig(T_family="CG", T_degree=2,
                    sigma_family="CG", sigma_degree=1),
        time=TimeConfig(0.0, 0.2, 0.1),
        solver=SolverConfig(newton_rtol=1e-12, newton_atol=1e-10,
                            cg_rtol=1e-12, cg_max_it=300,
                            linear_operator="stencil",
                            preconditioner="mg", mg_smoother="chebyshev"),
        output=OutputConfig(write_every=0, formats=()), dtype="float64")
    sp = GridShardedProblem(mesh, cfg)
    assert sp.lat_pad0 == 3        # 13-plane lattice over 8 devices
    st, ok, _, _ = sp._multi_step_jit(sp.init_state(), 2)
    assert bool(ok)
    flat = sp._to_flat(jax.device_get(st))

    single = ThermoViscoProblemFactory(mesh, cfg)
    s1 = single.solve()
    T_s = np.asarray(s1.T)
    assert np.abs(np.asarray(flat.T) - T_s).max() / np.abs(T_s).max() < 1e-9
    sg = np.asarray(s1.sigma)
    sscale = max(np.abs(sg).max(), 1e-30)
    assert np.abs(np.asarray(flat.sigma) - sg).max() / sscale < 1e-8
