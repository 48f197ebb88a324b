"""Residual-replacement PCG (solver/krylov.py `replace_every`) and the
DG smoother f64-factorization path (solver/multigrid.py).

In f32 the CG recurrence residual drifts from the true residual on
ill-conditioned systems (measured on the 16x16x8 DG plate: the recurrence
"converged" at 1e-6 while the true relative residual was 8e-5). Periodic
replacement r := b - A x bounds that drift; these tests pin the exactness
of the mechanism (replacement must not change the converged answer) and
the dtype contract of the upcast factorization.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fem_glass_tempering_tpu.solver.krylov import pcg


def _spd(n, cond, seed=0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    d = np.geomspace(1.0, cond, n)
    return Q @ np.diag(d) @ Q.T


def test_replace_every_same_solution_well_conditioned():
    A = jnp.asarray(_spd(40, 1e3))
    b = jnp.asarray(np.random.default_rng(1).standard_normal(40))
    mv = lambda v: A @ v
    x_plain = pcg(mv, b, rtol=1e-12, max_it=500).x
    x_repl = pcg(mv, b, rtol=1e-12, max_it=500, replace_every=7).x
    np.testing.assert_allclose(np.asarray(x_repl), np.asarray(x_plain),
                               rtol=1e-9, atol=1e-9)


def test_replace_every_true_residual_bounded_f32():
    """On an ill-conditioned f32 system, replacement keeps the TRUE
    residual within a small factor of the recurrence residual at exit."""
    n, cond = 120, 1e7
    A64 = _spd(n, cond, seed=2)
    x_true = np.random.default_rng(3).standard_normal(n)
    b64 = A64 @ x_true
    A = jnp.asarray(A64, dtype=jnp.float32)
    b = jnp.asarray(b64, dtype=jnp.float32)
    mv = lambda v: A @ v
    res = pcg(mv, b, rtol=1e-6, max_it=2000, replace_every=25)
    true_rel = float(np.linalg.norm(b64 - A64 @ np.asarray(res.x, np.float64))
                     / np.linalg.norm(b64))
    # without replacement the drift on such systems can exceed 10-100x the
    # recurrence target; with it, the true residual stays near the target
    assert true_rel < 5e-5, true_rel


def test_newton_auto_replacement_under_cg_cast():
    """newton_solve defaults replace_every=50 when cg_cast is set; the
    mixed solve still matches full precision."""
    from fem_glass_tempering_tpu.solver.newton import newton_solve

    A = jnp.asarray(_spd(30, 1e4, seed=4))
    b = jnp.asarray(np.random.default_rng(5).standard_normal(30))

    def residual(x):
        return A @ x - b

    A32 = A.astype(jnp.float32)
    full = newton_solve(residual, jnp.zeros(30), rtol=1e-12, atol=0.0,
                        cg_rtol=1e-12, cg_max_it=500, max_it=10)
    mixed = newton_solve(residual, jnp.zeros(30), rtol=1e-10, atol=0.0,
                         cg_rtol=1e-6, cg_max_it=500, max_it=20,
                         cg_cast=jnp.float32,
                         matvec_fn=lambda x: (lambda v: A32 @ v),
                         jac_diag_fn=lambda x: jnp.diag(A32))
    np.testing.assert_allclose(np.asarray(mixed.x), np.asarray(full.x),
                               rtol=1e-8, atol=1e-8)


def test_dg_smoother_factorization_dtype_contract():
    """DGMultigrid in an f32 cycle under x64 factorizes the SIPG self
    blocks in f64 and hands back self.dtype (f32) apply data."""
    if not jax.config.jax_enable_x64:
        import pytest
        pytest.skip("needs x64")
    from fem_glass_tempering_tpu.config import (
        FEConfig, OutputConfig, RunConfig, SolverConfig, TimeConfig,
    )
    from fem_glass_tempering_tpu.fem.mesh import box_mesh_3d
    from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem

    mesh = box_mesh_3d(4, 4, 2, 1.0, 1.0, 0.01)
    cfg = RunConfig(
        fe=FEConfig(T_family="DG", T_degree=1),
        time=TimeConfig(0.0, 0.1, 0.1),
        solver=SolverConfig(preconditioner="mg", linear_operator="stencil",
                            cg_dtype="float32", cg_rtol=1e-8,
                            cg_max_it=5000, dg_smoother="column"),
        output=OutputConfig(write_every=0, formats=()),
        dtype="float64",
    )
    prob = ThermoViscoProblem(mesh=mesh, config=cfg)
    prob.setup()
    dg_mg = prob._dg_mg32
    assert dg_mg is not None and dg_mg.dtype == jnp.float32
    data = dg_mg._zsolve_data(jnp.asarray(prob.state.T, jnp.float32),
                              jnp.float32(cfg.time.dt))
    for leaf in jax.tree_util.tree_leaves(data):
        assert leaf.dtype == jnp.float32, leaf.dtype
