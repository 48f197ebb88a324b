"""Grid-native (gather-free) elasticity operator vs the flat assembly
operator (ops/elasticity.py): residual, matvec, diagonal, nodal strain."""

import jax.numpy as jnp
import numpy as np
import pytest

from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace
from fem_glass_tempering_tpu.fem.mesh import box_mesh_2d, box_mesh_3d
from fem_glass_tempering_tpu.ops.elasticity import ElasticityOperator
from fem_glass_tempering_tpu.ops.grid_elasticity import GridElasticityOperator


@pytest.mark.parametrize("mesher", [
    lambda: box_mesh_2d(5, 4, 1.0, 0.5),
    lambda: box_mesh_3d(4, 3, 2, 1.0, 1.0, 0.01),
])
def test_grid_elasticity_matches_flat_operator(mesher):
    mesh = mesher()
    d = mesh.tdim
    fs_sigma = FunctionSpace(mesh, "CG", 1, value_shape=(d, d))
    el = ElasticityOperator(fs_sigma, dtype=jnp.float64)
    g = GridElasticityOperator(fs_sigma, dtype=jnp.float64)
    dims = g.dims
    grid = g.grid
    C, Q = el.qw.shape
    rng = np.random.default_rng(0)

    u = rng.standard_normal((el.n, d))
    u[np.asarray(el.pin_mask) > 0] = 0.0           # pin-satisfying input
    sig_h = rng.standard_normal((C, Q, d, d))
    sig_h = 0.5 * (sig_h + np.swapaxes(sig_h, -1, -2))
    eps0 = rng.standard_normal((C, Q))[..., None, None] * np.eye(d)
    G = 1.0 + rng.random((C, Q))
    K = 2.0 + rng.random((C, Q))

    # flat cell index is row-major over the cell lattice (ops/grid.py
    # strides): reshape (C, ...) -> (*dims, ...)
    to_g = lambda a: jnp.asarray(a.reshape(dims + a.shape[1:]))
    ug = jnp.asarray(u.reshape(grid + (d,)))

    r_g = g.residual_g(ug, to_g(sig_h), to_g(eps0), to_g(G), to_g(K))
    r_f = el.residual(jnp.asarray(u), jnp.asarray(sig_h), jnp.asarray(eps0),
                      jnp.asarray(G), jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(r_g).reshape(-1, d),
                               np.asarray(r_f), rtol=1e-12, atol=1e-13)

    # linear matvec. Pin-row conventions differ by design (flat zeroes the
    # row, grid keeps an identity row — better conditioned); compare the
    # physical rows
    v = rng.standard_normal((el.n, d))
    mv_g = g.make_matvec_g(to_g(G), to_g(K))
    out_g = mv_g(jnp.asarray(v.reshape(grid + (d,))))
    zq = jnp.zeros((C, Q, d, d))
    out_f = el.residual(jnp.asarray(v), zq, zq * 0.0,
                        jnp.asarray(G), jnp.asarray(K))
    free = np.asarray(el.pin_mask) == 0
    np.testing.assert_allclose(np.asarray(out_g).reshape(-1, d)[free],
                               np.asarray(out_f)[free],
                               rtol=1e-12, atol=1e-13)

    d_g = g.jacobian_diag_g(to_g(G), to_g(K))
    d_f = el.jacobian_diag(jnp.asarray(G), jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(d_g).reshape(-1, d),
                               np.asarray(d_f), rtol=1e-12)

    # nodal strain evaluation (owner-cell convention)
    e_g = g.strain_at_nodes(ug)
    e_f = el.strain_at_sigma_dofs(jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(e_g).reshape(-1, d, d),
                               np.asarray(e_f), rtol=1e-12, atol=1e-13)


@pytest.mark.slow
def test_sharded_equilibrium_mechanics_matches_flat_path():
    """mechanics='equilibrium' in the GSPMD path (previously fenced out):
    the 8-device sharded coupled step with the grid-native elasticity
    solve reproduces the independent flat gather-assembly path
    (grid_native='off' -> ops/elasticity.py)."""
    import dataclasses

    from fem_glass_tempering_tpu.config import (
        FEConfig, OutputConfig, RunConfig, SolverConfig, TimeConfig,
    )
    from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem
    from fem_glass_tempering_tpu.parallel.grid_shard import GridShardedProblem

    mesh = box_mesh_3d(8, 6, 4, 1.0, 1.0, 0.01)
    cfg = RunConfig(
        fe=FEConfig(T_family="CG", T_degree=1),
        time=TimeConfig(0.0, 0.2, 0.1),
        solver=SolverConfig(linear_operator="stencil"),
        output=OutputConfig(write_every=0, formats=()),
        mechanics="equilibrium",
        physics_mode="corrected", xi_formula="trapezoid",
    )
    # the flat reference runs unpreconditioned Jacobi-CG for the
    # elasticity solve — give it the iterations it needs to actually
    # converge on the aspect-50 plate (measured ~6000 at rtol 1e-8)
    flat_cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, grid_native="off",
                                        linear_operator="matrix_free",
                                        cg_max_it=40000))
    prob = ThermoViscoProblem(mesh=mesh, config=flat_cfg)
    prob.setup()
    from fem_glass_tempering_tpu.models.mechanics import MechanicsCoupling
    assert isinstance(prob._mech, MechanicsCoupling)  # the independent path
    ref = prob.solve()

    sp = GridShardedProblem(mesh, cfg)
    assert sp.mech is not None
    st, ok, _, _ = sp.run(sp.init_state(), 2)
    assert ok
    flat = sp.gather_state(st)
    np.testing.assert_allclose(np.asarray(flat.T), np.asarray(ref.T),
                               rtol=1e-9)
    scale = max(float(np.abs(np.asarray(ref.sigma)).max()), 1e-30)
    np.testing.assert_allclose(np.asarray(flat.sigma) / scale,
                               np.asarray(ref.sigma) / scale, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(flat.total_strain), np.asarray(ref.total_strain),
        atol=1e-6 * max(float(np.abs(np.asarray(ref.total_strain)).max()),
                        1e-30))


def test_grid_elasticity_padded_ghosts_are_identity():
    mesh = box_mesh_3d(4, 3, 2, 1.0, 1.0, 0.01)
    d = mesh.tdim
    fs_sigma = FunctionSpace(mesh, "CG", 1, value_shape=(d, d))
    g0 = GridElasticityOperator(fs_sigma, dtype=jnp.float64)
    g3 = GridElasticityOperator(fs_sigma, dtype=jnp.float64, pad_axis0=3)
    rng = np.random.default_rng(1)
    C = int(np.prod(g0.dims))
    Q = g0.qw1.shape[0]
    G = jnp.asarray(1.0 + rng.random(g0.dims + (Q,)))
    K = jnp.asarray(2.0 + rng.random(g0.dims + (Q,)))
    v = rng.standard_normal(g0.grid + (d,))
    vp = np.concatenate([v, rng.standard_normal((3,) + g0.grid[1:] + (d,))],
                        axis=0)
    out0 = g0.make_matvec_g(G, K)(jnp.asarray(v))
    out3 = g3.make_matvec_g(G, K)(jnp.asarray(vp))
    np.testing.assert_allclose(np.asarray(out3[:-3]), np.asarray(out0),
                               rtol=1e-13, atol=1e-14)
    # ghost planes: identity rows
    np.testing.assert_array_equal(np.asarray(out3[-3:]), vp[-3:])


@pytest.mark.slow
def test_elast_mg_dense_coarse_cuts_iterations():
    """The frozen dense coarse solve (GridElastMG.coarse_inv) is the
    difference between a limping and a converging elasticity V-cycle on
    the traction-free plate: the 6-point-pinned rigid-rotation modes are
    near-singular and only an exact coarse solve damps them (measured
    32x32x8: 92 -> 10 MG-CG iterations at rtol 2e-6)."""
    import jax
    import numpy as np
    from fem_glass_tempering_tpu.config import ModelParams
    from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace
    from fem_glass_tempering_tpu.fem.mesh import box_mesh_3d
    from fem_glass_tempering_tpu.models.mechanics import GridMechanicsCoupling
    from fem_glass_tempering_tpu.models.viscoelastic import ViscoelasticEngine
    from fem_glass_tempering_tpu.ops.grid_elasticity import (
        GridElasticityOperator,
    )
    from fem_glass_tempering_tpu.solver.grid_mg import GridElastMG
    from fem_glass_tempering_tpu.solver.krylov import pcg

    mesh = box_mesh_3d(16, 16, 6, 1.0, 1.0, 0.01)
    fs_T = FunctionSpace(mesh, "CG", 1)
    fs_S = FunctionSpace(mesh, "CG", 1, value_shape=(3, 3))
    eng = ViscoelasticEngine(fs_T, fs_S, ModelParams(), 0.1,
                             dtype=jnp.float64, physics_mode="corrected",
                             xi_formula="trapezoid")
    mech = GridMechanicsCoupling(fs_S, eng, dtype=jnp.float64)
    el = mech.el
    assert mech.mg.coarse_inv is not None      # trapezoid mode -> dense

    n = fs_T.n_scalar_dofs
    rng = np.random.default_rng(0)
    xi_g = jnp.asarray(0.05 * (1 + 0.2 * rng.random(n))).reshape(el.grid)
    th_g = jnp.asarray(-5e-5 * np.linspace(0.5, 1.5, n)).reshape(el.grid)
    xi_q = el.cell_avg_from_nodes(xi_g)
    th_q = el.cell_avg_from_nodes(th_g)
    eps0_q = th_q[..., None, None] * mech.I
    G = jnp.sum(eng.g_n * eng._relax_factor(
        xi_q[..., None] / eng.lambda_g_n), -1)
    K = jnp.sum(eng.k_n * eng._relax_factor(
        xi_q[..., None] / eng.lambda_k_n), -1)
    sig_q = jnp.zeros(xi_q.shape + (3, 3))
    zero = jnp.zeros(el.grid + (3,))
    b = -el.residual_g(zero, sig_q, eps0_q, G, K)
    mv = el.make_matvec_g(G, K)
    diag = el.jacobian_diag_g(G, K)

    def make_level_op(level_mesh):
        fsl = FunctionSpace(level_mesh, "CG", 1, value_shape=(3, 3))
        return GridElasticityOperator(fsl, dtype=jnp.float64)

    mg_smooth = GridElastMG(el, make_level_op, frozen_moduli=None)
    assert mg_smooth.coarse_inv is None

    def solve(mg):
        pre = mg.preconditioner_g(G, K)
        return pcg(mv, b, diag=diag, precond=pre, rtol=1e-10, max_it=3000)

    res_dense = jax.jit(lambda: solve(mech.mg))()
    res_smooth = jax.jit(lambda: solve(mg_smooth))()
    assert bool(res_dense.converged) and bool(res_smooth.converged)
    assert int(res_dense.iters) * 3 <= int(res_smooth.iters), (
        int(res_dense.iters), int(res_smooth.iters))
    np.testing.assert_allclose(np.asarray(res_dense.x),
                               np.asarray(res_smooth.x),
                               rtol=0.0, atol=1e-8)


@pytest.mark.parametrize("pad", [0, 2])
def test_stencil_table_matvec_matches_cell_form(pad):
    """The materialized block-stencil table (stencil_table_g +
    matvec_table_g) is EXACTLY the cell-recompute operator
    (make_matvec_g), including per-quad-point coefficients, pinned
    components, and padded ghost planes."""
    mesh = box_mesh_3d(5, 4, 3, 1.0, 0.8, 0.05)
    fs = FunctionSpace(mesh, "CG", 1, value_shape=(3, 3))
    op = GridElasticityOperator(fs, dtype=jnp.float64, pad_axis0=pad)
    rng = np.random.default_rng(0)
    q = op.qw1.shape[0]
    Gq = jnp.asarray(1.0 + rng.random(op.dims + (q,)))
    Kq = jnp.asarray(2.0 + rng.random(op.dims + (q,)))
    v = jnp.asarray(rng.standard_normal(op.grid + (3,)))
    r_cell = op.make_matvec_g(Gq, Kq)(v)
    B = op.stencil_table_g(Gq, Kq)
    r_tbl = op.matvec_table_g(B, v)
    np.testing.assert_allclose(np.asarray(r_tbl), np.asarray(r_cell),
                               rtol=0.0, atol=1e-12)


def test_stencil_table_2d():
    mesh = box_mesh_2d(6, 4, 1.0, 0.1)
    fs = FunctionSpace(mesh, "CG", 1, value_shape=(2, 2))
    op = GridElasticityOperator(fs, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    q = op.qw1.shape[0]
    Gq = jnp.asarray(1.0 + rng.random(op.dims + (q,)))
    Kq = jnp.asarray(2.0 + rng.random(op.dims + (q,)))
    v = jnp.asarray(rng.standard_normal(op.grid + (2,)))
    r_cell = op.make_matvec_g(Gq, Kq)(v)
    r_tbl = op.matvec_table_g(op.stencil_table_g(Gq, Kq), v)
    np.testing.assert_allclose(np.asarray(r_tbl), np.asarray(r_cell),
                               rtol=0.0, atol=1e-12)
