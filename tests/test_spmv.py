"""Assembled-ELL Jacobian SpMV vs matrix-free jvp matvec equivalence."""

import dataclasses

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
    reference_glass_mesh_1d,
)
from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem
from fem_glass_tempering_tpu.ops.heat import HeatOperator
from fem_glass_tempering_tpu.ops.spmv import EllMatrix


@pytest.mark.parametrize("mesher,fam,deg", [
    (lambda: reference_glass_mesh_1d(), "DG", 1),
    (lambda: box_mesh_2d(5, 4), "CG", 1),
    (lambda: box_mesh_2d(4, 3, cell_type="triangle"), "CG", 2),
    (lambda: box_mesh_3d(3, 3, 2), "CG", 1),
    (lambda: box_mesh_2d(4, 4), "DG", 1),
])
@pytest.mark.slow
def test_spmv_matches_jvp(mesher, fam, deg):
    mesh = mesher()
    fs = FunctionSpace(mesh, fam, deg)
    p = ModelParams()
    op = HeatOperator(fs, p, dt=0.1)
    ell = EllMatrix(op)
    rng = np.random.default_rng(0)
    T = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    T_prev = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    v = jnp.asarray(rng.standard_normal(fs.n_scalar_dofs))
    jv = jax.jvp(lambda u: op.residual(u, T_prev, 0.1), (T,), (v,))[1]
    sv = ell.make_matvec(T, 0.1)(v)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(jv), rtol=1e-10,
                               atol=1e-12)


def test_spmv_with_dirichlet():
    mesh = box_mesh_2d(4, 4)
    fs = FunctionSpace(mesh, "CG", 1)
    bd = fs.boundary_scalar_dofs()
    p = ModelParams()
    op = HeatOperator(fs, p, dt=0.1, bc_dofs=bd, bc_value=600.0)
    ell = EllMatrix(op)
    rng = np.random.default_rng(1)
    T = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    T_prev = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    v = jnp.asarray(rng.standard_normal(fs.n_scalar_dofs))
    jv = jax.jvp(lambda u: op.residual(u, T_prev, 0.1), (T,), (v,))[1]
    sv = ell.make_matvec(T, 0.1)(v)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(jv), rtol=1e-10,
                               atol=1e-12)


@pytest.mark.slow
def test_assembled_solve_matches_matrix_free():
    """Full coupled run with linear_operator='assembled' reproduces the
    matrix-free solution."""
    mesh = reference_glass_mesh_1d()
    sols = {}
    for lo in ("matrix_free", "assembled"):
        cfg = RunConfig(
            fe=FEConfig(),
            time=TimeConfig(0.0, 1.0, 0.1),
            solver=SolverConfig(linear_operator=lo),
            output=OutputConfig(write_every=0, formats=()),
        )
        prob = ThermoViscoProblem(mesh=mesh, config=cfg)
        prob.setup()
        st = prob.solve()
        sols[lo] = np.asarray(st.T)
    np.testing.assert_allclose(sols["assembled"], sols["matrix_free"],
                               rtol=1e-11)


@pytest.mark.parametrize("mesher", [
    lambda: __import__("fem_glass_tempering_tpu.fem.mesh", fromlist=["interval_mesh"]).interval_mesh(16),
    lambda: box_mesh_2d(6, 4, 2.0, 1.0),
    lambda: box_mesh_3d(4, 4, 3, 1.0, 1.0, 0.01),
])
def test_stencil_matches_jvp(mesher):
    from fem_glass_tempering_tpu.ops.stencil import StencilMatrix

    mesh = mesher()
    fs = FunctionSpace(mesh, "CG", 1)
    p = ModelParams()
    op = HeatOperator(fs, p, dt=0.1)
    st = StencilMatrix(op)
    rng = np.random.default_rng(2)
    T = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    T_prev = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    v = jnp.asarray(rng.standard_normal(fs.n_scalar_dofs))
    jv = jax.jvp(lambda u: op.residual(u, T_prev, 0.1), (T,), (v,))[1]
    sv = st.make_matvec(T, 0.1)(v)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(jv), rtol=1e-10,
                               atol=1e-12)


@pytest.mark.slow
def test_stencil_solve_matches_matrix_free():
    mesh = box_mesh_3d(4, 4, 2)
    sols = {}
    for lo in ("matrix_free", "stencil"):
        cfg = RunConfig(
            fe=FEConfig(T_family="CG", T_degree=1),
            time=TimeConfig(0.0, 0.3, 0.1),
            solver=SolverConfig(linear_operator=lo),
            output=OutputConfig(write_every=0, formats=()),
        )
        prob = ThermoViscoProblem(mesh=mesh, config=cfg)
        prob.setup()
        st = prob.solve()
        sols[lo] = np.asarray(st.T)
    np.testing.assert_allclose(sols["stencil"], sols["matrix_free"],
                               rtol=1e-11)


@pytest.mark.parametrize("mesher,deg", [
    (lambda: box_mesh_2d(5, 4, 1.0, 0.5), 1),
    (lambda: box_mesh_2d(5, 4, 1.0, 0.5), 2),
    (lambda: box_mesh_3d(4, 3, 2, 1.0, 1.0, 0.01), 1),
])
@pytest.mark.slow
def test_dg_stencil_matches_jvp(mesher, deg):
    from fem_glass_tempering_tpu.ops.stencil import DGStencilMatrix

    mesh = mesher()
    fs = FunctionSpace(mesh, "DG", deg)
    p = ModelParams()
    op = HeatOperator(fs, p, dt=0.1)
    st = DGStencilMatrix(op)
    assert st.cross_const, "uniform box mesh must yield constant cross blocks"
    rng = np.random.default_rng(3)
    T = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    T_prev = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    v = jnp.asarray(rng.standard_normal(fs.n_scalar_dofs))
    jv = jax.jvp(lambda u: op.residual(u, T_prev, 0.1), (T,), (v,))[1]
    sv = st.make_matvec(T, 0.1)(v)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(jv), rtol=1e-10,
                               atol=1e-12)


@pytest.mark.parametrize("mesher,deg", [
    (lambda: box_mesh_2d(5, 4, 1.0, 0.5), 1),
    (lambda: box_mesh_3d(4, 3, 2, 1.0, 1.0, 0.01), 1),
])
def test_dg_stencil_residual_diag_match_operator(mesher, deg):
    """The gather-free DG residual/diag (DGStencilMatrix.residual /
    jacobian_diag — one block-stencil matvec + a boundary-layer term)
    must match HeatOperator's facet-gather assembly to machine
    precision. This pair replaces the gather path in the outer Newton
    loop of the DG step on TPU."""
    from fem_glass_tempering_tpu.ops.stencil import DGStencilMatrix

    mesh = mesher()
    fs = FunctionSpace(mesh, "DG", deg)
    p = ModelParams()
    op = HeatOperator(fs, p, dt=0.1)
    st = DGStencilMatrix(op)
    rng = np.random.default_rng(7)
    T = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    T_prev = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    r_op = op.residual(T, T_prev, 0.1)
    r_st = st.residual(T, T_prev, 0.1)
    scale = float(np.abs(np.asarray(r_op)).max())
    np.testing.assert_allclose(np.asarray(r_st), np.asarray(r_op),
                               rtol=1e-9, atol=1e-12 * scale)
    d_op = op.jacobian_diag(T, 0.1)
    d_st = st.jacobian_diag(T, 0.1)
    np.testing.assert_allclose(np.asarray(d_st), np.asarray(d_op),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.slow
def test_dg_stencil_solve_matches_matrix_free():
    """Coupled DG-1 3D plate run: the gather-free DG block stencil must
    reproduce the matrix-free Newton-CG solution (the reference's default
    T element is DG-1, /root/reference/main.py:25)."""
    mesh = box_mesh_3d(4, 4, 2, 1.0, 1.0, 0.01)
    sols = {}
    for lo in ("matrix_free", "stencil"):
        cfg = RunConfig(
            fe=FEConfig(T_family="DG", T_degree=1),
            time=TimeConfig(0.0, 0.3, 0.1),
            solver=SolverConfig(linear_operator=lo),
            output=OutputConfig(write_every=0, formats=()),
        )
        prob = ThermoViscoProblem(mesh=mesh, config=cfg)
        prob.setup()
        st = prob.solve()
        sols[lo] = np.asarray(st.T)
    np.testing.assert_allclose(sols["stencil"], sols["matrix_free"],
                               rtol=1e-11)


@pytest.mark.parametrize("mesher", [
    lambda: box_mesh_3d(5, 4, 3, 1.0, 1.0, 0.01),
    lambda: box_mesh_2d(6, 5, 1.0, 0.5),
])
@pytest.mark.slow
def test_dg_constant_block_form_matches_table_form(mesher):
    """The DG constant-block decomposition (DGStencilMatrix.self_const —
    no materialized (C, nloc, nloc) table) == the full table path for
    matvec, values_at, residual, and diagonal. The table path stays live
    for non-translation-invariant meshes, so the two forms must track."""
    from fem_glass_tempering_tpu.ops.stencil import DGStencilMatrix

    mesh = mesher()
    fs = FunctionSpace(mesh, "DG", 1)
    p = ModelParams()
    op = HeatOperator(fs, p, dt=0.1)
    g = DGStencilMatrix(op)
    assert g.self_const, "uniform box must yield constant self blocks"
    assert g.self_mass is None, "const form must skip the device tables"
    rng = np.random.default_rng(11)
    T = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    Tp = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    v = jnp.asarray(rng.standard_normal(fs.n_scalar_dofs))
    # reconstructed values_at == the numpy-assembled static tables plus
    # the boundary-flux blocks applied by the same formula
    vals_static = (jnp.asarray(g.np_self_mass, dtype=op.dtype)
                   + 0.1 * jnp.asarray(g.np_self_stiff, dtype=op.dtype))
    vals_recon = g.values_at(T, 0.1)
    Tb = jnp.einsum("fql,fl->fq", op.b_phi, T[op.b_dofmap])
    dflux = p.boundary_scale * (4.0 * p.sigma * p.epsilon * Tb**3 + p.htc)
    blocks = jnp.einsum("fq,fql,fqm->flm", op.b_qw * 0.1 * dflux,
                        op.b_phi, op.b_phi)
    vals_static = vals_static.at[g.b_cell].add(blocks)
    np.testing.assert_allclose(np.asarray(vals_recon),
                               np.asarray(vals_static),
                               rtol=1e-12, atol=1e-13)
    # const matvec == table matvec
    ref_mv = g.matvec(vals_static, 0.1, v)
    const_mv = g.make_matvec(T, 0.1)(v)
    np.testing.assert_allclose(np.asarray(const_mv), np.asarray(ref_mv),
                               rtol=1e-11, atol=1e-12)
    # residual + diag: force the table path on a twin and compare
    gt = DGStencilMatrix(op)
    gt.self_const = False
    gt.self_mass = jnp.asarray(gt.np_self_mass, dtype=op.dtype)
    gt.self_stiff = jnp.asarray(gt.np_self_stiff, dtype=op.dtype)
    r_scale = float(np.abs(np.asarray(gt.residual(T, Tp, 0.1))).max())
    np.testing.assert_allclose(
        np.asarray(g.residual(T, Tp, 0.1)),
        np.asarray(gt.residual(T, Tp, 0.1)),
        rtol=1e-11, atol=1e-12 * max(r_scale, 1.0))
    np.testing.assert_allclose(
        np.asarray(g.jacobian_diag(T, 0.1)),
        np.asarray(gt.jacobian_diag(T, 0.1)), rtol=1e-12)
