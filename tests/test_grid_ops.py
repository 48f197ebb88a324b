"""Grid-native (fully gather-free) CG-1 heat operator vs reference assembly,
and the GSPMD-sharded coupled step vs the single-device step."""

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
from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem
from fem_glass_tempering_tpu.ops.grid import GridHeatOperator
from fem_glass_tempering_tpu.ops.heat import HeatOperator


@pytest.mark.parametrize("mesher,bc", [
    (lambda: interval_mesh(9), False),
    (lambda: box_mesh_2d(6, 4, 1.0, 0.5), False),
    (lambda: box_mesh_2d(6, 4, 1.0, 0.5), True),
    (lambda: box_mesh_3d(5, 4, 3, 1.0, 1.0, 0.01), False),
    (lambda: box_mesh_3d(5, 4, 3, 1.0, 1.0, 0.01), True),
])
def test_grid_operator_matches_assembly(mesher, bc):
    mesh = mesher()
    fs = FunctionSpace(mesh, "CG", 1)
    p = ModelParams()
    bd = fs.boundary_scalar_dofs() if bc else None
    op = HeatOperator(fs, p, 0.1, bc_dofs=bd, bc_value=600.0 if bc else None)
    g = GridHeatOperator(op)
    rng = np.random.default_rng(0)
    T = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    Tp = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    v = jnp.asarray(rng.standard_normal(fs.n_scalar_dofs))
    np.testing.assert_allclose(
        np.asarray(g.residual(T, Tp, 0.1)),
        np.asarray(op.residual(T, Tp, 0.1)), rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(g.jacobian_diag(T, 0.1)),
        np.asarray(op.jacobian_diag(T, 0.1)), rtol=1e-12)
    jv = jax.jvp(lambda u: op.residual(u, Tp, 0.1), (T,), (v,))[1]
    np.testing.assert_allclose(
        np.asarray(g.make_matvec(T, 0.1)(v)), np.asarray(jv),
        rtol=1e-10, atol=1e-12)


def test_grid_operator_whole_face_flux_marker():
    """Face-restricted flux (e.g. only the large z-faces of a tempering
    plate, examples/full_tempering_demo.py) through the grid fast path ==
    the gather assembly with the same marker."""
    mesh = box_mesh_3d(5, 4, 3, 1.0, 1.0, 0.01)
    fs = FunctionSpace(mesh, "CG", 1)
    p = ModelParams()
    zmark = lambda m: (m[:, 2] < 1e-12) | (m[:, 2] > 0.01 - 1e-12)
    op = HeatOperator(fs, p, 0.1, flux_marker=zmark)
    g = GridHeatOperator(op, flux_marker=zmark)
    assert len(g.faces) == 2
    rng = np.random.default_rng(0)
    T = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    Tp = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    v = jnp.asarray(rng.standard_normal(fs.n_scalar_dofs))
    np.testing.assert_allclose(
        np.asarray(g.residual(T, Tp, 0.1)),
        np.asarray(op.residual(T, Tp, 0.1)), rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(g.jacobian_diag(T, 0.1)),
        np.asarray(op.jacobian_diag(T, 0.1)), rtol=1e-12)
    jv = jax.jvp(lambda u: op.residual(u, Tp, 0.1), (T,), (v,))[1]
    np.testing.assert_allclose(
        np.asarray(g.make_matvec(T, 0.1)(v)), np.asarray(jv),
        rtol=1e-10, atol=1e-12)
    # a marker cutting through a face must be rejected
    with pytest.raises(ValueError):
        GridHeatOperator(op, flux_marker=lambda m: m[:, 0] < 0.3)


@pytest.mark.parametrize("mesher,marker", [
    (lambda: box_mesh_3d(6, 4, 3, 1.0, 1.0, 0.01), False),
    (lambda: box_mesh_3d(6, 4, 3, 1.0, 1.0, 0.01), True),
    (lambda: box_mesh_2d(7, 5, 1.0, 0.5), False),
])
def test_constant_row_form_matches_table_form(mesher, marker):
    """The constant-row decomposition (GridHeatOperator.const_ok — no
    materialized value table) == the full (n_off, *grid) table path for
    matvec, residual, and diagonal. The table path stays live for the
    sharded V-cycle (solver/grid_mg.py), so the two forms must track."""
    mesh = mesher()
    fs = FunctionSpace(mesh, "CG", 1)
    p = ModelParams()
    zmark = None
    if marker:
        zmark = lambda m: (m[:, 2] < 1e-12) | (m[:, 2] > 0.01 - 1e-12)
    op = HeatOperator(fs, p, 0.1, flux_marker=zmark)
    g = GridHeatOperator(op, flux_marker=zmark)
    assert g.const_ok
    rng = np.random.default_rng(2)
    T = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    Tp = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    v = jnp.asarray(rng.standard_normal(fs.n_scalar_dofs))
    # table-path references (force const off)
    vals = g.stencil_values(T, 0.1)
    ref_mv = g._mv_flat(vals)(v)
    const_mv = g.make_matvec(T, 0.1)(v)
    np.testing.assert_allclose(np.asarray(const_mv), np.asarray(ref_mv),
                               rtol=1e-12, atol=1e-14)
    gt = GridHeatOperator(op, flux_marker=zmark)
    gt.const_ok = False
    np.testing.assert_allclose(
        np.asarray(g.residual(T, Tp, 0.1)),
        np.asarray(gt.residual(T, Tp, 0.1)), rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(g.jacobian_diag(T, 0.1)),
        np.asarray(gt.jacobian_diag(T, 0.1)), rtol=1e-13)
    # constant-field annihilation of the stiffness diff form is exact
    c = jnp.full(fs.n_scalar_dofs, 811.0, dtype=g.dtype)
    z = g._crow_conv(g.crow_stiff, g.crow_dstiff, c, diff=True)
    assert float(jnp.abs(z).max()) == 0.0


def test_grid_padded_identity_rows():
    """Ghost planes appended for GSPMD divisibility behave as identity
    rows and leave the physical dofs bit-consistent with the unpadded
    operator."""
    mesh = box_mesh_3d(5, 4, 3, 1.0, 1.0, 0.01)
    fs = FunctionSpace(mesh, "CG", 1)
    p = ModelParams()
    op = HeatOperator(fs, p, 0.1)
    g0 = GridHeatOperator(op)
    g3 = GridHeatOperator(op, pad_axis0=3)
    rng = np.random.default_rng(1)
    Tg = jnp.asarray(700 + 100 * rng.random(g0.grid))
    Tpg = jnp.asarray(700 + 100 * rng.random(g0.grid))
    pad = [(0, 3), (0, 0), (0, 0)]
    Tg_p = jnp.pad(Tg, pad, constant_values=p.T_0)
    Tpg_p = jnp.pad(Tpg, pad, constant_values=p.T_0)
    r0 = g0.residual_g(Tg, Tpg, 0.1)
    r3 = g3.residual_g(Tg_p, Tpg_p, 0.1)
    np.testing.assert_array_equal(np.asarray(r3[:-3]), np.asarray(r0))
    np.testing.assert_allclose(np.asarray(r3[-3:]), 0.0, atol=1e-12)
    mv = g3.make_matvec_g(Tg_p, 0.1)
    vg = jnp.asarray(rng.standard_normal(g3.grid))
    out = mv(vg)
    # identity rows on the ghost planes
    np.testing.assert_array_equal(np.asarray(out[-3:]), np.asarray(vg[-3:]))


def test_grid_sharded_step_matches_single_device():
    """The GSPMD-sharded coupled step (parallel/grid_shard.py) on the full
    8-virtual-device mesh reproduces the single-device solve — the
    framework's `mpiexec -np N` equivalence check (reference
    README.md:62-66), with genuinely decomposed state."""
    from fem_glass_tempering_tpu.parallel.grid_shard import GridShardedProblem

    mesh = box_mesh_3d(12, 6, 3, 1.0, 1.0, 0.01)   # 13 planes: uneven shard
    cfg = RunConfig(
        fe=FEConfig(T_family="CG", T_degree=1),
        time=TimeConfig(0.0, 0.3, 0.1),
        solver=SolverConfig(linear_operator="stencil"),
        output=OutputConfig(write_every=0, formats=()),
    )
    prob = ThermoViscoProblem(mesh=mesh, config=cfg)
    prob.setup()
    ref = prob.solve()

    sp = GridShardedProblem(mesh, cfg)
    assert sp.n_devices == 8
    st, ok, _, _ = sp.run(sp.init_state(), 3)
    assert ok
    flat = sp.gather_state(st)
    np.testing.assert_allclose(np.asarray(flat.T), np.asarray(ref.T),
                               rtol=1e-11)
    np.testing.assert_allclose(np.asarray(flat.Tf), np.asarray(ref.Tf),
                               rtol=1e-11)
    scale = max(float(np.abs(np.asarray(ref.sigma)).max()), 1e-30)
    np.testing.assert_allclose(np.asarray(flat.sigma) / scale,
                               np.asarray(ref.sigma) / scale, atol=1e-6)
    # every state field is genuinely sharded (not replicated)
    from jax.sharding import PartitionSpec as P
    assert st.T.sharding.spec == P("x")
    assert st.s_partial.sharding.spec == P("x")
