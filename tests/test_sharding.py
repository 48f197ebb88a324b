"""Multi-device tests on the virtual 8-device CPU mesh: sharded solve must
match the single-device solve to fp tolerance (replaces the reference's
absent MPI testing; SURVEY.md §4 item 4)."""

import jax
import numpy as np
import pytest

from fem_glass_tempering_tpu.config import FEConfig, RunConfig, TimeConfig
from fem_glass_tempering_tpu.fem.mesh import box_mesh_2d, box_mesh_3d
from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem
from fem_glass_tempering_tpu.parallel.sharding import (
    make_device_mesh,
    shard_problem,
)


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]


def _solve(mesh, fe, n_steps, device_mesh=None):
    cfg = RunConfig(fe=fe, time=TimeConfig(0.0, n_steps * 0.1, 0.1))
    prob = ThermoViscoProblem(mesh=mesh, config=cfg)
    prob.setup()
    if device_mesh is not None:
        shard_problem(prob, device_mesh)
    st = prob.solve()
    return np.asarray(st.T), np.asarray(st.sigma), prob


@pytest.mark.parametrize("fe", [
    FEConfig(T_family="CG", T_degree=1),
    FEConfig(T_family="DG", T_degree=1),
])
@pytest.mark.slow
def test_sharded_matches_single_2d(devices, fe):
    mesh = box_mesh_2d(8, 8, 2.0, 2.0)
    T1, s1, _ = _solve(mesh, fe, 5)
    dm = make_device_mesh(devices)
    T8, s8, prob = _solve(mesh, fe, 5, device_mesh=dm)
    np.testing.assert_allclose(T8, T1, rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(s8, s1, rtol=1e-10, atol=1e-14)


@pytest.mark.slow
def test_sharded_3d_hex(devices):
    mesh = box_mesh_3d(4, 4, 2)
    fe = FEConfig(T_family="CG", T_degree=1)
    T1, s1, _ = _solve(mesh, fe, 3)
    dm = make_device_mesh(devices)
    T8, s8, _ = _solve(mesh, fe, 3, device_mesh=dm)
    np.testing.assert_allclose(T8, T1, rtol=1e-12, atol=1e-10)
    np.testing.assert_allclose(s8, s1, rtol=1e-10, atol=1e-14)


@pytest.mark.slow
def test_sharded_arrays_actually_distributed(devices):
    mesh = box_mesh_2d(8, 4)
    cfg = RunConfig(fe=FEConfig(), time=TimeConfig(0.0, 0.2, 0.1))
    prob = ThermoViscoProblem(mesh=mesh, config=cfg)
    prob.setup()
    dm = make_device_mesh(devices)
    shard_problem(prob, dm)
    shards = prob.heat.dofmap.sharding
    assert len(shards.device_set) == 8
    prob.solve()


@pytest.mark.slow
def test_sharded_with_stencil_operator(devices):
    """shard_problem composes with linear_operator='stencil': the stencil
    tables are rebuilt from the padded sharded operator arrays and must
    still reproduce the unsharded solution."""
    from fem_glass_tempering_tpu.config import SolverConfig

    mesh = box_mesh_3d(4, 4, 2)
    fe = FEConfig(T_family="CG", T_degree=1)
    cfg = RunConfig(fe=fe, time=TimeConfig(0.0, 0.3, 0.1),
                    solver=SolverConfig(linear_operator="stencil"))
    probA = ThermoViscoProblem(mesh=mesh, config=cfg)
    probA.setup()
    stA = probA.solve()

    probB = ThermoViscoProblem(mesh=mesh, config=cfg)
    probB.setup()
    shard_problem(probB, make_device_mesh(devices))
    stB = probB.solve()
    np.testing.assert_allclose(np.asarray(stB.T), np.asarray(stA.T),
                               rtol=1e-11)
