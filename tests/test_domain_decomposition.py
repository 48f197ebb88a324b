"""Explicit domain-decomposition (shard_map + halo exchange) tests: the
distributed coupled step must reproduce the single-device solution."""

import jax
import numpy as np
import pytest

from fem_glass_tempering_tpu.config import FEConfig, OutputConfig, RunConfig, TimeConfig
from fem_glass_tempering_tpu.fem.mesh import (
    box_mesh_2d,
    interval_mesh,
    reference_glass_mesh_1d,
)
from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem
from fem_glass_tempering_tpu.parallel.domain import DDProblem
from fem_glass_tempering_tpu.parallel.partition import partition_cells


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


def _cfg(n_steps):
    return RunConfig(
        fe=FEConfig(T_family="DG", T_degree=1),
        time=TimeConfig(0.0, n_steps * 0.1, 0.1),
        output=OutputConfig(write_every=0, formats=()),
    )


def test_partition_contiguity_and_balance():
    m = box_mesh_2d(8, 4)
    part = partition_cells(m, 4)
    counts = np.bincount(part, minlength=4)
    assert counts.min() >= 7 and counts.max() <= 9
    # every part's cells form one connected block along the sort axis
    assert set(part) == {0, 1, 2, 3}


@pytest.mark.parametrize("mesher", [
    lambda: reference_glass_mesh_1d(),
    lambda: box_mesh_2d(6, 4, 2.0, 1.0),
])
def test_dd_matches_single_device(devices, mesher, n_steps=5):
    mesh = mesher()
    cfg = _cfg(n_steps)

    ref = ThermoViscoProblem(mesh=mesh, config=cfg)
    ref.setup()
    st_ref = ref.solve()

    dd = DDProblem(mesh, cfg, n_parts=8, devices=devices)
    st = dd.init_state()
    for _ in range(n_steps):
        st, ok, iters, kiters = dd.step(st)
        assert ok
    T_dd = dd.gather_T(st)
    np.testing.assert_allclose(T_dd, np.asarray(st_ref.T), rtol=1e-10, atol=1e-9)
    sig_dd = dd.gather_sigma(st)
    np.testing.assert_allclose(
        sig_dd, np.asarray(st_ref.sigma), rtol=1e-8, atol=1e-12)


def test_dd_cross_facets_exist(devices):
    """Sanity: the 8-way partition of the glass mesh actually produces
    cross-device facets (so the halo path is exercised)."""
    mesh = reference_glass_mesh_1d()
    part = partition_cells(mesh, 8)
    cp, cm = mesh.interior_cell_p, mesh.interior_cell_m
    assert int((part[cp] != part[cm]).sum()) >= 7


def test_dgdd_gather_state_matches_single(devices):
    mesh = reference_glass_mesh_1d()
    cfg = _cfg(3)
    ref = ThermoViscoProblem(mesh=mesh, config=cfg)
    ref.setup()
    st_ref = ref.solve()
    dd = DDProblem(mesh, cfg, n_parts=8, devices=devices)
    st = dd.init_state()
    for _ in range(3):
        st, ok, *_ = dd.step(st)
    g = dd.gather_state(st)
    for f in ("T", "Tf", "Tf_partial", "xi", "sigma", "sigma_partial"):
        np.testing.assert_allclose(
            np.asarray(getattr(g, f)), np.asarray(getattr(st_ref, f)),
            rtol=1e-9, atol=1e-11, err_msg=f)


def test_dd_unstructured_tet_mesh(devices):
    """DG domain decomposition on an UNSTRUCTURED (tet) mesh — the
    partitioner and halo machinery are mesh-agnostic."""
    from fem_glass_tempering_tpu.fem.mesh import box_mesh_3d

    mesh = box_mesh_3d(2, 2, 2, cell_type="tet")
    cfg = _cfg(2)
    ref = ThermoViscoProblem(mesh=mesh, config=cfg)
    ref.setup()
    st_ref = ref.solve()
    dd = DDProblem(mesh, cfg, n_parts=8, devices=devices)
    st = dd.init_state()
    for _ in range(2):
        st, ok, *_ = dd.step(st)
        assert ok
    np.testing.assert_allclose(dd.gather_T(st), np.asarray(st_ref.T),
                               rtol=1e-10, atol=1e-9)
