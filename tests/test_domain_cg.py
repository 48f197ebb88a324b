"""CG-space domain decomposition (shared-dof ghost accumulation) tests."""

import jax
import numpy as np
import pytest

from fem_glass_tempering_tpu.config import FEConfig, OutputConfig, RunConfig, TimeConfig
from fem_glass_tempering_tpu.fem.mesh import box_mesh_2d, box_mesh_3d
from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem
from fem_glass_tempering_tpu.parallel.domain_cg import CGDDProblem


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


def _cfg(n_steps, degree=1):
    return RunConfig(
        fe=FEConfig(T_family="CG", T_degree=degree),
        time=TimeConfig(0.0, n_steps * 0.1, 0.1),
        output=OutputConfig(write_every=0, formats=()),
    )


@pytest.mark.parametrize("mesher,degree", [
    (lambda: box_mesh_2d(6, 4, 2.0, 1.0), 1),
    (lambda: box_mesh_3d(4, 4, 2), 1),
    (lambda: box_mesh_2d(4, 4), 2),
])
def test_cgdd_matches_single_device(devices, mesher, degree, n_steps=4):
    mesh = mesher()
    cfg = _cfg(n_steps, degree)

    ref = ThermoViscoProblem(mesh=mesh, config=cfg)
    ref.setup()
    st_ref = ref.solve()

    dd = CGDDProblem(mesh, cfg, n_parts=8, devices=devices)
    st = dd.init_state()
    for _ in range(n_steps):
        st, ok, ni, ki = dd.step(st)
        assert ok
    T_dd = dd.gather_T(st)
    np.testing.assert_allclose(T_dd, np.asarray(st_ref.T), rtol=1e-10,
                               atol=1e-9)
    sig_dd = dd.gather_sigma(st)
    np.testing.assert_allclose(sig_dd, np.asarray(st_ref.sigma), rtol=1e-8,
                               atol=1e-12)


def test_cgdd_shared_dofs_exist(devices):
    """Sanity: the partition actually creates shared interface dofs."""
    from fem_glass_tempering_tpu.parallel.partition import partition_cells
    from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace

    mesh = box_mesh_2d(6, 4)
    fs = FunctionSpace(mesh, "CG", 1)
    part = partition_cells(mesh, 8)
    touch = {}
    for c in range(mesh.n_cells):
        for g in fs.dofmap[c]:
            touch.setdefault(int(g), set()).add(int(part[c]))
    shared = sum(1 for s in touch.values() if len(s) > 1)
    assert shared >= 5


def test_cgdd_gather_state_matches_single(devices):
    """gather_state produces a global ViscoState usable by the shared
    writers/checkpoint code, matching the single-device run."""
    mesh = box_mesh_3d(4, 4, 2)
    cfg = _cfg(3)
    ref = ThermoViscoProblem(mesh=mesh, config=cfg)
    ref.setup()
    st_ref = ref.solve()
    dd = CGDDProblem(mesh, cfg, n_parts=8, devices=devices)
    st = dd.init_state()
    for _ in range(3):
        st, ok, *_ = dd.step(st)
    g = dd.gather_state(st)
    for f in ("T", "Tf", "Tf_partial", "xi", "sigma", "sigma_partial"):
        np.testing.assert_allclose(
            np.asarray(getattr(g, f)), np.asarray(getattr(st_ref, f)),
            rtol=1e-9, atol=1e-11, err_msg=f)
    # checkpoint round-trip through the shared io path
    from fem_glass_tempering_tpu.io.checkpoint import (
        load_checkpoint, save_checkpoint,
    )
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "dd.npz")
        save_checkpoint(p, g, extra={"t": float(g.t)})
        st2, meta = load_checkpoint(p)
        np.testing.assert_array_equal(np.asarray(st2.T), np.asarray(g.T))
