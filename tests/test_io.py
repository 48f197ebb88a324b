"""Output writers + checkpoint/resume tests."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from fem_glass_tempering_tpu.config import FEConfig, OutputConfig, RunConfig, TimeConfig
from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace
from fem_glass_tempering_tpu.fem.mesh import box_mesh_2d, interval_mesh
from fem_glass_tempering_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from fem_glass_tempering_tpu.io.vtu import VTUSeriesWriter, write_vtu
from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem


def test_write_vtu_roundtrip_xml(tmp_path):
    m = box_mesh_2d(3, 2)
    fs = FunctionSpace(m, "CG", 1)
    T = np.linspace(0, 1, fs.n_scalar_dofs)
    path = str(tmp_path / "out.vtu")
    write_vtu(path, m, {"T": (fs, T)})
    root = ET.parse(path).getroot()
    assert root.tag == "VTKFile"
    piece = root.find(".//Piece")
    assert piece.get("NumberOfPoints") == str(m.n_nodes)
    assert piece.get("NumberOfCells") == str(m.n_cells)
    names = [d.get("Name") for d in root.findall(".//PointData/DataArray")]
    assert "T" in names


def test_vtu_series_pvd(tmp_path):
    m = interval_mesh(4)
    fs = FunctionSpace(m, "CG", 1)
    w = VTUSeriesWriter(str(tmp_path), "series", m)
    for i in range(3):
        w.write(0.1 * i, {"T": (fs, np.full(fs.n_scalar_dofs, float(i)))})
    w.close()
    pvd = ET.parse(str(tmp_path / "series.pvd")).getroot()
    assert len(pvd.findall(".//DataSet")) == 3


def test_xdmf_writer(tmp_path):
    h5py = pytest.importorskip("h5py")
    from fem_glass_tempering_tpu.io.xdmf import XDMFWriter

    m = box_mesh_2d(2, 2)
    fs = FunctionSpace(m, "CG", 1, value_shape=(2, 2))
    w = XDMFWriter(str(tmp_path / "sigma.xdmf"), m)
    sig = np.random.default_rng(0).random((fs.n_scalar_dofs, 2, 2))
    w.write_function("sigma", fs, sig, 0.0)
    w.close()
    root = ET.parse(str(tmp_path / "sigma.xdmf")).getroot()
    assert root.tag == "Xdmf"
    with h5py.File(str(tmp_path / "sigma.h5")) as f:
        assert f["mesh/geometry"].shape == (m.n_nodes, 3)
        np.testing.assert_allclose(
            f["fields/sigma/0"][...], sig.reshape(m.n_nodes, 4))


def _cfg(n_steps, **out):
    return RunConfig(
        fe=FEConfig(),
        time=TimeConfig(0.0, n_steps * 0.1, 0.1),
        output=OutputConfig(**out),
    )


def test_solve_writes_all_formats(tmp_path):
    cfg = _cfg(4, output_dir=str(tmp_path), write_every=2,
               formats=("npz", "vtu", "xdmf"))
    prob = ThermoViscoProblem(config=cfg)
    prob.setup()
    prob.solve()
    assert os.path.exists(tmp_path / "series.npz")
    assert os.path.exists(tmp_path / "visco.pvd")
    assert os.path.exists(tmp_path / "sigma.xdmf")
    with np.load(tmp_path / "series.npz") as z:
        assert len(z["times"]) == 2
        assert z["T"].shape[0] == 2
        assert z["sigma"].ndim == 4


def test_checkpoint_resume_bitwise(tmp_path):
    """10 straight steps == 5 steps + checkpoint + resume + 5 steps,
    bitwise (same per-step execution path on both sides)."""
    cfg = _cfg(10, write_every=0, formats=())
    probA = ThermoViscoProblem(config=cfg)
    probA.setup()
    for _ in range(10):
        probA.solve_timestep()
    stA = probA.state

    probB = ThermoViscoProblem(config=cfg)
    probB.setup()
    for _ in range(5):
        probB.solve_timestep()
    ckpt = str(tmp_path / "ck.npz")
    probB.save_checkpoint(ckpt)

    probC = ThermoViscoProblem(config=cfg)
    probC.setup()
    probC.resume_from(ckpt)
    assert probC.t == pytest.approx(0.5)
    for _ in range(5):
        probC.solve_timestep()

    for f in ("T", "Tf", "Tf_partial", "sigma", "sigma_partial", "xi"):
        np.testing.assert_array_equal(
            np.asarray(getattr(stA, f)), np.asarray(getattr(probC.state, f)),
            err_msg=f)


def test_multistep_matches_per_step_tolerance():
    """The fused fori_loop multi-step path matches per-step execution to fp
    roundoff (different XLA fusion, same math)."""
    cfg = _cfg(10, write_every=0, formats=())
    pA = ThermoViscoProblem(config=cfg)
    pA.setup()
    stA = pA.solve()
    pB = ThermoViscoProblem(config=cfg)
    pB.setup()
    for _ in range(10):
        pB.solve_timestep()
    np.testing.assert_allclose(
        np.asarray(stA.T), np.asarray(pB.state.T), rtol=1e-12)


def test_checkpoint_meta_config(tmp_path):
    cfg = _cfg(2, write_every=0, formats=())
    prob = ThermoViscoProblem(config=cfg)
    prob.setup()
    prob.solve_timestep()
    p = str(tmp_path / "c.npz")
    prob.save_checkpoint(p)
    state, meta = load_checkpoint(p)
    assert meta["config"]["physics_mode"] == "reference"
    assert meta["extra"]["t"] == pytest.approx(0.1)
