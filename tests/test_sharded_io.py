"""Per-shard streaming output + sharded checkpoint/resume
(io/sharded.py, GridShardedProblem.solve) — the per-rank ADIOS2 analog
(reference ThermoViscoProblem.py:246-263)."""

import numpy as np
import pytest

from fem_glass_tempering_tpu.config import (
    FEConfig,
    OutputConfig,
    RunConfig,
    SolverConfig,
    TimeConfig,
)
from fem_glass_tempering_tpu.fem.mesh import box_mesh_3d
from fem_glass_tempering_tpu.parallel.grid_shard import GridShardedProblem


def _cfg(tmp, write_every=1, checkpoint_every=0):
    return RunConfig(
        fe=FEConfig(T_family="CG", T_degree=1),
        time=TimeConfig(0.0, 0.3, 0.1),
        solver=SolverConfig(linear_operator="stencil"),
        output=OutputConfig(output_dir=str(tmp), write_every=write_every,
                            formats=("npz",),
                            npz_fields=("T", "Tf", "sigma"),
                            checkpoint_every=checkpoint_every),
    )


@pytest.mark.slow
def test_sharded_streaming_matches_gathered_state(tmp_path):
    """Concatenated per-shard pieces == the full gather, BITWISE (same
    computation, different I/O path), across an uneven shard split."""
    from fem_glass_tempering_tpu.io.sharded import read_sharded_series

    mesh = box_mesh_3d(12, 6, 3, 1.0, 1.0, 0.01)   # 13 planes over 8 devices
    sp = GridShardedProblem(mesh, _cfg(tmp_path))
    st = sp.solve()
    series = read_sharded_series(f"{tmp_path}/sharded_series")
    assert series["T"].shape[0] == 3
    flat = sp.gather_state(st)
    np.testing.assert_array_equal(series["T"][-1], np.asarray(flat.T))
    np.testing.assert_array_equal(series["Tf"][-1], np.asarray(flat.Tf))
    np.testing.assert_array_equal(series["sigma"][-1],
                                  np.asarray(flat.sigma))


@pytest.mark.slow
def test_sharded_checkpoint_resume_bitwise(tmp_path):
    """checkpoint at step 2 -> resume -> step 3 == straight 3-step run,
    bitwise (the restart invariant, reference lacks this entirely)."""
    mesh = box_mesh_3d(12, 6, 3, 1.0, 1.0, 0.01)
    cfg = _cfg(tmp_path, write_every=0)
    sp = GridShardedProblem(mesh, cfg)

    st2, ok, _, _ = sp.run(sp.init_state(), 2)
    assert ok
    sp.save_checkpoint(str(tmp_path / "ck"), st2, extra={"t": 0.2})
    st2b = sp.load_checkpoint(str(tmp_path / "ck"))
    st3_resumed, ok, _, _ = sp.run(st2b, 1)
    assert ok

    st3, ok, _, _ = sp.run(sp.init_state(), 3)
    assert ok
    f1 = sp.gather_state(st3_resumed)
    f2 = sp.gather_state(st3)
    np.testing.assert_array_equal(np.asarray(f1.T), np.asarray(f2.T))
    np.testing.assert_array_equal(np.asarray(f1.sigma),
                                  np.asarray(f2.sigma))


def test_sharded_solve_checkpoint_cadence(tmp_path):
    mesh = box_mesh_3d(12, 6, 3, 1.0, 1.0, 0.01)
    sp = GridShardedProblem(mesh, _cfg(tmp_path, write_every=1,
                                       checkpoint_every=2))
    sp.solve()
    assert (tmp_path / "sharded_ckpt_000002" / "meta.json").exists()


def _dg_cfg(tmp, write_every=1, checkpoint_every=0):
    return RunConfig(
        fe=FEConfig(T_family="DG", T_degree=1),
        time=TimeConfig(0.0, 0.3, 0.1),
        solver=SolverConfig(linear_operator="stencil",
                            newton_rtol=1e-10, cg_rtol=1e-10,
                            cg_max_it=300),
        output=OutputConfig(output_dir=str(tmp), write_every=write_every,
                            formats=("npz",),
                            npz_fields=("T", "Tf", "sigma"),
                            checkpoint_every=checkpoint_every),
        dtype="float64",
    )


@pytest.mark.slow
def test_sharded_dg_streaming_matches_gathered_state(tmp_path):
    """Sharded-DG series writes (cell-grid T-space fields + node-grid
    sigma fields) reassemble BITWISE to the gathered flat state — on a
    cell axis NOT divisible by the device count (ghost cell layers are
    trimmed by the reader)."""
    from fem_glass_tempering_tpu.io.sharded import read_sharded_series

    mesh = box_mesh_3d(12, 6, 3, 1.0, 1.0, 0.01)   # 12 cells / 8 devices
    sp = GridShardedProblem(mesh, _dg_cfg(tmp_path))
    assert sp.cell_pad0 == 4
    st = sp.solve()
    series = read_sharded_series(f"{tmp_path}/sharded_series")
    flat = sp.gather_state(st)
    np.testing.assert_array_equal(series["T"][-1], np.asarray(flat.T))
    np.testing.assert_array_equal(series["Tf"][-1], np.asarray(flat.Tf))
    np.testing.assert_array_equal(series["sigma"][-1],
                                  np.asarray(flat.sigma))


@pytest.mark.slow
def test_sharded_dg_checkpoint_resume_bitwise(tmp_path):
    """Sharded-DG checkpoint at step 2 -> resume -> step 3 == straight
    3-step run, bitwise, with cell-grid state fields."""
    mesh = box_mesh_3d(12, 6, 3, 1.0, 1.0, 0.01)
    sp = GridShardedProblem(mesh, _dg_cfg(tmp_path, write_every=0))

    st2, ok, _, _ = sp.run(sp.init_state(), 2)
    assert ok
    sp.save_checkpoint(str(tmp_path / "ck"), st2, extra={"t": 0.2})
    st2b = sp.load_checkpoint(str(tmp_path / "ck"))
    st3_resumed, ok, _, _ = sp.run(st2b, 1)
    assert ok

    st3, ok, _, _ = sp.run(sp.init_state(), 3)
    assert ok
    f1 = sp.gather_state(st3_resumed)
    f2 = sp.gather_state(st3)
    np.testing.assert_array_equal(np.asarray(f1.T), np.asarray(f2.T))
    np.testing.assert_array_equal(np.asarray(f1.sigma),
                                  np.asarray(f2.sigma))
