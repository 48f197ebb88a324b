"""Coupled-solve E2E smoke + invariants for the BASELINE.md config family:
2D plate cross-section (CG-2, refined), 3D plate (hex + tet, CG-1/2)."""

import numpy as np
import pytest

from fem_glass_tempering_tpu.config import FEConfig, OutputConfig, RunConfig, TimeConfig
from fem_glass_tempering_tpu.fem.mesh import box_mesh_2d, box_mesh_3d
from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem


def _run(mesh, fe, n_steps=5):
    cfg = RunConfig(
        fe=fe, time=TimeConfig(0.0, n_steps * 0.1, 0.1),
        output=OutputConfig(write_every=0, formats=()),
    )
    prob = ThermoViscoProblem(mesh=mesh, config=cfg)
    prob.setup()
    st = prob.solve()
    return prob, st


def _check_invariants(prob, st):
    p = prob.params
    T = np.asarray(st.T)
    Tf = np.asarray(st.Tf)
    sig = np.asarray(st.sigma)
    assert np.all(np.isfinite(T)) and np.all(np.isfinite(sig))
    assert T.min() > p.T_ambient and T.max() <= p.T_0 + 0.5
    # fictive temperature lags the cooling
    assert Tf.min() >= T.min() - 1e-9
    # stress tensor symmetric
    np.testing.assert_allclose(sig, np.swapaxes(sig, -1, -2), atol=1e-12)
    # reference mode: purely isotropic strain -> zero deviatoric partials
    np.testing.assert_allclose(np.asarray(st.s_partial), 0.0, atol=1e-14)


def test_2d_plate_cg2():
    """BASELINE config 2: 2D plate cross-section, CG-2, refined mesh."""
    mesh = box_mesh_2d(12, 6, 2.0, 1.0)
    prob, st = _run(mesh, FEConfig(T_family="CG", T_degree=2,
                                   sigma_family="CG", sigma_degree=2))
    _check_invariants(prob, st)
    # corners cool fastest (two exposed faces)
    T = np.asarray(st.T)
    x = prob.fs_T.dof_coords
    corner = np.argmin(np.linalg.norm(x, axis=1))
    center = np.argmin(np.linalg.norm(x - [1.0, 0.5], axis=1))
    assert T[corner] < T[center]


def test_2d_plate_dg1_sipg():
    """BASELINE config 3: DG with interior-penalty facet terms, 2D."""
    mesh = box_mesh_2d(8, 8)
    prob, st = _run(mesh, FEConfig(T_family="DG", T_degree=1))
    _check_invariants(prob, st)


def test_3d_plate_hex_cg1():
    """BASELINE config 4 (moderate size): 3D hex plate."""
    mesh = box_mesh_3d(6, 6, 3, 1.0, 1.0, 0.1)
    prob, st = _run(mesh, FEConfig(T_family="CG", T_degree=1), n_steps=3)
    _check_invariants(prob, st)


def test_3d_plate_tet_cg2():
    """3D tet mesh at higher order (matrix-free Newton-Krylov)."""
    mesh = box_mesh_3d(3, 3, 2, cell_type="tet")
    prob, st = _run(mesh, FEConfig(T_family="CG", T_degree=2,
                                   sigma_family="CG", sigma_degree=1), n_steps=2)
    _check_invariants(prob, st)


def test_3d_dg1_hex():
    """3D SIPG-DG on hexes (interior facets in all three directions)."""
    mesh = box_mesh_3d(4, 4, 2)
    prob, st = _run(mesh, FEConfig(T_family="DG", T_degree=1), n_steps=2)
    _check_invariants(prob, st)
