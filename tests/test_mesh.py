"""Mesh builder and connectivity tests."""

import numpy as np
import pytest

from fem_glass_tempering_tpu.fem.mesh import (
    Mesh,
    box_mesh_2d,
    box_mesh_3d,
    graded_interval_mesh,
    interval_mesh,
    reference_glass_mesh_1d,
)
from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace


def test_interval_mesh_facets():
    m = interval_mesh(10, 0.0, 2.0)
    assert m.n_cells == 10 and m.n_nodes == 11
    assert m.n_boundary_facets == 2
    assert m.n_interior_facets == 9
    np.testing.assert_allclose(m.cell_diameters(), 0.2)


def test_reference_glass_mesh():
    """Replicates the gmsh sizing of reference geometry.py:7-14: fine (~0.1)
    elements at both surfaces, coarse (~3.0) in the core, domain [0, 50]."""
    m = reference_glass_mesh_1d()
    x = m.nodes[:, 0]
    assert x[0] == 0.0 and x[-1] == 50.0
    assert np.all(np.diff(x) > 0)
    h = np.diff(x)
    assert h[0] == pytest.approx(0.1, rel=0.35)
    assert h[-1] == pytest.approx(0.1, rel=0.35)
    assert h.max() == pytest.approx(3.0, rel=0.35)
    # density comparable to gmsh's (~48 cells)
    assert 35 <= m.n_cells <= 65


def test_box_2d_quad():
    m = box_mesh_2d(4, 3, 2.0, 1.5)
    assert m.n_cells == 12
    assert m.n_nodes == 20
    assert m.n_boundary_facets == 2 * (4 + 3)
    # interior: horizontal (4*(3-1)) wait: edges between cells
    assert m.n_interior_facets == 3 * (4 - 1) + 4 * (3 - 1)


def test_box_2d_triangle_area():
    m = box_mesh_2d(3, 3, 1.0, 1.0, cell_type="triangle")
    xc = m.cell_vertex_coords()
    v1 = xc[:, 1] - xc[:, 0]
    v2 = xc[:, 2] - xc[:, 0]
    areas = 0.5 * np.abs(v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0])
    np.testing.assert_allclose(areas.sum(), 1.0, rtol=1e-12)


def test_box_3d_hex():
    m = box_mesh_3d(2, 2, 2)
    assert m.n_cells == 8
    assert m.n_nodes == 27
    assert m.n_boundary_facets == 24
    assert m.n_interior_facets == 12


def test_box_3d_tet_volume():
    m = box_mesh_3d(2, 2, 2, cell_type="tet")
    assert m.n_cells == 48
    xc = m.cell_vertex_coords()
    v = xc[:, 1:] - xc[:, :1]
    vols = np.abs(np.linalg.det(v)) / 6.0
    np.testing.assert_allclose(vols.sum(), 1.0, rtol=1e-12)
    # Kuhn subdivision must be conforming: every interior facet shared by 2
    assert m.n_interior_facets > 0


def test_interior_facet_orientation():
    m = interval_mesh(5)
    # '+' side is the lower cell index
    assert np.all(m.interior_cell_p < m.interior_cell_m)


@pytest.mark.parametrize("family,degree,expected", [
    ("CG", 1, 11), ("CG", 2, 21), ("DG", 1, 20),
])
def test_functionspace_1d_dof_counts(family, degree, expected):
    m = interval_mesh(10)
    fs = FunctionSpace(m, family, degree)
    assert fs.n_scalar_dofs == expected


def test_functionspace_2d_cg2_dedup():
    m = box_mesh_2d(2, 2, cell_type="quad")
    fs = FunctionSpace(m, "CG", 2)
    # biquadratic on 2x2 grid: 5x5 nodes
    assert fs.n_scalar_dofs == 25


def test_functionspace_3d_cg1_hex():
    m = box_mesh_3d(3, 2, 2)
    fs = FunctionSpace(m, "CG", 1)
    assert fs.n_scalar_dofs == m.n_nodes


def test_boundary_dofs_interval():
    m = interval_mesh(10, 0.0, 1.0)
    fs = FunctionSpace(m, "CG", 1)
    bd = fs.boundary_scalar_dofs()
    np.testing.assert_allclose(np.sort(fs.dof_coords[bd, 0]), [0.0, 1.0])


def test_boundary_dofs_2d_marker():
    m = box_mesh_2d(4, 4)
    fs = FunctionSpace(m, "CG", 2)
    left = fs.boundary_scalar_dofs(marker=lambda x: x[:, 0] < 1e-12)
    assert len(left) == 9  # 2*4+1 points on x=0 for degree 2
    assert np.all(fs.dof_coords[left, 0] < 1e-12)


def test_ownership_covers_all_dofs():
    m = box_mesh_2d(3, 3, cell_type="triangle")
    fs = FunctionSpace(m, "CG", 2)
    # every dof's owner must actually map back to that dof
    back = fs.dofmap[fs.owner_cell, fs.owner_lpoint]
    np.testing.assert_array_equal(back, np.arange(fs.n_scalar_dofs))
