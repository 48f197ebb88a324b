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


# ----------------------------------------------------------------------
# gmsh physical groups / mesh tags (reference geometry.py:23-24 writes the
# group; dolfinx gmshio.read_from_msh returns (mesh, cell_tags, facet_tags),
# ThermoViscoProblem.py:27-28)
# ----------------------------------------------------------------------

def _tagged_mesh_file(tmp_path):
    from fem_glass_tempering_tpu.fem.mshio import write_msh

    m = box_mesh_2d(4, 3)
    ct = np.where(m.nodes[m.cells].mean(axis=1)[:, 0] < 0.5, 1, 2).astype(
        np.int32)
    rc = m.ref_cell
    fmids = np.array([
        m.nodes[m.cells[c][list(rc.facets[lf])]].mean(axis=0)
        for c, lf in zip(m.boundary_cell, m.boundary_local_facet)])
    ftags = np.where(fmids[:, 0] < 1e-12, 7, -1).astype(np.int32)
    path = str(tmp_path / "tagged.msh")
    write_msh(path, m, cell_tags=ct, facet_tags=ftags,
              physical_names={"left_half": (2, 1), "right_half": (2, 2),
                              "west": (1, 7)})
    return path, m, ct, ftags


def test_msh_physical_groups_roundtrip(tmp_path):
    from fem_glass_tempering_tpu.fem.mesh import read_msh

    path, m, ct, ftags = _tagged_mesh_file(tmp_path)
    m2 = read_msh(path)
    assert m2.cell_tags is not None
    assert int((m2.cell_tags == 1).sum()) == int((ct == 1).sum())
    assert m2.physical_names["west"] == (1, 7)
    # facet enumeration is normalized identically on write/read meshes
    west = m2.boundary_facets_with_tag("west")
    assert int(west.sum()) == int((ftags == 7).sum())
    # name-based cell selection
    assert int(m2.cells_with_tag("right_half").sum()) == int((ct == 2).sum())


def test_msh_tags_native_numpy_identical(tmp_path):
    import fem_glass_tempering_tpu.utils.native as natmod
    from fem_glass_tempering_tpu.fem.mesh import read_msh

    path, *_ = _tagged_mesh_file(tmp_path)
    if not natmod.native_available():
        import pytest
        pytest.skip("native library unavailable")
    m_nat = read_msh(path)
    lib, tried = natmod._LIB, natmod._TRIED
    try:
        natmod._LIB, natmod._TRIED = None, True  # force numpy fallback
        m_np = read_msh(path)
    finally:
        natmod._LIB, natmod._TRIED = lib, tried
    np.testing.assert_array_equal(m_nat.cells, m_np.cells)
    np.testing.assert_array_equal(m_nat.cell_tags, m_np.cell_tags)
    np.testing.assert_array_equal(m_nat.boundary_facet_tags,
                                  m_np.boundary_facet_tags)


def test_tag_selected_flux_and_dirichlet(tmp_path):
    """setup(flux_tag=...) applies the radiation+convection flux on exactly
    the tagged facets — equivalent to the coordinate flux_marker — and
    dirichlet_tag clamps exactly the tagged facets' dofs."""
    from fem_glass_tempering_tpu.config import (
        FEConfig, RunConfig, SolverConfig, TimeConfig,
    )
    from fem_glass_tempering_tpu.fem.mesh import read_msh
    from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem

    path, *_ = _tagged_mesh_file(tmp_path)
    mesh = read_msh(path)
    cfg = RunConfig(
        fe=FEConfig(T_family="CG", T_degree=1,
                    sigma_family="CG", sigma_degree=1),
        time=TimeConfig(0.0, 0.2, 0.1),
        solver=SolverConfig(preconditioner="jacobi"),
    )
    p1 = ThermoViscoProblem(mesh=mesh, config=cfg)
    p1.setup(flux_tag="west")
    p2 = ThermoViscoProblem(mesh=mesh, config=cfg)
    p2.setup(flux_marker=lambda x: x[:, 0] < 1e-12)
    rng = np.random.default_rng(5)
    T = 700 + 100 * rng.random(p1.fs_T.n_scalar_dofs)
    Tp = 700 + 100 * rng.random(p1.fs_T.n_scalar_dofs)
    import jax.numpy as jnp
    r1 = p1.heat.residual(jnp.asarray(T), jnp.asarray(Tp))
    r2 = p2.heat.residual(jnp.asarray(T), jnp.asarray(Tp))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-14)

    p3 = ThermoViscoProblem(mesh=mesh, config=cfg)
    p3.setup(dirichlet_tag="west")
    bd = np.where(np.asarray(p3.heat.bc_mask))[0]
    assert len(bd) > 0
    assert np.all(p3.fs_T.dof_coords[bd, 0] < 1e-12)
    assert len(bd) == 4  # ny=3 -> 4 nodes on x=0
