"""Native C++ runtime (csrc/runtime.cpp) vs numpy-fallback equivalence."""

import numpy as np
import pytest

from fem_glass_tempering_tpu.fem.mesh import (
    Mesh,
    box_mesh_2d,
    box_mesh_3d,
    read_msh,
    reference_glass_mesh_1d,
)
from fem_glass_tempering_tpu.utils.native import (
    native_available,
    native_build_facets,
    native_parse_msh,
    native_partition_bfs,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library not built")


@pytest.mark.parametrize("mesher", [
    lambda: reference_glass_mesh_1d(),
    lambda: box_mesh_2d(5, 4),
    lambda: box_mesh_2d(4, 4, cell_type="triangle"),
    lambda: box_mesh_3d(3, 2, 2),
    lambda: box_mesh_3d(2, 2, 2, cell_type="tet"),
])
def test_native_facets_bitwise_match(mesher):
    m = mesher()
    nat = native_build_facets(m.cells, m.ref_cell)
    ref = m._build_facets_numpy()
    for a, b in zip(nat, ref):
        np.testing.assert_array_equal(a, b)


def test_native_msh_parser_matches_python(tmp_path):
    """Write a small msh 4.1 file; both parsers must agree."""
    msh = """$MeshFormat
4.1 0 8
$EndMeshFormat
$Nodes
1 4 1 4
1 1 0 4
1
2
3
4
0 0 0
1 0 0
2 0 0
3.5 0 0
$EndNodes
$Elements
1 3 1 3
1 1 1 3
1 1 2
2 2 3
3 3 4
$EndElements
"""
    p = tmp_path / "test.msh"
    p.write_text(msh)
    m = read_msh(str(p))           # native path (if available)
    assert m.cell_type == "interval"
    assert m.n_cells == 3 and m.n_nodes == 4
    np.testing.assert_allclose(m.nodes[:, 0], [0, 1, 2, 3.5])
    np.testing.assert_array_equal(m.cells, [[0, 1], [1, 2], [2, 3]])
    nat = native_parse_msh(str(p))
    assert nat is not None and nat[2] == 1


def test_native_bfs_partition_contiguous():
    m = box_mesh_2d(8, 8)
    part = native_partition_bfs(m, 4)
    assert part is not None
    counts = np.bincount(part, minlength=4)
    assert counts.min() >= 12 and counts.max() <= 20
    assert set(part) == {0, 1, 2, 3}
