"""gmsh 4.1 ASCII writer.

Parity with the reference's mesh-generation step (geometry.py:3-29 writes a
.msh via the gmsh kernel): our builders produce Mesh objects directly, and
this writer emits them as gmsh 4.1 files so external tools (or the
reference itself) can consume them. Round-trips through read_msh.
"""

from __future__ import annotations

import numpy as np

from fem_glass_tempering_tpu.fem.mesh import Mesh, _GMSH_PERM

_GMSH_ETYPE = {"interval": 1, "triangle": 2, "quad": 3, "tet": 4, "hex": 5}


def write_msh(path: str, mesh: Mesh, physical_name: str = "cells") -> None:
    etype = _GMSH_ETYPE[mesh.cell_type]
    perm = _GMSH_PERM[mesh.cell_type]
    inv_perm = np.argsort(perm)          # our order -> gmsh order
    cells_gmsh = mesh.cells[:, inv_perm]
    tdim = mesh.tdim
    n_nodes, n_cells = mesh.n_nodes, mesh.n_cells
    pts3 = np.zeros((n_nodes, 3))
    pts3[:, : mesh.gdim] = mesh.nodes

    lines = []
    lines.append("$MeshFormat\n4.1 0 8\n$EndMeshFormat")
    lines.append("$PhysicalNames\n1")
    lines.append(f'{tdim} 0 "{physical_name}"')
    lines.append("$EndPhysicalNames")
    lines.append("$Nodes")
    lines.append(f"1 {n_nodes} 1 {n_nodes}")
    lines.append(f"{tdim} 0 0 {n_nodes}")
    lines.extend(str(i + 1) for i in range(n_nodes))
    lines.extend(f"{p[0]} {p[1]} {p[2]}" for p in pts3)
    lines.append("$EndNodes")
    lines.append("$Elements")
    lines.append(f"1 {n_cells} 1 {n_cells}")
    lines.append(f"{tdim} 0 {etype} {n_cells}")
    for i, c in enumerate(cells_gmsh):
        lines.append(str(i + 1) + " " + " ".join(str(v + 1) for v in c))
    lines.append("$EndElements")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def create_mesh(path: str) -> None:
    """Write the reference's default graded 1D glass mesh to `path`
    (the reference's create_mesh entry point, geometry.py:3-29, without the
    gmsh kernel dependency)."""
    from fem_glass_tempering_tpu.fem.mesh import reference_glass_mesh_1d

    write_msh(path, reference_glass_mesh_1d())
