from fem_glass_tempering_tpu.fem.reference_elements import ReferenceCell, get_cell  # noqa: F401
from fem_glass_tempering_tpu.fem.quadrature import cell_quadrature, facet_quadrature  # noqa: F401
from fem_glass_tempering_tpu.fem.elements import LagrangeElement  # noqa: F401
from fem_glass_tempering_tpu.fem.mesh import (  # noqa: F401
    Mesh,
    graded_interval_mesh,
    interval_mesh,
    box_mesh_2d,
    box_mesh_3d,
    reference_glass_mesh_1d,
    read_msh,
)
from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace  # noqa: F401
