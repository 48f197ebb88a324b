from fem_glass_tempering_tpu.ops.assembly import (  # noqa: F401
    CellGeometry,
    FacetGeometry,
    InteriorFacetGeometry,
    build_cell_geometry,
    build_boundary_geometry,
    build_interior_geometry,
)
from fem_glass_tempering_tpu.ops.interpolation import CrossEval, build_cross_eval  # noqa: F401
