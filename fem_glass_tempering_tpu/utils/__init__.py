from fem_glass_tempering_tpu.utils.native import (  # noqa: F401
    native_available,
    native_build_facets,
    native_parse_msh,
    native_partition_bfs,
)
