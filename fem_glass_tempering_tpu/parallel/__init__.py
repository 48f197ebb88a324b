from fem_glass_tempering_tpu.parallel.sharding import (  # noqa: F401
    make_device_mesh,
    shard_problem,
)
from fem_glass_tempering_tpu.parallel.partition import (  # noqa: F401
    partition_cells,
    build_dd_layout,
)
from fem_glass_tempering_tpu.parallel.domain import DDProblem  # noqa: F401
from fem_glass_tempering_tpu.parallel.domain_cg import CGDDProblem  # noqa: F401
