from fem_glass_tempering_tpu.parallel.sharding import (  # noqa: F401
    make_device_mesh,
    shard_problem,
)
