from fem_glass_tempering_tpu.solver.krylov import pcg  # noqa: F401
from fem_glass_tempering_tpu.solver.newton import newton_solve, NewtonResult  # noqa: F401
from fem_glass_tempering_tpu.solver.direct import newton_direct, materialize_jacobian  # noqa: F401
from fem_glass_tempering_tpu.solver.multigrid import GeometricMG  # noqa: F401
