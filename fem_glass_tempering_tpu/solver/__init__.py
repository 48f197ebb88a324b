from fem_glass_tempering_tpu.solver.krylov import pcg  # noqa: F401
from fem_glass_tempering_tpu.solver.newton import newton_solve, NewtonResult  # noqa: F401
