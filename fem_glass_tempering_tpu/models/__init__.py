from fem_glass_tempering_tpu.models.thermal import ThermalModel  # noqa: F401
from fem_glass_tempering_tpu.models.viscoelastic import (  # noqa: F401
    PronyTableaus,
    ViscoState,
    ViscoelasticEngine,
)
from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem  # noqa: F401
