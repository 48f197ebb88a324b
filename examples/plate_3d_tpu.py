"""3D float-glass plate tempering on TPU (the BASELINE.md north-star
config): f32 perf mode, optional sharding over all visible chips, VTU
output every 50 steps."""

import jax

jax.config.update("jax_default_matmul_precision", "highest")

from fem_glass_tempering_tpu.config import (
    FEConfig, OutputConfig, RunConfig, SolverConfig, TimeConfig,
)
from fem_glass_tempering_tpu.fem.mesh import box_mesh_3d
from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem
from fem_glass_tempering_tpu.parallel.sharding import make_device_mesh, shard_problem

mesh = box_mesh_3d(32, 32, 8, lx=1.0, ly=1.0, lz=0.01)
cfg = RunConfig(
    fe=FEConfig(T_family="CG", T_degree=1),
    time=TimeConfig(0.0, 10.0, 0.1),
    solver=SolverConfig(newton_rtol=1e-5, newton_atol=1e-6, cg_rtol=1e-5),
    output=OutputConfig(write_every=50, formats=("npz", "vtu")),
    dtype="float32",
)
prob = ThermoViscoProblem(mesh=mesh, config=cfg)
prob.setup()
if len(jax.devices()) > 1:
    shard_problem(prob, make_device_mesh(jax.devices()))
prob.solve(progress=True)
print(f"newton iters: {prob.diagnostics.newton_iters}, "
      f"krylov iters: {prob.diagnostics.krylov_iters}")
