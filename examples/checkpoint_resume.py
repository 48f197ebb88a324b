"""Checkpoint/resume demo (capability absent in the reference)."""

from fem_glass_tempering_tpu.config import OutputConfig, RunConfig, TimeConfig
from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem

cfg = RunConfig(time=TimeConfig(0.0, 5.0, 0.1),
                output=OutputConfig(write_every=10, checkpoint_every=20))
prob = ThermoViscoProblem(config=cfg)
prob.setup()
prob.solve()

# resume from the last checkpoint and keep going
prob2 = ThermoViscoProblem(config=cfg)
prob2.setup()
prob2.resume_from("output/checkpoint_000040.npz")
for _ in range(10):
    prob2.solve_timestep()
print(f"resumed to t={prob2.t:.2f}")
