"""Full tempering simulation: quench a glass plate from above the
transition and recover the classic residual stress profile — surface
COMPRESSION balanced by core TENSION (what makes tempered glass strong).

Requires the beyond-reference physics stack:
  physics_mode="corrected"   (stress history accumulates)
  mechanics="equilibrium"    (quasi-static force balance each step)
  xi_formula="trapezoid"     (physical scaled-time increment; the
                              reference's eq. 19-as-coded is negative while
                              cooling, so nothing ever relaxes)
"""

import dataclasses

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

from fem_glass_tempering_tpu.config import (
    FEConfig, ModelParams, OutputConfig, RunConfig, TimeConfig,
)
from fem_glass_tempering_tpu.fem.mesh import box_mesh_3d
from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem

params = dataclasses.replace(ModelParams(), T_0=900.0)   # melt above Tb=869 K
cfg = RunConfig(
    fe=FEConfig(T_family="CG", T_degree=1),
    time=TimeConfig(0.0, 80.0, 0.1),
    output=OutputConfig(write_every=100, formats=("npz",)),
    params=params,
    physics_mode="corrected", mechanics="equilibrium", xi_formula="trapezoid",
)
mesh = box_mesh_3d(4, 4, 16, 50.0, 50.0, 10.0)   # plate: in-plane >> thickness
prob = ThermoViscoProblem(mesh=mesh, config=cfg)
# cool only the large z-faces; sides insulated
zmark = lambda m: (m[:, 2] < 1e-9) | (m[:, 2] > 10.0 - 1e-9)
prob.setup(flux_marker=zmark)
st = prob.solve(progress=True)

xs = prob.fs_sigma.dof_coords
center = (np.abs(xs[:, 0] - 25) < 1e-9) & (np.abs(xs[:, 1] - 25) < 1e-9)
sig = np.asarray(st.sigma)[:, 0, 0]
z = xs[center][:, 2]
o = np.argsort(z)
pc = sig[center][o]
print("\nthrough-thickness residual sigma_xx at the plate center:")
for zi, si in zip(z[o], pc):
    bar = "#" * int(40 * abs(si) / np.abs(pc).max())
    side = "COMPRESSION" if si < 0 else "tension"
    print(f"  z={zi:5.2f}  {si:+.4f}  {bar}  {side}")
print(f"\nsurface {pc[0]:+.4f} (compression), core {pc[len(pc)//2]:+.4f} "
      f"(tension), ratio {abs(pc[0])/pc[len(pc)//2]:.2f}")
