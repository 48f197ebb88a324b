"""Solving a different PDE through the generic weak-form layer.

Demonstrates that the framework is a general small-FEM kernel, not a
single-purpose tempering code: steady nonlinear reaction-diffusion
  -div(k(u) grad u) + u^3 = f     on a 2D plate, Dirichlet walls,
with k(u) = 1 + 0.1 u (solution-dependent conductivity), solved by the
same matrix-free Newton-CG machinery.
"""

import jax

jax.config.update("jax_enable_x64", True)  # tight Newton tolerance needs f64

import jax.numpy as jnp
import numpy as np

from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace
from fem_glass_tempering_tpu.fem.mesh import box_mesh_2d
from fem_glass_tempering_tpu.ops.forms import ScalarResidualForm
from fem_glass_tempering_tpu.solver.newton import newton_solve

mesh = box_mesh_2d(32, 32)
fs = FunctionSpace(mesh, "CG", 2)
bd = fs.boundary_scalar_dofs()

form = ScalarResidualForm(
    fs,
    cell_source=lambda u, gu, x: u**3 - 10.0,
    cell_flux=lambda u, gu, x: (1.0 + 0.1 * u)[..., None] * gu,
    bc_dofs=bd, bc_values=0.0,
    quad_degree=6,
)

res = newton_solve(form.residual, jnp.zeros(fs.n_scalar_dofs),
                   rtol=1e-12, cg_rtol=1e-12, cg_max_it=2000)
u = np.asarray(res.x)
print(f"converged={bool(res.converged)} newton={int(res.iters)} "
      f"cg={int(res.krylov_iters)}  u_max={u.max():.6f}")
