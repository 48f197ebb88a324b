"""User-level SIPG through the weak-form eDSL.

The reference lets a user write interior-penalty DG forms in UFL with
jump/avg/FacetNormal over the dS measure (ThermoViscoProblem.py:308-326).
This example does the same through `ScalarResidualForm.interior_flux`:
a custom DG-1 reaction-diffusion PDE

    -div(grad u) + u = f     on [0,1]^2,  natural BCs,
    u_exact = cos(pi x) cos(pi y),  f = (2 pi^2 + 1) u_exact

that is NOT one of the built-in operators — exactly the "express your own
DG PDE" capability UFL provides. Run: python examples/custom_dg_sipg.py
"""

import jax
import numpy as np

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace  # noqa: E402
from fem_glass_tempering_tpu.fem.mesh import box_mesh_2d  # noqa: E402
from fem_glass_tempering_tpu.ops.forms import (  # noqa: E402
    ScalarResidualForm,
    avg,
    jump,
)
from fem_glass_tempering_tpu.solver.newton import newton_solve  # noqa: E402


def solve(n):
    mesh = box_mesh_2d(n, n)
    fs = FunctionSpace(mesh, "DG", 1)
    penalty = 10.0

    def u_exact(x):
        return jnp.cos(np.pi * x[..., 0]) * jnp.cos(np.pi * x[..., 1])

    # SIPG: (pen/h)<[[v]],[[u]]> - <{grad u}.n,[[v]]> - <[[u]],{grad v}.n>
    # expressed as the four (v+, v-, dn v+, dn v-) coefficient arrays
    def sipg(up, um, dup, dum, x, nrm, h, **_):
        j = jump(up, um)
        ad = avg(dup, dum)
        ph = (penalty / h)[:, None]
        return (ph * j - ad, -ph * j + ad, -0.5 * j, -0.5 * j)

    form = ScalarResidualForm(
        fs,
        cell_source=lambda u, gu, x: u - (2 * np.pi**2 + 1) * u_exact(x),
        cell_flux=lambda u, gu, x: gu,
        interior_flux=sipg,
        quad_degree=4,
    )
    res = newton_solve(form.residual, jnp.zeros(fs.n_scalar_dofs),
                       rtol=1e-12, cg_rtol=1e-13, cg_max_it=8000)
    assert bool(res.converged)
    err = float(np.abs(
        np.asarray(res.x)
        - np.asarray(u_exact(jnp.asarray(fs.dof_coords)))).max())
    return fs.n_scalar_dofs, err


if __name__ == "__main__":
    prev = None
    for n in (8, 16, 32):
        ndof, err = solve(n)
        rate = "" if prev is None else f"  rate {np.log2(prev / err):.2f}"
        print(f"n={n:3d}  dofs={ndof:6d}  Linf err={err:.3e}{rate}")
        prev = err
