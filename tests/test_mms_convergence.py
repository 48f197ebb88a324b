"""Method-of-manufactured-solutions convergence-order tests for the heat
operator's diffusion discretization (SURVEY.md §4 pyramid level 2).

Steady -alpha Laplace(u) = f with homogeneous Dirichlet BCs via one huge
implicit step; u_exact = prod sin(pi x_i). L2 errors must converge at order
p+1 for degree-p Lagrange elements.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from fem_glass_tempering_tpu.config import ModelParams
from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace
from fem_glass_tempering_tpu.fem.mesh import box_mesh_2d, interval_mesh
from fem_glass_tempering_tpu.ops.assembly import build_cell_geometry
from fem_glass_tempering_tpu.ops.heat import HeatOperator
from fem_glass_tempering_tpu.solver.newton import newton_solve

NOFLUX = dict(epsilon=0.0, htc=0.0, sigma=0.0, alpha=1.0)


def _solve_mms(mesh, family, degree):
    fs = FunctionSpace(mesh, family, degree)
    d = mesh.gdim
    x = fs.dof_coords
    u_exact_dofs = np.prod(np.sin(np.pi * x), axis=1)
    f_dofs = d * np.pi**2 * u_exact_dofs
    bd = fs.boundary_scalar_dofs()
    p = dataclasses.replace(ModelParams(), **NOFLUX)
    dt = 1e8
    op = HeatOperator(fs, p, dt=dt, bc_dofs=bd, bc_value=0.0, source=f_dofs)
    T0 = jnp.zeros(fs.n_scalar_dofs)
    res = newton_solve(lambda T: op.residual(T, T0), T0,
                       jac_diag_fn=op.jacobian_diag,
                       rtol=1e-13, cg_rtol=1e-13, cg_max_it=4000)
    assert bool(res.converged)
    # L2 error by high-order quadrature
    cg = build_cell_geometry(mesh, fs, quad_degree=2 * degree + 3)
    u_q = np.einsum("ql,cl->cq", cg.phi, np.asarray(res.x)[fs.dofmap])
    u_ex_q = np.prod(np.sin(np.pi * cg.qpoints_phys), axis=-1)
    err = np.sqrt(np.sum(cg.qweights * (u_q - u_ex_q) ** 2))
    return err


def _order(errs, hs):
    return np.polyfit(np.log(hs), np.log(errs), 1)[0]


@pytest.mark.parametrize("family,degree,expected", [
    ("CG", 1, 2.0), ("CG", 2, 3.0), ("CG", 3, 4.0),
])
def test_convergence_1d(family, degree, expected):
    ns = [8, 16, 32]
    errs = [_solve_mms(interval_mesh(n), family, degree) for n in ns]
    order = _order(errs, [1.0 / n for n in ns])
    assert order > expected - 0.3, (order, errs)


@pytest.mark.parametrize("cell,family,degree,expected", [
    ("quad", "CG", 1, 2.0),
    ("quad", "CG", 2, 3.0),
    ("triangle", "CG", 1, 2.0),
    ("triangle", "CG", 2, 3.0),
])
def test_convergence_2d(cell, family, degree, expected):
    ns = [4, 8, 16]
    errs = [
        _solve_mms(box_mesh_2d(n, n, cell_type=cell), family, degree)
        for n in ns
    ]
    order = _order(errs, [1.0 / n for n in ns])
    assert order > expected - 0.35, (order, errs)
