"""Generic weak-form layer tests: reproduces the hand-coded heat operator
exactly, and solves an independent nonlinear reaction-diffusion MMS."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from fem_glass_tempering_tpu.config import ModelParams
from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace
from fem_glass_tempering_tpu.fem.mesh import box_mesh_2d, interval_mesh
from fem_glass_tempering_tpu.ops.forms import ScalarResidualForm
from fem_glass_tempering_tpu.ops.heat import HeatOperator
from fem_glass_tempering_tpu.solver.newton import newton_solve


def test_forms_reproduce_heat_operator():
    """The generic layer with the tempering integrands == HeatOperator
    (CG path; identical quadrature)."""
    m = box_mesh_2d(5, 4)
    fs = FunctionSpace(m, "CG", 1)
    p = ModelParams()
    dt = 0.1
    op = HeatOperator(fs, p, dt=dt)
    rng = np.random.default_rng(0)
    T = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    T_prev = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))

    Tpc_q = None  # closure below evaluates T_prev at quad points itself

    form = ScalarResidualForm(
        fs,
        cell_source=lambda u, gu, x, Tp=None: u - Tp - dt * p.f,
        cell_flux=lambda u, gu, x, Tp=None: dt * p.alpha * gu,
        boundary_flux=lambda u, x, n, Tp=None: dt * p.boundary_scale * (
            p.sigma * p.epsilon * (u**4 - p.T_ambient**4)
            + p.htc * (u - p.T_ambient)),
        quad_degree=None,
    )
    # evaluate T_prev at quad points through the same tabulation
    Tp_q = T_prev[form.dofmap] @ form.phi.T
    r_form = form.residual(T, Tp=Tp_q)
    # HeatOperator uses boundary quad degree 5p; rebuild form's boundary at
    # the default won't match — compare cell-only parts by zeroing boundary:
    op_noflux = HeatOperator(
        fs, dataclasses.replace(p, epsilon=0.0, htc=0.0, sigma=0.0), dt=dt)
    form_noflux = ScalarResidualForm(
        fs,
        cell_source=lambda u, gu, x, Tp=None: u - Tp - dt * p.f,
        cell_flux=lambda u, gu, x, Tp=None: dt * p.alpha * gu,
    )
    r1 = op_noflux.residual(T, T_prev)
    r2 = form_noflux.residual(T, Tp=Tp_q)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), rtol=1e-12)
    # full operator vs form with matching boundary quadrature
    form_b = ScalarResidualForm(
        fs,
        cell_source=lambda u, gu, x, Tp=None: u - Tp - dt * p.f,
        cell_flux=lambda u, gu, x, Tp=None: dt * p.alpha * gu,
        boundary_flux=lambda u, x, n, Tp=None: dt * p.boundary_scale * (
            p.sigma * p.epsilon * (u**4 - p.T_ambient**4)
            + p.htc * (u - p.T_ambient)),
        quad_degree=5,
    )
    # same quadrature degree for cells changes nothing for linear terms; the
    # boundary term now matches HeatOperator's 5p rule
    r3 = form_b.residual(T, Tp=T_prev[form_b.dofmap] @ form_b.phi.T)
    r_op = op.residual(T, T_prev)
    np.testing.assert_allclose(np.asarray(r3), np.asarray(r_op), rtol=1e-11)


def test_vector_form_reproduces_elasticity_operator():
    """The generic VECTOR form with the elastic-stress integrand ==
    ops/elasticity.py's hand-coded residual to machine precision — the
    UFL-tensor-surface parity check (reference ThermoViscoProblem.py:280-326
    expresses these forms in UFL tensor algebra)."""
    from fem_glass_tempering_tpu.fem.mesh import box_mesh_3d
    from fem_glass_tempering_tpu.ops.elasticity import ElasticityOperator
    from fem_glass_tempering_tpu.ops.forms import VectorResidualForm

    m = box_mesh_3d(4, 3, 2, 1.0, 1.0, 0.01)
    fs_sig = FunctionSpace(m, "CG", 1, value_shape=(3, 3))
    el = ElasticityOperator(fs_sig)
    d = el.d
    rng = np.random.default_rng(3)
    C, Q = el.qw.shape
    # the two layers differ only in the pin-row convention for INFEASIBLE
    # inputs (elasticity zeroes pins on entry; the generic form reports
    # u - pin_values) — compare on a pin-satisfying input
    u = jnp.asarray(rng.standard_normal((el.n, d)))
    u = jnp.where(el.pin_mask > 0, 0.0, u)
    sigma_hist_q = jnp.asarray(rng.standard_normal((C, Q, d, d)))
    sigma_hist_q = 0.5 * (sigma_hist_q + jnp.swapaxes(sigma_hist_q, -1, -2))
    eps0_q = jnp.asarray(rng.standard_normal((C, Q)))[..., None, None] \
        * jnp.eye(d)
    G_q = jnp.asarray(1.0 + rng.random((C, Q)))
    K_q = jnp.asarray(2.0 + rng.random((C, Q)))

    def stress_flux(uq, guq, xq, *, sig_h, eps0, G, K):
        eps = 0.5 * (guq + jnp.swapaxes(guq, -1, -2)) - eps0
        tr = jnp.trace(eps, axis1=-2, axis2=-1)
        I = jnp.eye(d, dtype=uq.dtype)
        dev = eps - (tr / d)[..., None, None] * I
        return (sig_h + 2.0 * G[..., None, None] * dev
                + K[..., None, None] * tr[..., None, None] * I)

    form = VectorResidualForm(
        fs_sig, value_shape=(d,), cell_flux=stress_flux,
        pin_mask=np.asarray(el.pin_mask), pin_values=0.0)
    r_form = form.residual(u, sig_h=sigma_hist_q, eps0=eps0_q,
                           G=G_q, K=K_q)
    r_op = el.residual(u, sigma_hist_q, eps0_q, G_q, K_q)
    np.testing.assert_allclose(np.asarray(r_form), np.asarray(r_op),
                               rtol=1e-13, atol=1e-14)


def test_vector_form_solves_vector_poisson_mms():
    """Vector Laplace MMS through the generic layer: -Δu_a = f_a with
    u_exact = (sin(pi x) sin(pi y), x(1-x)y(1-y)), Dirichlet pins."""
    from fem_glass_tempering_tpu.ops.forms import VectorResidualForm

    m = box_mesh_2d(16, 16)
    fs = FunctionSpace(m, "CG", 2)
    x = fs.dof_coords
    bd = fs.boundary_scalar_dofs()
    u_ex = np.stack([
        np.sin(np.pi * x[:, 0]) * np.sin(np.pi * x[:, 1]),
        x[:, 0] * (1 - x[:, 0]) * x[:, 1] * (1 - x[:, 1])], axis=1)
    pin = np.zeros((fs.n_scalar_dofs, 2))
    pin[np.asarray(bd)] = 1.0

    def source(uq, guq, xq):
        f0 = -2 * np.pi**2 * jnp.sin(np.pi * xq[..., 0]) \
            * jnp.sin(np.pi * xq[..., 1])
        f1 = -2 * (xq[..., 0] * (1 - xq[..., 0])
                   + xq[..., 1] * (1 - xq[..., 1]))
        return -jnp.stack([f0, f1], axis=-1)

    form = VectorResidualForm(
        fs, value_shape=(2,),
        cell_source=lambda uq, guq, xq: -source(uq, guq, xq),
        cell_flux=lambda uq, guq, xq: guq,
        pin_mask=pin, pin_values=0.0, quad_degree=6)
    res = newton_solve(form.residual,
                       jnp.zeros((fs.n_scalar_dofs, 2)),
                       rtol=1e-12, cg_rtol=1e-12, cg_max_it=4000)
    assert bool(res.converged)
    err = np.abs(np.asarray(res.x) - u_ex).max()
    assert err < 5e-5, err


def test_forms_nonlinear_reaction_diffusion_mms():
    """-Δu + u^3 = f with u_exact = sin(pi x) on [0,1], Dirichlet: solved
    entirely through the generic layer (10 lines of user code)."""
    m = interval_mesh(64)
    fs = FunctionSpace(m, "CG", 2)
    x = fs.dof_coords[:, 0]
    bd = fs.boundary_scalar_dofs()
    u_ex = np.sin(np.pi * x)
    form = ScalarResidualForm(
        fs,
        cell_source=lambda u, gu, xq: u**3 - (
            np.pi**2 * jnp.sin(np.pi * xq[..., 0])
            + jnp.sin(np.pi * xq[..., 0])**3),
        cell_flux=lambda u, gu, xq: gu,
        bc_dofs=bd, bc_values=0.0,
        quad_degree=8,
    )
    res = newton_solve(form.residual, jnp.zeros(fs.n_scalar_dofs),
                       rtol=1e-12, cg_rtol=1e-13, cg_max_it=2000)
    assert bool(res.converged)
    err = np.abs(np.asarray(res.x) - u_ex).max()
    assert err < 2e-5, err


def test_forms_interior_flux_reproduces_heat_sipg():
    """The generic interior-facet surface (dS/jump/avg) reproduces the
    hand-coded SIPG DG heat residual (ops/heat.py:229-254) to machine
    precision — the UFL interior-facet parity check (reference
    ThermoViscoProblem.py:308-326)."""
    from fem_glass_tempering_tpu.ops.forms import avg, jump

    m = box_mesh_2d(6, 5)
    fs = FunctionSpace(m, "DG", 1)
    p = ModelParams()
    dt = 0.1
    qd = 3  # one shared rule so cell/boundary/interior tables all match
    op = HeatOperator(fs, p, dt=dt, quad_degree=qd)
    rng = np.random.default_rng(7)
    T = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))
    T_prev = jnp.asarray(700 + 100 * rng.random(fs.n_scalar_dofs))

    coef = dt * p.alpha

    def sipg(up, um, dup, dum, x, n, h, **_):
        j = jump(up, um)
        ad = avg(dup, dum)
        ph = (p.dg_penalty / h)[:, None]
        return (coef * (ph * j - ad), coef * (-ph * j + ad),
                -coef * 0.5 * j, -coef * 0.5 * j)

    form = ScalarResidualForm(
        fs,
        cell_source=lambda u, gu, x, Tp=None: u - Tp - dt * p.f,
        cell_flux=lambda u, gu, x, Tp=None: dt * p.alpha * gu,
        boundary_flux=lambda u, x, n, Tp=None: dt * p.boundary_scale * (
            p.sigma * p.epsilon * (u**4 - p.T_ambient**4)
            + p.htc * (u - p.T_ambient)),
        interior_flux=sipg,
        quad_degree=qd,
    )
    Tp_q = T_prev[form.dofmap] @ form.phi.T
    r_form = form.residual(T, Tp=Tp_q)
    r_op = op.residual(T, T_prev)
    np.testing.assert_allclose(np.asarray(r_form), np.asarray(r_op),
                               rtol=1e-11, atol=1e-13)


def test_forms_dg_sipg_poisson_mms():
    """User-level SIPG through the eDSL: a custom DG-1 reaction-diffusion
    PDE (-u'' + u = f, natural BCs, u_exact = cos(pi x)) that the generic
    layer could not express before interior_flux existed."""
    from fem_glass_tempering_tpu.ops.forms import avg, jump

    errs = []
    for n in (32, 64):
        m = interval_mesh(n)
        fs = FunctionSpace(m, "DG", 1)
        pen = 10.0

        def sipg(up, um, dup, dum, x, nrm, h, **_):
            j = jump(up, um)
            ad = avg(dup, dum)
            ph = (pen / h)[:, None]
            return (ph * j - ad, -ph * j + ad, -0.5 * j, -0.5 * j)

        form = ScalarResidualForm(
            fs,
            cell_source=lambda u, gu, xq: u - (np.pi**2 + 1.0) * jnp.cos(
                np.pi * xq[..., 0]),
            cell_flux=lambda u, gu, xq: gu,
            interior_flux=sipg,
            quad_degree=4,
        )
        res = newton_solve(form.residual, jnp.zeros(fs.n_scalar_dofs),
                           rtol=1e-12, cg_rtol=1e-13, cg_max_it=4000)
        assert bool(res.converged)
        u_ex = np.cos(np.pi * fs.dof_coords[:, 0])
        errs.append(np.abs(np.asarray(res.x) - u_ex).max())
    assert errs[1] < 2e-3, errs
    # second-order convergence of the SIPG discretization
    assert errs[0] / errs[1] > 3.0, errs
