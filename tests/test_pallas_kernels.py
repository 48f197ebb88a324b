"""Pallas kernel tests (interpret mode on CPU; numerics vs jnp reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fem_glass_tempering_tpu.config import ModelParams
from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace
from fem_glass_tempering_tpu.fem.mesh import reference_glass_mesh_1d
from fem_glass_tempering_tpu.models.viscoelastic import LAMBDA_M_N, M_N
from fem_glass_tempering_tpu.ops.assembly import build_cell_geometry
from fem_glass_tempering_tpu.ops.pallas_kernels import (
    make_dg_cell_residual,
    material_tspace_pallas,
    material_tspace_reference,
)

P = ModelParams()


def test_material_tspace_matches_reference():
    rng = np.random.default_rng(0)
    n = 1000
    T = jnp.asarray(700.0 + 100 * rng.random(n))
    T_prev = jnp.asarray(T + rng.normal(0, 5, n))
    Tfp = jnp.asarray(750.0 + 50 * rng.random((n, 6)))
    kw = dict(dt=0.1, H_over_Rg=P.H / P.Rg, Tb=P.Tb,
              m_n=jnp.asarray(M_N), lambda_m_n=jnp.asarray(LAMBDA_M_N))
    ref = material_tspace_reference(T, T_prev, Tfp, **kw)
    out = material_tspace_pallas(T, T_prev, Tfp, interpret=True, **kw)
    for a, b, name in zip(out, ref, ("phi", "Tf_partial", "Tf", "xi")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12,
                                   err_msg=name)


def test_dg_cell_residual_matches_einsum():
    mesh = reference_glass_mesh_1d()
    fs = FunctionSpace(mesh, "DG", 1)
    cg = build_cell_geometry(mesh, fs)
    rng = np.random.default_rng(1)
    n_cells, nloc = fs.dofmap.shape
    Tc = jnp.asarray(700 + 100 * rng.random((n_cells, nloc)))
    Tpc = jnp.asarray(700 + 100 * rng.random((n_cells, nloc)))
    qw = jnp.asarray(cg.qweights)
    gphi = jnp.asarray(cg.grad_phys)
    phi = cg.phi
    dt, alpha, f_src = 0.1, 1.0, 0.7

    # einsum reference
    Tq = Tc @ phi.T
    Tpq = Tpc @ phi.T
    gTq = jnp.einsum("cl,cqlg->cqg", Tc, gphi)
    mass_src = qw * ((Tq - Tpq) - dt * f_src)
    r_ref = jnp.einsum("cq,ql->cl", mass_src, jnp.asarray(phi))
    r_ref += dt * alpha * jnp.einsum("cqg,cqlg->cl", qw[..., None] * gTq, gphi)

    res = make_dg_cell_residual(phi, dt, alpha, f_src, block_cells=16,
                                interpret=True)
    r = res(Tc, Tpc, qw, gphi)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), rtol=1e-10)


def test_dg_cell_residual_jvp_linear():
    mesh = reference_glass_mesh_1d()
    fs = FunctionSpace(mesh, "DG", 1)
    cg = build_cell_geometry(mesh, fs)
    rng = np.random.default_rng(2)
    n_cells, nloc = fs.dofmap.shape
    Tc = jnp.asarray(rng.random((n_cells, nloc)))
    Tpc = jnp.asarray(rng.random((n_cells, nloc)))
    dTc = jnp.asarray(rng.random((n_cells, nloc)))
    qw = jnp.asarray(cg.qweights)
    gphi = jnp.asarray(cg.grad_phys)
    res = make_dg_cell_residual(cg.phi, 0.1, 1.0, 0.3, block_cells=16,
                                interpret=True)
    y, dy = jax.jvp(lambda t: res(t, Tpc, qw, gphi), (Tc,), (dTc,))
    # linearity: J dT = r(T + dT) - r(T)
    y2 = res(Tc + dTc, Tpc, qw, gphi)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(y2 - y),
                               rtol=1e-8, atol=1e-12)


def test_pallas_stencil_matvec_interpret():
    """Pallas 27-point stencil kernel vs the XLA pad+slice formulation
    (interpreter mode — the real-TPU timing lives in BENCH.md). Stencil
    values are zero where lattice neighbors are absent, which is what
    legalizes the kernel's flat-minor-axis shifts."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fem_glass_tempering_tpu.ops.pallas_stencil import (
        stencil_matvec_pallas,
    )

    rng = np.random.default_rng(0)
    for grid in [(9, 7, 5), (12, 6, 3), (10, 8)]:
        d = len(grid)
        n = int(np.prod(grid))
        vals = rng.standard_normal((3 ** d,) + grid).astype(np.float32)
        for o, off in enumerate(np.ndindex(*([3] * d))):
            for a, da in enumerate(off):
                sl = [slice(None)] * d
                if da == 0:
                    sl[a] = slice(0, 1)
                elif da == 2:
                    sl[a] = slice(grid[a] - 1, grid[a])
                else:
                    continue
                vals[(o,) + tuple(sl)] = 0.0
        x = rng.standard_normal(n).astype(np.float32)

        xp = jnp.pad(jnp.asarray(x).reshape(grid), 1)
        acc = jnp.zeros(grid, dtype=jnp.float32)
        for o, off in enumerate(np.ndindex(*([3] * d))):
            st = tuple(int(v) for v in off)
            acc = acc + jnp.asarray(vals[o]) * jax.lax.slice(
                xp, st, tuple(s + g for s, g in zip(st, grid)))
        y_ref = np.asarray(acc).reshape(-1)

        y_pl = np.asarray(stencil_matvec_pallas(
            jnp.asarray(vals), jnp.asarray(x), grid, block_x=8,
            interpret=True))
        np.testing.assert_allclose(y_pl, y_ref, rtol=2e-5, atol=2e-5)
