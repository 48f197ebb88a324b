"""Robustness: higher-order DG, determinism, f32-vs-f64 error tracking."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from fem_glass_tempering_tpu.config import (
    FEConfig,
    ModelParams,
    OutputConfig,
    RunConfig,
    TimeConfig,
)
from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace
from fem_glass_tempering_tpu.fem.mesh import interval_mesh
from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem
from fem_glass_tempering_tpu.ops.heat import HeatOperator
from fem_glass_tempering_tpu.solver.newton import newton_solve


def test_dg2_sipg_consistent_with_cg2():
    """SIPG at degree 2 (penalty 5.0 as in the reference) still converges to
    the CG-2 solution under refinement."""
    p = ModelParams()
    errs = {}
    for n in (32, 64):
        m = interval_mesh(n, 0.0, 50.0)
        sols = {}
        for fam in ("CG", "DG"):
            fs = FunctionSpace(m, fam, 2)
            op = HeatOperator(fs, p, dt=0.1)
            T_prev = jnp.full(fs.n_scalar_dofs, p.T_0)
            res = newton_solve(lambda T: op.residual(T, T_prev), T_prev,
                               jac_diag_fn=op.jacobian_diag)
            assert bool(res.converged), fam
            Tc = np.asarray(res.x)[fs.dofmap]
            sols[fam] = Tc.mean(axis=1)
        errs[n] = np.abs(sols["CG"] - sols["DG"]).max()
    assert errs[64] < errs[32] / 2.0, errs


def test_run_determinism_bitwise():
    """Two identical runs produce bitwise-identical fields (the reproducible
    stand-in for the reference's nonexistent race/concurrency checking —
    no nondeterministic scatter orders anywhere in the pipeline)."""
    cfg = RunConfig(time=TimeConfig(0.0, 2.0, 0.1),
                    output=OutputConfig(write_every=0, formats=()))
    results = []
    for _ in range(2):
        prob = ThermoViscoProblem(config=cfg)
        prob.setup()
        st = prob.solve()
        results.append((np.asarray(st.T), np.asarray(st.sigma),
                        np.asarray(st.Tf_partial)))
    for a, b in zip(*results):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_f32_error_tracking():
    """f32 perf mode vs f64 parity mode on the default config (50 steps):
    temperature agrees to ~1e-2 K out of ~700 K (relative ~1e-5), which is
    the documented mixed-precision envelope for TPU perf runs."""
    import dataclasses as dc

    sols = {}
    for dtype, rtol in (("float64", 1e-12), ("float32", 1e-5)):
        cfg = RunConfig(
            time=TimeConfig(0.0, 5.0, 0.1),
            output=OutputConfig(write_every=0, formats=()),
            dtype=dtype,
        )
        cfg = dc.replace(cfg, solver=dc.replace(cfg.solver, newton_rtol=rtol,
                                                newton_atol=1e-6 if dtype == "float32" else 1e-10,
                                                cg_rtol=rtol))
        prob = ThermoViscoProblem(config=cfg)
        prob.setup()
        st = prob.solve()
        sols[dtype] = np.asarray(st.T, dtype=np.float64)
    err = np.abs(sols["float32"] - sols["float64"]).max()
    assert err < 5e-2, err
