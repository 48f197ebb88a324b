"""Per-phase accounting of the coupled heat + equilibrium-mechanics step
(STATUS round-4 candidate: the mechanics-coupled step is
elasticity-solve dominated — find out where the milliseconds actually
go before tuning the tolerance schedule).

Same amortized slope-corrected methodology as profile_phases.py (the
remote-TPU tunnel adds ~28 ms per dispatch). Measures, on the
mechanics_3d_tpu.py production configuration:

  chain_nomech    material_step with mechanics off (per time step)
  chain_mech0     material_step + mechanics coupling, CG capped at 0
                  iterations -> the coupling PROLOGUE (effective moduli,
                  decayed history stress, RHS assembly, vector-MG build)
  chain_mech16    same with exactly 16 CG iterations (rtol pinned to 0)
  -> mech_per_cg_iter = (chain_mech16 - chain_mech0) / 16
  step            the real multi_step window (ms/step, newton, cg)

Closing identity: step ~= heat_step + chain_mech0 - chain_nomech
                          + cg_per_step * mech_per_cg_iter ... where the
heat-side terms come from profile_phases.py at the same size.

Usage: python examples/profile_mech.py [--nx 64 --ny 64 --nz 16]
Prints one JSON line with every measured number.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_matmul_precision", "highest")

from fem_glass_tempering_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax.numpy as jnp  # noqa: E402

from fem_glass_tempering_tpu.config import (  # noqa: E402
    FEConfig, ModelParams, OutputConfig, RunConfig, SolverConfig, TimeConfig,
)
from fem_glass_tempering_tpu.fem.mesh import box_mesh_3d  # noqa: E402
from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem  # noqa: E402
from examples.profile_phases import amortize  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--ny", type=int, default=64)
    ap.add_argument("--nz", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    t0 = time.perf_counter()
    params = dataclasses.replace(ModelParams(), T_0=900.0)
    mesh = box_mesh_3d(args.nx, args.ny, args.nz, 50.0, 50.0, 10.0)
    cfg = RunConfig(
        fe=FEConfig(T_family="CG", T_degree=1),
        time=TimeConfig(0.0, args.steps * 0.1, 0.1),
        solver=SolverConfig(newton_rtol=1e-5, newton_atol=1e-6,
                            cg_rtol=1e-5, cg_max_it=2000,
                            preconditioner="mg", mg_smoother="chebyshev",
                            linear_operator="stencil"),
        output=OutputConfig(write_every=0, formats=()),
        params=params,
        physics_mode="corrected", mechanics="equilibrium",
        xi_formula="trapezoid",
        dtype="float32",
    )
    prob = ThermoViscoProblem(mesh=mesh, config=cfg)
    zmark = lambda m: (m[:, 2] < 1e-9) | (m[:, 2] > 10.0 - 1e-9)
    prob.setup(flux_marker=zmark)
    n = prob.fs_T.n_scalar_dofs
    print(f"setup {time.perf_counter()-t0:.0f}s ({n} T dofs, backend "
          f"{jax.default_backend()})", file=sys.stderr, flush=True)

    dt = prob.dt
    engine = prob.engine
    mech = prob._mech
    state = prob.state
    res = {}
    K = args.iters

    def chain_with(mech_arg):
        def body(st, i, tbl):
            return engine.material_step(st, st.T + 1e-12, dt,
                                        mech=mech_arg)
        return body

    # mechanics off: the pure pointwise material chain
    amortize("chain_nomech", prob, chain_with(None), state,
             max(K // 2, 5), res)

    # coupling with the CG iteration count pinned (rtol 0 disables the
    # convergence exit; max_it is a static while_loop bound)
    saved = (mech.cg_rtol, mech.cg_max_it)
    try:
        mech.cg_rtol, mech.cg_max_it = 0.0, 0
        amortize("chain_mech0", prob, chain_with(mech), state,
                 max(K // 2, 5), res)
        mech.cg_rtol, mech.cg_max_it = 0.0, 16
        amortize("chain_mech16", prob, chain_with(mech), state,
                 max(K // 2, 5), res)
    finally:
        mech.cg_rtol, mech.cg_max_it = saved

    res["mech_prologue_ms"] = round(
        res["chain_mech0"] - res["chain_nomech"], 3)
    res["mech_per_cg_iter_ms"] = round(
        (res["chain_mech16"] - res["chain_mech0"]) / 16.0, 3)

    # the real step window (min-of-3, device-resident initial state)
    stj = prob._multi_step_jit
    st, ok, ni, ki = stj(prob.engine.init_state(), args.steps)
    jax.block_until_ready(st.T)
    best = None
    for _ in range(3):
        s0 = jax.block_until_ready(jax.device_put(prob.engine.init_state()))
        t0 = time.perf_counter()
        st, ok, ni, ki = stj(s0, args.steps)
        jax.block_until_ready(st.T)
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    res["step_ms"] = round(best / args.steps * 1e3, 2)
    res["newton"] = int(ni)
    res["cg"] = int(ki)
    res["ok"] = bool(ok)
    res["n_dofs"] = n
    res["backend"] = jax.default_backend()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
