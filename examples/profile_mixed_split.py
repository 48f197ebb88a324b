"""Split the 1M matched-tolerance step into heat-solve vs material-chain
wall-clock by A/B-ing the REAL multi_step window with the material chain
replaced by an identity rotation — closes the gap profile_mixed.py's
per-phase model cannot see (fusion across phase boundaries, state
threading, per-dispatch overhead amortization).

Usage: python -u examples/profile_mixed_split.py [--nx ... --steps N]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_matmul_precision", "highest")

from fem_glass_tempering_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from fem_glass_tempering_tpu.config import (  # noqa: E402
    FEConfig, OutputConfig, RunConfig, SolverConfig, TimeConfig,
)
from fem_glass_tempering_tpu.fem.mesh import box_mesh_3d  # noqa: E402
from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem  # noqa: E402


def window(prob, steps):
    stj = prob._multi_step_jit
    st, ok, ni, ki = stj(prob.engine.init_state(), steps)
    jax.block_until_ready(st.T)
    best = None
    for _ in range(3):
        s0 = jax.block_until_ready(jax.device_put(prob.engine.init_state()))
        t0 = time.perf_counter()
        st, ok, ni, ki = stj(s0, steps)
        jax.block_until_ready(st.T)
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return best / steps * 1e3, int(ni), int(ki), bool(ok)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=160)
    ap.add_argument("--ny", type=int, default=160)
    ap.add_argument("--nz", type=int, default=40)
    ap.add_argument("--steps", type=int, default=6)
    args = ap.parse_args()

    t0 = time.perf_counter()
    mesh = box_mesh_3d(args.nx, args.ny, args.nz, lx=1.0, ly=1.0, lz=0.01)
    cfg = RunConfig(
        fe=FEConfig(T_family="CG", T_degree=1),
        time=TimeConfig(0.0, args.steps * 0.1, 0.1),
        solver=SolverConfig(newton_rtol=1e-12, newton_atol=1e-10,
                            cg_rtol=1e-12, cg_max_it=2000,
                            linear_operator="stencil",
                            preconditioner="mg", mg_smoother="chebyshev",
                            cg_dtype="float32"),
        output=OutputConfig(write_every=0, formats=()),
        dtype="float64",
    )
    prob = ThermoViscoProblem(mesh=mesh, config=cfg)
    prob.setup()
    n = prob.fs_T.n_scalar_dofs
    print(f"setup {time.perf_counter()-t0:.0f}s ({n} dofs)",
          file=sys.stderr, flush=True)

    res = {}
    res["step_ms"], ni, ki, ok = window(prob, args.steps)
    res["newton"], res["cg"], res["ok"] = ni, ki, ok
    print(f"full step: {res['step_ms']:.1f} ms "
          f"(newton/step {ni/args.steps:.2f}, cg/step {ki/args.steps:.2f})",
          file=sys.stderr, flush=True)

    # heat-only: material chain -> pure rotation (same shapes/donation)
    eng = prob.engine
    orig = eng.material_step
    eng.material_step = (lambda st, T, dt=None, mech=None:
                         st._replace(T=T, T_prev=T))
    try:
        prob._build_step()
        res["heat_only_ms"], ni2, ki2, ok2 = window(prob, args.steps)
        print(f"heat only: {res['heat_only_ms']:.1f} ms "
              f"(newton/step {ni2/args.steps:.2f}, "
              f"cg/step {ki2/args.steps:.2f})",
              file=sys.stderr, flush=True)
        res["chain_implied_ms"] = round(
            res["step_ms"] - res["heat_only_ms"], 2)
    finally:
        eng.material_step = orig
        prob._build_step()
    res["n_dofs"] = n
    res["backend"] = jax.default_backend()
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
