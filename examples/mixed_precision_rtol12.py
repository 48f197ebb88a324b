"""Full-transient TPU run at the reference's own tolerance (rtol 1e-12).

The matched-tolerance evidence run (BENCH.md 'rtol-1e-12 wall-clock'):
64x64x16 plate (71,825 CG-1 dofs), Newton rtol 1e-12 with the
incremental criterion — exactly the reference's solver setting
(/root/reference/ThermoViscoProblem.py:336) — using the TPU-native route
to f64 accuracy: mixed-precision Newton (f64 residual/update/test via
emulated f64, f32 Krylov loop + geometric-MG V-cycle), plus the residual
noise floor (solver/newton.py noise_fn) that declares convergence once
||F|| sinks into the f64-emulation roundoff — the round-3 fix for the
late-transient NaN at the noise floor.

Usage:
    python examples/mixed_precision_rtol12.py [--steps N] [--nx ..] ...
Prints one JSON line: {"ms_per_step":..., "ok":..., "newton":..., "cg":...}
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--ny", type=int, default=64)
    ap.add_argument("--nz", type=int, default=16)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--dt", type=float, default=0.1)
    ap.add_argument("--precond", default="mg")
    ap.add_argument("--dg", action="store_true",
                    help="DG-1 temperature space (the reference's default "
                         "element, main.py:25) with the column-smoothed "
                         "p-multigrid")
    ap.add_argument("--mg-table-dtype", default="same",
                    help="'bfloat16' streams the V-cycle value tables in "
                         "bf16 (half the preconditioner's HBM traffic)")
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--jac-lag", default="step", choices=("step", "newton"))
    ap.add_argument("--chunk", type=int, default=0,
                    help="split the window into dispatches of this many "
                         "steps (0 = one dispatch): dispatches longer "
                         "than a few minutes can hit the remote-TPU "
                         "tunnel's execution deadline (observed as "
                         "UNAVAILABLE device errors on the 20-step DG "
                         "window)")
    args = ap.parse_args()

    t0 = time.perf_counter()
    mesh = box_mesh_3d(args.nx, args.ny, args.nz, lx=1.0, ly=1.0, lz=0.01)
    cfg = RunConfig(
        fe=FEConfig(T_family="DG" if args.dg else "CG", T_degree=1),
        time=TimeConfig(0.0, args.steps * args.dt, args.dt),
        solver=SolverConfig(
            newton_rtol=1e-12, newton_atol=1e-10,
            cg_rtol=1e-12, cg_max_it=2000,
            preconditioner=args.precond, mg_smoother="chebyshev",
            linear_operator="stencil", cg_dtype="float32",
            mg_table_dtype=args.mg_table_dtype, jac_lag=args.jac_lag),
        output=OutputConfig(write_every=0, formats=()),
        dtype="float64",
    )
    prob = ThermoViscoProblem(mesh=mesh, config=cfg)
    prob.setup()
    print(f"setup: {time.perf_counter() - t0:.1f}s "
          f"({prob.fs_T.n_scalar_dofs} dofs, backend "
          f"{jax.default_backend()})", file=sys.stderr, flush=True)

    state0 = prob.state
    n = args.steps
    chunk = args.chunk if args.chunk > 0 else n

    def run_window(state):
        ok = True
        ni = ki = 0
        done = 0
        while done < n:
            m = min(chunk, n - done)
            state, o, i, k = prob._multi_step_jit(state, m)
            ok, ni, ki = ok and bool(o), ni + int(i), ki + int(k)
            done += m
        jax.block_until_ready(state.T)
        return state, ok, ni, ki

    if not args.no_warmup:
        t0 = time.perf_counter()
        st, ok, ni, ki = run_window(state0)
        print(f"warmup (compile + {n} steps): "
              f"{time.perf_counter() - t0:.1f}s ok={ok} "
              f"newton={ni} cg={ki}", file=sys.stderr, flush=True)
        state0 = prob.engine.init_state()

    # device-resident before the clock: the initial-state upload through
    # the tunnel is large and variable (see bench.py)
    state0 = jax.block_until_ready(jax.device_put(state0))
    t0 = time.perf_counter()
    st, ok, ni, ki = run_window(state0)
    dt_s = time.perf_counter() - t0
    import numpy as np
    T = np.asarray(st.T)
    print(json.dumps({
        "ms_per_step": round(1000.0 * dt_s / n, 2),
        "ok": bool(ok), "newton": int(ni), "cg": int(ki),
        "steps": n, "newton_rtol": 1e-12,
        "T_min": round(float(T.min()), 6), "T_max": round(float(T.max()), 6),
        "finite": bool(np.isfinite(T).all()),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
