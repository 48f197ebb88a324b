"""Per-phase accounting of the CG-1 MATCHED-TOLERANCE step (VERDICT r4
weak #3: "no phase identity has been published for the CG 229 ms row at
all") — the mixed-precision configuration bench.py measures as
value_rtol1e12_1m_ms: f64 outer Newton (rtol 1e-12, TPU emulated
double-float) with an f32 Krylov loop + f32 V-cycle.

Phases (amortized K-vs-2K slope, same methodology as profile_phases.py):

  residual64      f64 grid residual (per Newton iteration)
  noise_floor     the per-build inc_diag/noise evaluation (f32 twin)
  matvec32_apply  f32 stencil matvec (per CG iteration)
  vcycle32_apply  f32 V-cycle apply (per CG iteration)
  builds          frozen operator+preconditioner build (per step/chunk)
  chain64         the f64 material chain (per time step)
  chain64_nosig   chain with the stress updates elided (A/B: how much is
                  the 4x (n_S,6,3,3) partial-stress streaming)
  step            the real multi_step window + closing identity

Usage: python examples/profile_mixed.py [--nx 160 --ny 160 --nz 40]
Prints one JSON line with every measured number.
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

import jax.numpy as jnp  # noqa: E402

from fem_glass_tempering_tpu.config import (  # noqa: E402
    FEConfig, OutputConfig, RunConfig, SolverConfig, TimeConfig,
)
from fem_glass_tempering_tpu.fem.mesh import box_mesh_3d  # noqa: E402
from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem  # noqa: E402
from examples.profile_phases import amortize  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=160)
    ap.add_argument("--ny", type=int, default=160)
    ap.add_argument("--nz", type=int, default=40)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip-step", action="store_true")
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
    print(f"setup {time.perf_counter()-t0:.0f}s ({n} dofs, backend "
          f"{jax.default_backend()})", file=sys.stderr, flush=True)

    dt = prob.dt
    grid = prob._grid
    grid32 = prob._grid32
    mg32 = prob._mg32
    engine = prob.engine
    state = prob.state
    T0 = state.T
    T032 = T0.astype(jnp.float32)
    r32 = jnp.sin(jnp.arange(n, dtype=jnp.float32) * 0.37)
    res = {}
    K = args.iters
    K2 = max(8 * K, 80)

    def residual_body(c, i, tbl):
        T, acc = c
        T = T + 1e-12
        return T, acc + grid.residual(T, T0, dt)
    amortize("residual64", prob, residual_body, (T0, jnp.zeros_like(T0)),
             K, res)

    def diag_body(c, i, tbl):
        T, acc = c
        T = T + 1e-6
        return T, acc + grid32.jacobian_diag(T, jnp.float32(dt))
    amortize("noise_floor", prob, diag_body,
             (T032, jnp.zeros_like(T032)), K2, res)

    def mv_apply_body(v, i, mv):
        return mv(v)
    amortize("matvec32_apply", prob, mv_apply_body, r32, K2, res,
             setup=lambda tbl: grid32.make_matvec(T032, jnp.float32(dt)))
    amortize("vcycle32_apply", prob, mv_apply_body, r32, K, res,
             setup=lambda tbl: mg32.preconditioner(
                 mg32.linearization_states(T032), jnp.float32(dt)))

    def build_body(c, i, tbl):
        T, v = c
        T = T + 1e-6
        mv = grid32.make_matvec(T, jnp.float32(dt))
        pc = mg32.preconditioner(mg32.linearization_states(T),
                                 jnp.float32(dt))
        return T, pc(mv(v))
    amortize("builds", prob, build_body, (T032, r32), K, res)
    res["builds"] = round(
        res["builds"] - res["matvec32_apply"] - res["vcycle32_apply"], 4)

    def chain_body(c, i, tbl):
        st = c
        return engine.material_step(st, st.T + 1e-12, dt)
    amortize("chain64", prob, chain_body, state, max(K // 2, 5), res)

    # A/B: how much of the chain is the partial-stress (n_S, 6, d, d)
    # streaming? Run the T-space part + strain chain but skip the Prony
    # stress updates by reusing the current stress fields.
    def chain_nosig_body(c, i, tbl):
        st = c
        st2 = engine.material_step(st, st.T + 1e-12, dt)
        # emulate "no stress updates" by replacing them with the old
        # arrays — XLA dead-code-eliminates the stress computation
        return st2._replace(
            thermal_strain=st.thermal_strain,
            total_strain=st.total_strain,
            deviatoric_strain=st.deviatoric_strain,
            s_tilde=st.s_tilde, sigma_tilde=st.sigma_tilde,
            s_partial=st.s_partial, sigma_partial=st.sigma_partial,
            sigma=st.sigma)
    amortize("chain64_nosig", prob, chain_nosig_body, state,
             max(K // 2, 5), res)

    if not args.skip_step:
        stj = prob._multi_step_jit
        st, ok, ni, ki = stj(prob.engine.init_state(), args.steps)
        jax.block_until_ready(st.T)
        best = None
        for _ in range(3):
            s0 = jax.block_until_ready(
                jax.device_put(prob.engine.init_state()))
            t0 = time.perf_counter()
            st, ok, ni, ki = stj(s0, args.steps)
            jax.block_until_ready(st.T)
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        res["step_ms"] = round(best / args.steps * 1e3, 2)
        res["newton"] = int(ni)
        res["cg"] = int(ki)
        res["ok"] = bool(ok)
        ni_s, ki_s = int(ni) / args.steps, int(ki) / args.steps
        per_cg = res["vcycle32_apply"] + res["matvec32_apply"]
        model = (res["chain64"] + res["builds"] + res["noise_floor"]
                 + ni_s * (res["residual64"] + per_cg)  # init r + solve
                 + ki_s * per_cg)
        res["model_ms"] = round(model, 2)
        res["unaccounted_ms"] = round(res["step_ms"] - model, 2)
        print(f"step {res['step_ms']} ms  model {model:.1f} "
              f"(newton/step {ni_s:.2f}, cg/step {ki_s:.2f})",
              file=sys.stderr, flush=True)

    res["n_dofs"] = n
    res["backend"] = jax.default_backend()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
