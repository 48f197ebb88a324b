"""Per-phase accounting of the 1M-dof coupled step (VERDICT round-2 #4).

Times each constituent of the production step as an AMORTIZED in-jit
loop (single dispatches through the remote-TPU tunnel carry a ~28 ms
round-trip floor, BENCH.md), with a per-iteration data perturbation so
XLA cannot hoist the measured computation out of the loop:

  residual        f64/f32 grid residual apply (per Newton iteration)
  matvec_build    ell.make_matvec(T): stencil values + one apply
  matvec_apply    one stencil matvec, values frozen (hoisted build)
  precond_build   mg.preconditioner(T) build + one V-cycle apply
  vcycle_apply    one V-cycle, build hoisted
  chain           full viscoelastic material_step (per time step)
  step            the real multi_step window (ms/step, newton, cg)

The closing identity (per step, ni = newton iters, ki = cg iters):
  step ~= chain + ni*(residual + matvec_build + precond_build - 2*apply)
          + ki*(vcycle_apply + matvec_apply + dots)
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
    FEConfig, OutputConfig, RunConfig, SolverConfig, TimeConfig,
)
from fem_glass_tempering_tpu.fem.mesh import box_mesh_3d  # noqa: E402
from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem  # noqa: E402


def amortize(label, prob, body, carry, iters=20, results=None, setup=None):
    """Time `body(carry, i, tbl)` per iteration, SLOPE-corrected: the
    remote-TPU tunnel adds a fixed ~28 ms per dispatch, so the cost is
    the difference between a 2K- and a K-iteration run of the same
    compiled program (dynamic trip count) divided by K.

    `setup(tbl)`, if given, runs once per dispatch OUTSIDE the loop and
    its result is passed to the body: the apply-only measurements build
    their operators there, exactly as the production Newton body traces
    a build once outside the inner CG while_loop. (Building inside the
    loop body instead relies on XLA's while-LICM, which declines to
    hoist large materializations — measured: an 0.14 ms apply read as
    4.45 ms because every iteration repaid the 27-slot value build.)"""
    bundle = prob._bundle

    def prog(carry, niter, tbl):
        with bundle.bound(tbl):
            aux = setup(tbl) if setup is not None else None

            def f(i, c):
                return body(c, i, tbl) if aux is None else body(c, i, aux)
            return jax.lax.fori_loop(0, niter, f, carry)

    pj = jax.jit(prog)
    tbl = bundle.collect()
    out = jax.block_until_ready(pj(carry, iters, tbl))   # compile + warmup

    def run(ni):
        t0 = time.perf_counter()
        jax.block_until_ready(pj(carry, ni, tbl))
        return time.perf_counter() - t0

    t_k = min(run(iters) for _ in range(2))
    t_2k = min(run(2 * iters) for _ in range(2))
    ms = (t_2k - t_k) / iters * 1e3
    print(f"{label:16s} {ms:8.3f} ms", file=sys.stderr, flush=True)
    if results is not None:
        results[label] = round(ms, 4)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=160)
    ap.add_argument("--ny", type=int, default=160)
    ap.add_argument("--nz", type=int, default=40)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--mg-max-levels", type=int, default=0)
    ap.add_argument("--mg-coarse", default="auto")
    ap.add_argument("--mg-table-dtype", default="same",
                    help="'bfloat16' streams the V-cycle value tables in "
                         "bf16 (half the dominant HBM traffic)")
    ap.add_argument("--skip-step", action="store_true")
    ap.add_argument("--jac-every", type=int, default=1,
                    help="rebuild the frozen operator/preconditioner "
                         "every N steps inside the jitted window "
                         "(SolverConfig.jac_every)")
    args = ap.parse_args()

    t0 = time.perf_counter()
    mesh = box_mesh_3d(args.nx, args.ny, args.nz, lx=1.0, ly=1.0, lz=0.01)
    sc = dict(newton_rtol=1e-5, newton_atol=1e-6, cg_rtol=1e-5,
              cg_max_it=4000, linear_operator="stencil",
              preconditioner="mg", mg_smoother="chebyshev")
    if args.mg_max_levels:
        sc["mg_max_levels"] = args.mg_max_levels
    sc["mg_coarse"] = args.mg_coarse
    sc["mg_table_dtype"] = args.mg_table_dtype
    sc["jac_every"] = args.jac_every
    cfg = RunConfig(
        fe=FEConfig(T_family="CG", T_degree=1),
        time=TimeConfig(0.0, args.steps * 0.1, 0.1),
        solver=SolverConfig(**sc),
        output=OutputConfig(write_every=0, formats=()),
        dtype="float32",
    )
    prob = ThermoViscoProblem(mesh=mesh, config=cfg)
    prob.setup()
    n = prob.fs_T.n_scalar_dofs
    print(f"setup {time.perf_counter()-t0:.0f}s ({n} dofs, "
          f"{len(prob._mg.levels)} MG levels, backend "
          f"{jax.default_backend()})", file=sys.stderr, flush=True)

    dt = prob.dt
    grid = prob._grid
    mg = prob._mg
    engine = prob.engine
    state = prob.state
    T0 = state.T
    r0 = jnp.sin(jnp.arange(n, dtype=T0.dtype) * 0.37)
    res = {}
    K = args.iters
    # cheap ops need a longer loop so the K-vs-2K slope clears the
    # ~±2 ms dispatch-floor noise (a 0.14 ms apply needs >100 iters)
    K2 = max(8 * K, 160)

    # ---- residual apply (T perturbed per iteration: no hoisting) ----
    def residual_body(c, i, tbl):
        T, acc = c
        T = T + 1e-12
        return T, acc + grid.residual(T, T0, dt)
    amortize("residual", prob, residual_body, (T0, jnp.zeros_like(T0)),
             K2, res)

    # ---- jacobian diag ----
    def diag_body(c, i, tbl):
        T, acc = c
        T = T + 1e-12
        return T, acc + grid.jacobian_diag(T, dt)
    amortize("jac_diag", prob, diag_body, (T0, jnp.zeros_like(T0)), K2,
             res)

    # ---- matvec: build (values+apply) vs apply-only ----
    def mv_build_body(c, i, tbl):
        T, v = c
        T = T + 1e-12
        mv = prob._ell.make_matvec(T, dt)
        return T, mv(v)
    amortize("matvec_build", prob, mv_build_body, (T0, r0), K, res)

    def mv_apply_body(v, i, mv):
        return mv(v)
    amortize("matvec_apply", prob, mv_apply_body, r0, K2, res,
             setup=lambda tbl: prob._ell.make_matvec(T0, dt))

    # ---- preconditioner: build+apply vs apply-only ----
    def pc_build_body(c, i, tbl):
        T, v = c
        T = T + 1e-12
        pc = mg.preconditioner(mg.linearization_states(T), dt)
        return T, pc(v)
    amortize("precond_build", prob, pc_build_body, (T0, r0), K, res)

    def pc_apply_body(v, i, pc):
        return pc(v)
    amortize("vcycle_apply", prob, pc_apply_body, r0, K, res,
             setup=lambda tbl: mg.preconditioner(
                 mg.linearization_states(T0), dt))

    # ---- material chain (one per time step) ----
    def chain_body(c, i, tbl):
        st = c
        return engine.material_step(st, st.T + 1e-12, dt, mech=prob._mech)
    amortize("chain", prob, chain_body, state, max(K // 4, 5), res)

    # ---- the real step window ----
    if not args.skip_step:
        stj = prob._multi_step_jit
        st, ok, ni, ki = stj(prob.engine.init_state(), args.steps)
        jax.block_until_ready(st.T)
        # device-resident fresh state per repeat: the upload (~tens of MB
        # through the tunnel, variable) must stay OUTSIDE the timed
        # window (measured: 718 vs 1150 ms/step run-to-run otherwise)
        best = None
        for _ in range(3):
            s0 = jax.block_until_ready(
                jax.device_put(prob.engine.init_state()))
            t0 = time.perf_counter()
            st, ok, ni, ki = stj(s0, args.steps)
            jax.block_until_ready(st.T)
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        el = best
        res["step_ms"] = round(el / args.steps * 1e3, 2)
        res["newton"] = int(ni)
        res["cg"] = int(ki)
        res["ok"] = bool(ok)
        ni_s, ki_s = int(ni) / args.steps, int(ki) / args.steps
        # closing identity (apply-only parts subtracted from builds)
        fixed = (res["residual"]
                 + (res["matvec_build"] - res["matvec_apply"])
                 + (res["precond_build"] - res["vcycle_apply"]))
        per_cg = res["vcycle_apply"] + res["matvec_apply"]
        model = res["chain"] + ni_s * fixed + ki_s * per_cg
        res["model_ms"] = round(model, 2)
        res["unaccounted_ms"] = round(res["step_ms"] - model, 2)
        print(f"step {res['step_ms']} ms  model {model:.1f} ms "
              f"(newton/step {ni_s:.2f}, cg/step {ki_s:.2f})",
              file=sys.stderr, flush=True)

    res["n_dofs"] = n
    res["mg_levels"] = len(mg.levels)
    res["backend"] = jax.default_backend()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
