"""Per-phase accounting of the DG-1 matched-tolerance step (STATUS round-4
candidate #1/#2): where do the ~16.6 ms per DG MG-CG iteration go?

Same amortized slope-corrected methodology as profile_phases.py (the
remote-TPU tunnel adds ~28 ms per dispatch), measuring the production
mixed-precision DG configuration (f64 outer / f32 Krylov + p-MG with the
column smoother):

  residual64      f64 DG block-stencil residual (per Newton iteration)
  jac_diag64      f64 DG jacobian diag (noise_fn + jacobi scaling)
  mv_const        f32 DG matvec, constant-block form
  mv_table        f32 DG matvec, materialized (C,nloc,nloc) tables
  zsolve          frozen column-smoother apply (current production form)
  dg_vcycle       full DG preconditioner apply (smooth+correct+smooth)
  inner_vcycle    the CG-1 geometric-MG correction alone
  step            the real multi_step window (ms/step, newton, cg)

Usage: python examples/profile_dg.py [--nx 64 --ny 64 --nz 16] [--steps N]
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


def amortize(label, prob, body, carry, iters=20, results=None, setup=None):
    bundle = prob._bundle

    def prog(carry, niter, tbl):
        with bundle.bound(tbl):
            aux = setup(tbl) if setup is not None else None

            def f(i, c):
                return body(c, i, tbl) if aux is None else body(c, i, aux)
            return jax.lax.fori_loop(0, niter, f, carry)

    pj = jax.jit(prog)
    tbl = bundle.collect()
    out = jax.block_until_ready(pj(carry, iters, tbl))

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
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--ny", type=int, default=64)
    ap.add_argument("--nz", type=int, default=16)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--chunk", type=int, default=2)
    ap.add_argument("--skip-step", action="store_true")
    args = ap.parse_args()

    t0 = time.perf_counter()
    mesh = box_mesh_3d(args.nx, args.ny, args.nz, lx=1.0, ly=1.0, lz=0.01)
    cfg = RunConfig(
        fe=FEConfig(T_family="DG", T_degree=1),
        time=TimeConfig(0.0, args.steps * 0.1, 0.1),
        solver=SolverConfig(
            newton_rtol=1e-12, newton_atol=1e-10,
            cg_rtol=1e-12, cg_max_it=2000,
            preconditioner="mg", mg_smoother="chebyshev",
            linear_operator="stencil", cg_dtype="float32"),
        output=OutputConfig(write_every=0, formats=()),
        dtype="float64",
    )
    prob = ThermoViscoProblem(mesh=mesh, config=cfg)
    prob.setup()
    n = prob.fs_T.n_scalar_dofs
    dg_mg = prob._dg_mg32
    print(f"setup {time.perf_counter()-t0:.0f}s ({n} DG dofs, smoother="
          f"{dg_mg.smoother}, frozen keys="
          f"{list(dg_mg._frozen_smoother_data.keys())}, backend "
          f"{jax.default_backend()})", file=sys.stderr, flush=True)

    dt = prob.dt
    dt32 = jnp.asarray(dt, jnp.float32)
    st32 = dg_mg.stencil          # f32 DGStencilMatrix (const-block form)
    engine = prob.engine
    state = prob.state
    T0 = state.T
    T032 = T0.astype(jnp.float32)
    r0 = jnp.sin(jnp.arange(n, dtype=jnp.float32) * 0.37)
    r064 = r0.astype(jnp.float64)
    res = {}
    K = args.iters
    K2 = max(8 * K, 160)

    # ---- f64 outer-loop pieces ----
    hres = prob._ell  # f64 DGStencilMatrix carries the outer loop

    def residual_body(c, i, tbl):
        T, acc = c
        T = T + 1e-12
        return T, acc + hres.residual(T, T0, dt)
    amortize("residual64", prob, residual_body, (T0, jnp.zeros_like(T0)),
             K, res)

    def diag_body(c, i, tbl):
        T, acc = c
        T = T + 1e-12
        return T, acc + hres.jacobian_diag(T, dt)
    amortize("jac_diag64", prob, diag_body, (T0, jnp.zeros_like(T0)), K,
             res)

    # ---- f32 matvec: const-block vs materialized tables ----
    def mv_apply_body(v, i, mv):
        return mv(v)
    amortize("mv_const", prob, mv_apply_body, r0, K2, res,
             setup=lambda tbl: st32.make_matvec(T032, dt32))

    from fem_glass_tempering_tpu.ops.stencil import DGStencilMatrix
    st_tab = DGStencilMatrix(prob._heat32, allow_const=False)
    prob._bundle.register_operator(st_tab)
    amortize("mv_table", prob, mv_apply_body, r0, K2, res,
             setup=lambda tbl: st_tab.make_matvec(T032, dt32))

    # ---- smoother zsolve (frozen production data) ----
    data = dg_mg._frozen_smoother_data

    def zs_body(v, i, tbl):
        return dg_mg._zsolve_apply(data, v)
    amortize("zsolve", prob, zs_body, r0, K2, res)

    # ---- full DG preconditioner apply vs inner CG-MG alone ----
    def pc_apply_body(v, i, pc):
        return pc(v)
    amortize("dg_vcycle", prob, pc_apply_body, r0, K, res,
             setup=lambda tbl: dg_mg.preconditioner(T032, dt32))

    cg_mg = dg_mg.cg_mg
    n_cg = cg_mg.levels[0].op.n_dofs
    r_cg = jnp.sin(jnp.arange(n_cg, dtype=jnp.float32) * 0.37)
    T_cg32 = dg_mg.restrict_state(T032)
    amortize("inner_vcycle", prob, pc_apply_body, r_cg, K, res,
             setup=lambda tbl: cg_mg.preconditioner(
                 cg_mg.linearization_states(T_cg32), dt32))

    # ---- p-transfers ----
    def transfer_body(v, i, tbl):
        return dg_mg.prolong(dg_mg.restrict(v))[:n].astype(jnp.float32)
    amortize("p_transfers", prob, transfer_body, r0, K2, res)

    # ---- the real step window ----
    if not args.skip_step:
        stj = prob._multi_step_jit
        nsteps = args.steps
        chunk = args.chunk if args.chunk > 0 else nsteps

        def run_window(s0):
            ok = True
            ni = ki = 0
            done = 0
            st = s0
            while done < nsteps:
                m = min(chunk, nsteps - done)
                st, o, i_, k_ = stj(st, m)
                ok, ni, ki = ok and bool(o), ni + int(i_), ki + int(k_)
                done += m
            jax.block_until_ready(st.T)
            return st, ok, ni, ki

        run_window(prob.engine.init_state())      # compile+warm
        best = None
        for _ in range(2):
            s0 = jax.block_until_ready(
                jax.device_put(prob.engine.init_state()))
            t0 = time.perf_counter()
            st, ok, ni, ki = run_window(s0)
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        res["step_ms"] = round(best / nsteps * 1e3, 2)
        res["newton"] = int(ni)
        res["cg"] = int(ki)
        res["ok"] = bool(ok)
        ni_s, ki_s = int(ni) / nsteps, int(ki) / nsteps
        per_cg = res["dg_vcycle"] + min(res["mv_const"], res["mv_table"])
        model = ni_s * (res["residual64"] + res["jac_diag64"]) + ki_s * per_cg
        res["model_ms"] = round(model, 2)
        print(f"step {res['step_ms']} ms  model(no-chain) {model:.1f} ms "
              f"(newton/step {ni_s:.2f}, cg/step {ki_s:.2f})",
              file=sys.stderr, flush=True)

    res["n_dofs"] = n
    res["smoother"] = dg_mg.smoother
    res["frozen"] = list(dg_mg._frozen_smoother_data.keys())
    res["backend"] = jax.default_backend()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
