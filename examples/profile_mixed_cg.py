"""In-situ cost of the mixed-precision CG loop at 1M dofs: time a
fixed-iteration pcg with the PRODUCTION frozen operators (table matvec +
f32 V-cycle) inside one jitted program, vs the isolated per-apply
numbers profile_mixed.py reports — locates the 2x gap between the phase
model and the measured step (r5).

Usage: python -u examples/profile_mixed_cg.py [--iters 40]
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
from fem_glass_tempering_tpu.solver.krylov import pcg  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=160)
    ap.add_argument("--ny", type=int, default=160)
    ap.add_argument("--nz", type=int, default=40)
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    t0 = time.perf_counter()
    mesh = box_mesh_3d(args.nx, args.ny, args.nz, lx=1.0, ly=1.0, lz=0.01)
    cfg = RunConfig(
        fe=FEConfig(T_family="CG", T_degree=1),
        time=TimeConfig(0.0, 0.6, 0.1),
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

    g32 = prob._grid32
    mg32 = prob._mg32
    bundle = prob._bundle
    f32 = jnp.float32
    T032 = jnp.full(n, 800.0, f32)
    dt32 = jnp.float32(0.1)
    b = jnp.sin(jnp.arange(n, dtype=f32) * 0.37)
    K = args.iters
    res = {"n_dofs": n, "iters": K}

    def run_case(label, use_pc, replace_every, stall_window):
        def prog(b, tbl):
            with bundle.bound(tbl):
                mv = g32.make_matvec(T032, dt32)
                pc = (mg32.preconditioner(
                    mg32.linearization_states(T032), dt32)
                    if use_pc else None)
                out = pcg(mv, b, precond=pc, rtol=0.0, max_it=K,
                          replace_every=replace_every,
                          stall_window=stall_window)
                return out.x
        pj = jax.jit(prog)
        tbl = bundle.collect()
        x = jax.block_until_ready(pj(b, tbl))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(pj(b, tbl))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1e3
        per = (ms) / K
        print(f"{label}: {ms:.1f} ms total, {per:.3f} ms/iter",
              file=sys.stderr, flush=True)
        res[label] = round(per, 4)

    run_case("pcg_prod", True, 50, 25)       # production flags
    run_case("pcg_norepl", True, 0, 0)       # no replacement/stall exits
    run_case("pcg_jacobi", False, 0, 0)      # matvec-only loop

    # Newton scaffolding alone: cg_max_it=0 (each pcg call still pays its
    # init apply = 1 matvec + 1 V-cycle), atol<0 forces exactly K outer
    # iterations — per-iteration cost = f64 residual + f64 norms/casts +
    # init apply + build-free scaffolding
    from fem_glass_tempering_tpu.solver.newton import newton_solve
    grid = prob._grid
    T0 = jnp.full(n, 800.0, jnp.float64)
    KN = 6

    def newton_prog(T, tbl):
        with bundle.bound(tbl):
            mv = g32.make_matvec(T032, dt32)
            pc = mg32.preconditioner(
                mg32.linearization_states(T032), dt32)
            inc_diag = g32.jacobian_diag(T032, dt32)
            out = newton_solve(
                lambda u: grid.residual(u, T, 0.1), T,
                matvec_fn=lambda u: mv, precond_fn=lambda u: pc,
                rtol=0.0, atol=-1.0, max_it=KN,
                cg_rtol=1e-6, cg_max_it=0, cg_cast=f32,
                inc_forcing=0.05, inc_diag=inc_diag,
                noise_fn=lambda u: jnp.float64(0.0))
            return out.x
    pj = jax.jit(newton_prog)
    tbl = bundle.collect()
    jax.block_until_ready(pj(T0, tbl))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(pj(T0, tbl))
        ts.append(time.perf_counter() - t0)
    per = min(ts) * 1e3 / KN
    print(f"newton_noCG: {per:.2f} ms/newton-iter (incl build once)",
          file=sys.stderr, flush=True)
    res["newton_noCG_per_iter"] = round(per, 3)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
