"""Benchmark: 3D float-glass plate tempering time-per-step at 1M+ dofs.

Headline metric (BASELINE.md north star): wall-clock per coupled time step
(implicit nonlinear heat solve + full viscoelastic material chain) on a 3D
hex plate of 160x160x40 cells = 1,062,761 CG-1 dofs, f32, Newton/CG rtol
1e-5, gather-free grid-native operators (ops/grid.py) with the geometric
multigrid preconditioner (solver/multigrid.py) — the production TPU path.

vs_baseline is the IDENTICAL jitted program on the XLA *CPU* backend in a
clean subprocess (the axon sitecustomize forces the TPU platform, so the
subprocess strips it). This is an XLA-CPU stand-in, NOT a measured
dolfinx/PETSc number — the dolfinx stack cannot be installed in this
environment (no network); see BENCH.md for the differential-parity oracle
that anchors correctness instead.

Prints ONE JSON line on stdout:
  {"metric": "...", "value": <ms/step>, "unit": "ms", "vs_baseline": <cpu/tpu>}
Diagnostics (CG iterations, estimated HBM traffic) go to stderr.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

NX, NY, NZ = 160, 160, 40       # 1,024,000 hex cells, 1,062,761 CG-1 dofs
TIMED_STEPS = 20
V5E_HBM_GBS = 819.0             # v5e peak HBM bandwidth, for the roofline note


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def run_backend() -> float:
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fem_glass_tempering_tpu.config import (
        FEConfig, OutputConfig, RunConfig, SolverConfig, TimeConfig,
    )
    from fem_glass_tempering_tpu.fem.mesh import box_mesh_3d
    from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem

    t0 = time.perf_counter()
    mesh = box_mesh_3d(NX, NY, NZ, lx=1.0, ly=1.0, lz=0.01)
    cfg = RunConfig(
        fe=FEConfig(T_family="CG", T_degree=1,
                    sigma_family="CG", sigma_degree=1),
        time=TimeConfig(0.0, TIMED_STEPS * 0.1, 0.1),
        solver=SolverConfig(newton_rtol=1e-5, newton_atol=1e-6,
                            cg_rtol=1e-5, cg_max_it=500,
                            linear_operator="stencil",
                            preconditioner="mg", mg_smoother="chebyshev"),
        output=OutputConfig(write_every=0, formats=()),
        dtype="float32",
    )
    prob = ThermoViscoProblem(mesh=mesh, config=cfg)
    prob.setup()
    log(f"setup: {time.perf_counter() - t0:.0f}s "
        f"({prob.fs_T.n_scalar_dofs} dofs, backend "
        f"{jax.devices()[0].platform})")

    # warmup + compile: same program, run on the REAL initial transient
    t0 = time.perf_counter()
    state, ok, _, _ = prob._multi_step_jit(prob.state, TIMED_STEPS)
    jax.block_until_ready(state)
    log(f"compile+warmup: {time.perf_counter() - t0:.0f}s")
    assert bool(ok), "Newton failed in warmup"
    # timed run: a FRESH initial state so the measured window contains the
    # full nonlinear transient (late near-equilibrium steps are trivial
    # and would flatter the number); program identical -> cache hit
    state0 = prob.engine.init_state()
    t0 = time.perf_counter()
    state, ok, ni, ki = prob._multi_step_jit(state0, TIMED_STEPS)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0
    assert bool(ok), "Newton failed in timed run"
    ms = elapsed / TIMED_STEPS * 1e3
    # bandwidth estimate: each preconditioned CG iteration streams the
    # 27-point stencil values (27*4 B/dof) + solution/residual traffic
    # (~3*4 B/dof) on the fine level, plus ~1.4x for the V-cycle's coarse
    # levels and smoothing sweeps — a LOWER bound on achieved HBM traffic.
    n = prob.fs_T.n_scalar_dofs
    bytes_per_iter = n * (27 + 3) * 4 * 2.4   # V(1,1)+cheb ~2.4 matvec-equiv
    gbs = int(ki) * bytes_per_iter / elapsed / 1e9
    log(f"timed: {ms:.2f} ms/step, newton {int(ni)}, cg {int(ki)} "
        f"(~{int(ki)/TIMED_STEPS:.0f}/step); est HBM traffic "
        f"{gbs:.0f} GB/s = {100*gbs/V5E_HBM_GBS:.0f}% of v5e peak "
        f"(lower bound; CG-loop traffic only)")
    return ms


def main() -> None:
    if "--backend-only" in sys.argv:
        print(json.dumps({"ms_per_step": run_backend()}))
        return

    # CPU baseline in a subprocess (clean backend selection)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)  # drop the axon sitecustomize injection
    cpu_ms = None
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--backend-only"],
            env=env, capture_output=True, text=True, timeout=3000,
        )
        sys.stderr.write(out.stderr)
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                cpu_ms = json.loads(line)["ms_per_step"]
    except Exception:
        cpu_ms = None

    tpu_ms = run_backend()
    result = {
        "metric": "3d_plate_tempering_time_per_step_1Mdofs",
        "value": round(tpu_ms, 3),
        "unit": "ms",
        "vs_baseline": round(cpu_ms / tpu_ms, 3) if cpu_ms else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
