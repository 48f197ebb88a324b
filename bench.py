"""Benchmark: 3D float-glass plate tempering time-per-step at 1M+ dofs.

Headline metric (BASELINE.md north star): wall-clock per coupled time step
(implicit nonlinear heat solve + full viscoelastic material chain) on a 3D
hex plate of 160x160x40 cells = 1,062,761 CG-1 dofs, f32, Newton/CG rtol
1e-5, gather-free grid-native operators (ops/grid.py).

vs_baseline is MEASURED at the largest size the XLA-CPU backend finishes
inside the bench timeout: 64x64x16 (71,825 dofs), SAME 6-step early
transient window on both backends (the hardest steps; symmetric windows
per ADVICE round 2), best config per backend (both Jacobi at this size,
BENCH.md). At the 1M headline size the CPU cannot finish a single step
window inside any sane timeout — an unbounded run measured >=268 s/step
(BENCH.md), recorded here as vs_baseline_1m_lower_bound.

vs_baseline is the XLA *CPU* backend in a clean subprocess (own process
group, file-redirected output, hard timeout) — an XLA-CPU stand-in, NOT
a measured dolfinx/PETSc number: the dolfinx stack cannot be installed
in this environment (no network); the differential-parity oracle in
validation/oracle_1d.py anchors correctness instead.

Prints ONE JSON line on stdout:
  {"metric": "...", "value": <ms/step>, "unit": "ms", "vs_baseline": <cpu/tpu>}
Diagnostics (CG iterations, estimated HBM traffic) go to stderr.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

NX, NY, NZ = 160, 160, 40       # 1,024,000 hex cells, 1,062,761 CG-1 dofs
TIMED_STEPS = 20                # headline TPU window
AUX_NX, AUX_NY, AUX_NZ = 64, 64, 16   # 71,825 dofs: CPU-feasible size
AUX_STEPS = 6                   # symmetric window, both backends
CPU_1M_MS_LOWER_BOUND = 268_000.0   # measured unbounded XLA-CPU run, BENCH.md
V5E_HBM_GBS = 819.0             # v5e peak HBM bandwidth, for the roofline note


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def run_backend(steps: int, preconditioner: str,
                nx: int = NX, ny: int = NY, nz: int = NZ,
                rtol12: bool = False) -> float:
    """One timed window. rtol12=True runs the REFERENCE-TOLERANCE config
    (Newton rtol 1e-12 incremental, /root/reference/ThermoViscoProblem.py:336)
    via the production mixed-precision route: f64 outer Newton (emulated
    f64 on TPU) + f32 Krylov/MG + the residual noise floor — the 1M
    matched-tolerance headline row (VERDICT r3 #3)."""
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
    mesh = box_mesh_3d(nx, ny, nz, lx=1.0, ly=1.0, lz=0.01)
    if rtol12:
        solver = SolverConfig(newton_rtol=1e-12, newton_atol=1e-10,
                              cg_rtol=1e-12, cg_max_it=2000,
                              linear_operator="stencil",
                              preconditioner=preconditioner,
                              mg_smoother="chebyshev",
                              cg_dtype="float32")
        dtype = "float64"
    else:
        solver = SolverConfig(newton_rtol=1e-5, newton_atol=1e-6,
                              cg_rtol=1e-5, cg_max_it=4000,
                              linear_operator="stencil",
                              preconditioner=preconditioner,
                              # jac_every="auto" (default) resolves to 5
                              # at this loose tolerance: frozen
                              # operator/V-cycle rebuilt every 5 steps,
                              # 33.6 -> 26.4 ms/step at 1M (profile r4);
                              # the rtol12 branch auto-resolves to 1
                              mg_smoother="chebyshev")
        dtype = "float32"
    cfg = RunConfig(
        fe=FEConfig(T_family="CG", T_degree=1,
                    sigma_family="CG", sigma_degree=1),
        time=TimeConfig(0.0, steps * 0.1, 0.1),
        solver=solver,
        output=OutputConfig(write_every=0, formats=()),
        dtype=dtype,
    )
    prob = ThermoViscoProblem(mesh=mesh, config=cfg)
    prob.setup()
    log(f"setup: {time.perf_counter() - t0:.0f}s "
        f"({prob.fs_T.n_scalar_dofs} dofs, backend "
        f"{jax.devices()[0].platform}, pc={preconditioner}, "
        f"{'rtol1e-12 f64/f32' if rtol12 else 'rtol1e-5 f32'})")

    # warmup + compile: same program, run on the REAL initial transient
    t0 = time.perf_counter()
    state, ok, _, _ = prob._multi_step_jit(prob.state, steps)
    jax.block_until_ready(state)
    log(f"compile+warmup: {time.perf_counter() - t0:.0f}s")
    assert bool(ok), "Newton failed in warmup"
    # timed run: a FRESH initial state so the measured window contains the
    # full nonlinear transient (late near-equilibrium steps are trivial
    # and would flatter the number); program identical -> cache hit
    # The fresh state must be device-resident BEFORE the clock starts:
    # through the remote tunnel the host->device upload of the initial
    # pytree is large and variable (measured: 718 vs 1150 ms/step
    # run-to-run with the upload inside the window). Min of 3 repeats.
    repeats = 3 if jax.devices()[0].platform != "cpu" else 1
    elapsed = None
    for _ in range(repeats):
        state0 = jax.block_until_ready(
            jax.device_put(prob.engine.init_state()))
        t0 = time.perf_counter()
        state, ok, ni, ki = prob._multi_step_jit(state0, steps)
        jax.block_until_ready(state)
        el = time.perf_counter() - t0
        elapsed = el if elapsed is None else min(elapsed, el)
    assert bool(ok), "Newton failed in timed run"
    ms = elapsed / steps * 1e3
    n = prob.fs_T.n_scalar_dofs
    # bandwidth estimate (lower bound: CG-loop stencil traffic only)
    mult = 2.4 if preconditioner == "mg" else 1.0
    bytes_per_iter = n * (27 + 3) * 4 * mult
    gbs = int(ki) * bytes_per_iter / elapsed / 1e9
    log(f"timed: {ms:.2f} ms/step, newton {int(ni)}, cg {int(ki)} "
        f"(~{int(ki)/steps:.0f}/step); est HBM traffic {gbs:.0f} GB/s "
        f"= {100*gbs/V5E_HBM_GBS:.0f}% of v5e peak (lower bound)")
    return ms


def _start_cpu_baseline():
    """Launch the CPU aux baseline in its own process group with
    file-redirected output (pipes can block past the timeout when helper
    grandchildren inherit them). Returns (proc, out_path, deadline)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)  # drop the axon sitecustomize injection
    out_path = tempfile.mktemp(prefix="bench_cpu_", suffix=".log")
    timeout = float(os.environ.get("BENCH_CPU_TIMEOUT", "900"))
    out = open(out_path, "w")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--backend-only",
         "--cpu-config"],
        env=env, stdout=out, stderr=out, start_new_session=True)
    return proc, out, out_path, time.monotonic() + timeout


def _finish_cpu_baseline(proc, out, out_path, deadline) -> float | None:
    try:
        try:
            proc.wait(timeout=max(1.0, deadline - time.monotonic()))
        except subprocess.TimeoutExpired:
            os.killpg(proc.pid, signal.SIGKILL)
            log("CPU baseline timed out (vs_baseline=null)")
            return None
        finally:
            out.close()
        cpu_ms = None
        with open(out_path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{") and "ms_per_step" in line:
                    cpu_ms = json.loads(line)["ms_per_step"]
                elif line and not line.startswith("WARNING"):
                    log("cpu| " + line)
        return cpu_ms
    except Exception as e:
        log(f"CPU baseline failed: {e!r}")
        return None


def main() -> None:
    if "--backend-only" in sys.argv:
        if "--cpu-config" in sys.argv:
            ms = run_backend(AUX_STEPS, "jacobi", AUX_NX, AUX_NY, AUX_NZ)
        else:
            ms = run_backend(TIMED_STEPS, "mg")
        print(json.dumps({"ms_per_step": ms}))
        return

    # CPU aux baseline runs concurrently with the TPU measurements
    cpu_job = _start_cpu_baseline()
    tpu_aux_ms = run_backend(AUX_STEPS, "jacobi", AUX_NX, AUX_NY, AUX_NZ)
    tpu_ms = run_backend(TIMED_STEPS, "mg")
    # matched-tolerance flagship: same 1M mesh at the reference's Newton
    # rtol 1e-12 (mixed precision f64/f32). Never let it sink the round's
    # headline if it fails.
    try:
        tpu_12_ms = run_backend(TIMED_STEPS, "mg", rtol12=True)
    except Exception as e:
        log(f"rtol1e-12 1M row failed: {e!r}")
        tpu_12_ms = None
    cpu_ms = _finish_cpu_baseline(*cpu_job)
    log(f"aux 72k-dof comparison ({AUX_STEPS}-step window, both Jacobi): "
        f"tpu {tpu_aux_ms:.2f} ms/step, cpu "
        f"{'%.0f' % cpu_ms if cpu_ms else 'timeout'} ms/step")
    result = {
        "metric": "3d_plate_tempering_time_per_step_1Mdofs",
        "value": round(tpu_ms, 3),
        "unit": "ms",
        # measured cpu/tpu speedup at the largest CPU-feasible size
        # (71,825 dofs), symmetric 6-step windows, best config each
        "vs_baseline": round(cpu_ms / tpu_aux_ms, 3) if cpu_ms else None,
        "vs_baseline_metric":
            "xla_cpu_over_tpu_at_72k_dofs_same_6step_window",
        "aux_72k_tpu_ms_per_step": round(tpu_aux_ms, 3),
        "aux_72k_cpu_ms_per_step": round(cpu_ms, 1) if cpu_ms else None,
        # at the 1M headline size XLA-CPU cannot finish (measured
        # unbounded run: >=268 s/step, BENCH.md)
        "vs_baseline_1m_lower_bound": round(CPU_1M_MS_LOWER_BOUND / tpu_ms),
        # the same 1M mesh at the REFERENCE's tolerance (Newton rtol 1e-12
        # incremental, ThermoViscoProblem.py:336) via mixed precision —
        # the reference-parity throughput row
        "value_rtol1e12_1m_ms": (round(tpu_12_ms, 3)
                                 if tpu_12_ms is not None else None),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
