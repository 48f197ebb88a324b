"""Benchmark: 3D float-glass plate tempering time-per-step.

Headline metric (BASELINE.md north star): wall-clock per coupled time step
(implicit nonlinear heat solve via matrix-free Newton-CG + full viscoelastic
material chain) on a 3D hex plate, run on the default JAX backend (the real
TPU chip under the driver). The reference publishes no numbers
(SURVEY.md §6), so vs_baseline is measured on this machine: the identical
jitted step on the XLA *CPU* backend (all host cores — a stand-in for the
reference's dolfinx/PETSc multicore path), via a subprocess so backend
selection stays clean.

Prints ONE JSON line:
  {"metric": "...", "value": <ms/step>, "unit": "ms", "vs_baseline": <cpu/tpu>}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# plate discretization + step count (keep total bench under a few minutes —
# compilation through the TPU tunnel is the dominant cost, so exactly ONE
# program is compiled: multi_step with a single static step count).
# 64x64x16 puts the stencil working set (~8 MB/level) past CPU cache, i.e.
# production-scale memory behavior rather than a cache-resident toy.
NX, NY, NZ = 64, 64, 16          # 65536 hex cells, 274625 CG-1 dofs
TIMED_STEPS = 20


def run_backend() -> float:
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _build_problem

    prob = _build_problem(NX, NY, NZ, "float32",
                          newton_rtol=1e-5, cg_rtol=1e-5,
                          linear_operator="stencil")
    # warmup + compile: same program, run on the REAL initial transient
    state, ok, _, _ = prob._multi_step_jit(prob.state, TIMED_STEPS)
    jax.block_until_ready(state)
    assert bool(ok), "Newton failed in warmup"
    # timed run: a FRESH initial state so the measured window contains the
    # full nonlinear transient (late steps near thermal equilibrium are
    # trivial — Newton converges with no CG work — and would flatter the
    # number); program identical -> compile cache hit
    state0 = prob.engine.init_state()
    t0 = time.perf_counter()
    state, ok, ni, ki = prob._multi_step_jit(state0, TIMED_STEPS)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0
    assert bool(ok), "Newton failed in timed run"
    return elapsed / TIMED_STEPS * 1e3  # ms/step


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
            env=env, capture_output=True, text=True, timeout=1800,
        )
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                cpu_ms = json.loads(line)["ms_per_step"]
    except Exception:
        cpu_ms = None

    tpu_ms = run_backend()
    result = {
        "metric": "3d_plate_tempering_time_per_step",
        "value": round(tpu_ms, 3),
        "unit": "ms",
        "vs_baseline": round(cpu_ms / tpu_ms, 3) if cpu_ms else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
