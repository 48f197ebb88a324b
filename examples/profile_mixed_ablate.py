"""Ablate the 1M matched-tolerance HEAT-ONLY window (material chain
stubbed to a rotation) to locate the cost the per-phase model misses:
each variant changes ONE solver ingredient; deltas against base assign
the unaccounted milliseconds (r5; see BENCH.md round-5 identity).

Usage: python -u examples/profile_mixed_ablate.py [--steps 6]
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

    base_sc = SolverConfig(newton_rtol=1e-12, newton_atol=1e-10,
                           cg_rtol=1e-12, cg_max_it=2000,
                           linear_operator="stencil",
                           preconditioner="mg", mg_smoother="chebyshev",
                           cg_dtype="float32")
    variants = {
        "base": base_sc,
        "nu11": dataclasses.replace(base_sc, mg_nu_pre=1, mg_nu_post=1),
        "noforce": dataclasses.replace(base_sc, newton_inc_forcing=0.0,
                                       newton_noise_rel=0.0),
        "bf16tbl": dataclasses.replace(base_sc, mg_table_dtype="bfloat16"),
    }
    mesh = box_mesh_3d(args.nx, args.ny, args.nz, lx=1.0, ly=1.0, lz=0.01)
    res = {}
    for name, sc in variants.items():
        t0 = time.perf_counter()
        cfg = RunConfig(
            fe=FEConfig(T_family="CG", T_degree=1),
            time=TimeConfig(0.0, args.steps * 0.1, 0.1),
            solver=sc,
            output=OutputConfig(write_every=0, formats=()),
            dtype="float64",
        )
        prob = ThermoViscoProblem(mesh=mesh, config=cfg)
        prob.setup()
        prob.engine.material_step = (
            lambda st, T, dt=None, mech=None: st._replace(T=T, T_prev=T))
        prob._build_step()
        ms, ni, ki, ok = window(prob, args.steps)
        res[name] = {"ms": round(ms, 1), "newton": ni, "cg": ki, "ok": ok}
        print(f"{name}: {ms:.1f} ms/step (newton {ni}, cg {ki}) "
              f"[setup {time.perf_counter()-t0:.0f}s]",
              file=sys.stderr, flush=True)
        del prob
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
