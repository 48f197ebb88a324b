"""Full tempering physics on the chip: coupled heat + equilibrium
mechanics (residual-stress inversion) at production size.

The beyond-reference physics stack (the force balance the reference
names and skips, /root/reference/ViscoelasticModel.py:136-139) on the
TPU fast paths: gather-free grid heat solve + gather-free vector
elasticity with the line-smoothed vector multigrid
(ops/grid_elasticity.py, solver/grid_mg.py GridElastMG).

Prints one JSON line with ms/step over a timed window plus the
through-thickness residual-stress signature (surface compression /
core tension) after the full quench.
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

import numpy as np  # noqa: E402

from fem_glass_tempering_tpu.config import (  # noqa: E402
    FEConfig, ModelParams, OutputConfig, RunConfig, SolverConfig, TimeConfig,
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
    ap.add_argument("--mech-tables", choices=("on", "off"), default="on",
                    help="A/B: materialized block-stencil tables vs "
                         "cell-recompute matvec in the elasticity CG/MG")
    ap.add_argument("--mech-inc-rtol", type=float, default=None,
                    help="increment-relative elasticity tolerance "
                         "(default auto = 0.01; 0 disables)")
    ap.add_argument("--jac-every", default="auto",
                    help="operator/preconditioner rebuild cadence "
                         "(int or 'auto'); the mechanics V-cycle lag "
                         "rides the same chunking")
    args = ap.parse_args()
    jac_every = (args.jac_every if args.jac_every == "auto"
                 else int(args.jac_every))

    t0 = time.perf_counter()
    params = dataclasses.replace(ModelParams(), T_0=900.0)  # above Tb
    mesh = box_mesh_3d(args.nx, args.ny, args.nz, 50.0, 50.0, 10.0)
    cfg = RunConfig(
        fe=FEConfig(T_family="CG", T_degree=1),
        time=TimeConfig(0.0, args.steps * args.dt, args.dt),
        solver=SolverConfig(newton_rtol=1e-5, newton_atol=1e-6,
                            cg_rtol=1e-5, cg_max_it=2000,
                            preconditioner="mg", mg_smoother="chebyshev",
                            linear_operator="stencil",
                            jac_every=jac_every,
                            mech_inc_rtol=args.mech_inc_rtol),
        output=OutputConfig(write_every=0, formats=()),
        params=params,
        physics_mode="corrected", mechanics="equilibrium",
        xi_formula="trapezoid",
        dtype="float32",
    )
    prob = ThermoViscoProblem(mesh=mesh, config=cfg)
    zmark = lambda m: (m[:, 2] < 1e-9) | (m[:, 2] > 10.0 - 1e-9)
    prob.setup(flux_marker=zmark)
    from fem_glass_tempering_tpu.models.mechanics import GridMechanicsCoupling
    grid_mech = isinstance(prob._mech, GridMechanicsCoupling)
    if grid_mech and args.mech_tables == "off":
        # A/B lever: fall back to the cell-recompute matvec (both forms
        # are exactly equal, tests/test_grid_elasticity.py)
        prob._mech.use_tables = False
        if prob._mech.mg is not None:
            prob._mech.mg.use_tables = False
    print(f"setup {time.perf_counter()-t0:.1f}s "
          f"({prob.fs_T.n_scalar_dofs} dofs, grid_mech={grid_mech}, "
          f"backend {jax.default_backend()})", file=sys.stderr, flush=True)

    n = args.steps
    state0 = prob.state
    t0 = time.perf_counter()
    st, ok, ni, ki = prob._multi_step_jit(state0, n)
    jax.block_until_ready(st.T)
    print(f"warmup (compile + {n} steps): {time.perf_counter()-t0:.1f}s "
          f"ok={bool(ok)}", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    st, ok, ni, ki = prob._multi_step_jit(prob.engine.init_state(), n)
    jax.block_until_ready(st.T)
    dt_s = time.perf_counter() - t0

    # residual-stress signature at the plate center column
    xs = prob.fs_sigma.dof_coords
    cx, cy = 25.0, 25.0
    hx = 50.0 / args.nx
    center = (np.abs(xs[:, 0] - cx) < hx / 2) & (np.abs(xs[:, 1] - cy) < hx / 2)
    sig = np.asarray(st.sigma)[:, 0, 0]
    z = xs[center][:, 2]
    o = np.argsort(z)
    prof = sig[center][o]
    print(json.dumps({
        "metric": "coupled_step_with_equilibrium_mechanics",
        "ms_per_step": round(1000.0 * dt_s / n, 2),
        "ok": bool(ok), "newton": int(ni), "cg": int(ki),
        "n_dofs": int(prob.fs_T.n_scalar_dofs),
        "grid_mechanics": grid_mech,
        "mech_tables": args.mech_tables,
        "mech_inc_rtol": (prob._mech.inc_rtol if grid_mech else None),
        "surface_sigma_xx": round(float(prof[0]), 6),
        "core_sigma_xx": round(float(prof[len(prof) // 2]), 6),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
