"""Differential parity harness vs the dolfinx reference.

Runs the default 1D tempering workload with THIS framework, and — when the
dolfinx stack (dolfinx 0.7.x + petsc4py + mpi4py) is importable, e.g.
inside the reference's Docker image `dolfinx/dolfinx:v0.7.3` — also runs
the reference implementation from /root/reference (or $SURROGLAS_PATH) on
the SAME mesh, then reports T/Tf/sigma L2 differences (the BASELINE.md
parity metric).

Without dolfinx it still runs our side and prints its norms, so the script
doubles as a regression probe. Our mesh is exported to .msh so both sides
discretize identical geometry.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def run_ours(mesh_path: str):
    from fem_glass_tempering_tpu.fem.mesh import read_msh
    from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem

    fe_config = {"T": {"element": "DG", "degree": 1},
                 "sigma": {"element": "CG", "degree": 1}}
    prob = ThermoViscoProblem(mesh=read_msh(mesh_path, gdim=1),
                              config=fe_config, time=(0.0, 50.0), dt=0.1)
    prob.setup(dirichlet_bc=False)
    st = prob.solve()
    return {
        "x_T": prob.fs_T.dof_coords[:, 0],
        "T": np.asarray(st.T),
        "Tf": np.asarray(st.Tf),
        "x_s": prob.fs_sigma.dof_coords[:, 0],
        "sigma": np.asarray(st.sigma)[:, 0, 0],
    }


def run_reference(mesh_path: str):
    try:
        import dolfinx  # noqa: F401
    except ImportError:
        return None
    ref_dir = os.environ.get("SURROGLAS_PATH", "/root/reference")
    sys.path.insert(0, ref_dir)
    cwd = os.getcwd()
    import ThermoViscoProblem as RefTVP  # the reference module

    model_params = {
        "f": 0.0, "epsilon": 0.93, "sigma": 5.670e-8, "T_ambient": 600.0,
        "T_0": 800.0, "alpha": 1.0, "htc": 280.1, "rho": 2500.0,
        "cp": 1433.0, "k": 1.0, "H": 627.8e3, "Tb": 869.0, "Rg": 8.314,
        "alpha_solid": 9.10e-6, "alpha_liquid": 25.10e-6, "Tf_init": 873.0,
    }
    fe_config = {"T": {"element": "DG", "degree": 1},
                 "sigma": {"element": "CG", "degree": 1}}
    model = RefTVP.ThermoViscoProblem(
        mesh_path=mesh_path, config=fe_config, time=(0.0, 50.0), dt=0.1,
        model_parameters=model_params)
    model.setup(dirichlet_bc=False)
    model.solve()
    os.chdir(cwd)
    fsT = model.functionSpaces["T"]
    xT = fsT.tabulate_dof_coordinates()[:, 0]
    return {
        "x_T": xT,
        "T": model.functions_current["T"].x.array.copy(),
        "Tf": model.functions_current["Tf"].x.array.copy(),
        "sigma": model.functions_next["sigma"].x.array.reshape(-1)[::1].copy(),
    }


def main():
    # parity runs are CPU-f64 by design (BASELINE.md: perf is measured in
    # f32 on TPU, parity at f64); force the CPU backend so the x64 solve is
    # native rather than TPU-emulated
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    mesh_path = "mesh1d_parity.msh"
    from fem_glass_tempering_tpu.fem.mshio import create_mesh

    create_mesh(mesh_path)
    ours = run_ours(mesh_path)
    print(f"ours: T in [{ours['T'].min():.4f}, {ours['T'].max():.4f}], "
          f"|sigma| L2 = {np.linalg.norm(ours['sigma']):.6e}")
    ref = run_reference(mesh_path)
    if ref is None:
        print("dolfinx not available — falling back to the independent "
              "numpy/scipy oracle (validation/oracle_1d.py; run inside "
              "dolfinx/dolfinx:v0.7.3 for the dolfinx differential).")
        from fem_glass_tempering_tpu.fem.mesh import read_msh
        from fem_glass_tempering_tpu.validation.oracle_1d import run_oracle

        nodes = np.sort(read_msh(mesh_path, gdim=1).nodes[:, 0])
        o = run_oracle(nodes, 500, 0.1)
        for key in ("T", "Tf"):
            rel = np.linalg.norm(ours[key] - o[key]) / np.linalg.norm(o[key])
            print(f"{key}: rel L2 diff vs oracle = {rel:.3e}")
        rel = np.linalg.norm(ours["sigma"] - o["sigma"]) / np.linalg.norm(o["sigma"])
        print(f"sigma: rel L2 diff vs oracle = {rel:.3e}")
        return
    # match dof orderings by sorting on coordinates (DG has duplicates —
    # sort pairs (x, value) lexicographically)
    for key in ("T", "Tf"):
        a = ours[key][np.lexsort((ours[key], ours["x_T"]))]
        b = ref[key][np.lexsort((ref[key], ref["x_T"]))]
        rel = np.linalg.norm(a - b) / np.linalg.norm(b)
        print(f"{key}: rel L2 diff = {rel:.3e}")


if __name__ == "__main__":
    main()
