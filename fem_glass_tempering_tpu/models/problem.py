"""Coupled thermo-viscoelastic problem driver.

TPU-native counterpart of the reference's orchestrator class
(ThermoViscoProblem.py:23-620). The per-step cascade — implicit heat solve,
then the viscoelastic material chain — is ONE jitted, donated
`step(state) -> state` function; the time loop runs as jitted multi-step
chunks (lax.fori_loop) between output snapshots, so the whole simulation
stays on-device and host transfers happen only at the configured output
cadence (the reference writes files every step, a serial bottleneck we make
optional; SURVEY.md §3.3 hot-path note).

API parity: the constructor accepts the reference driver's dict-style
arguments (mesh_path/config/time/dt/model_parameters, reference main.py:57-59)
as well as our typed RunConfig; `setup(dirichlet_bc=False)` and `solve()`
match the reference entry points (main.py:61-62) — with a *working* Dirichlet
path (the reference's crashes, SURVEY.md §Quirks 3).
"""

from __future__ import annotations

import dataclasses
import time as _time
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from fem_glass_tempering_tpu.config import (
    FEConfig,
    ModelParams,
    RunConfig,
    TimeConfig,
)
from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace
from fem_glass_tempering_tpu.fem.mesh import Mesh, read_msh, reference_glass_mesh_1d
from fem_glass_tempering_tpu.models.viscoelastic import ViscoState, ViscoelasticEngine
from fem_glass_tempering_tpu.ops.heat import HeatOperator
from fem_glass_tempering_tpu.solver.newton import newton_solve


@dataclass
class StepDiagnostics:
    """Per-solve diagnostics (replaces the reference's print-only telemetry,
    SURVEY.md §5): Newton iteration counts, CG totals, convergence flag,
    wall-clock per phase."""

    newton_iters: int = 0
    krylov_iters: int = 0
    converged: bool = True
    heat_seconds: float = 0.0
    material_seconds: float = 0.0
    io_seconds: float = 0.0


def _fe_config_from_dict(d: dict) -> FEConfig:
    """Reference-style fe_config dict (main.py:24-27) -> FEConfig."""
    return FEConfig(
        T_family=d["T"]["element"], T_degree=d["T"]["degree"],
        sigma_family=d["sigma"]["element"], sigma_degree=d["sigma"]["degree"],
    )


def _model_params_from_dict(d: dict) -> ModelParams:
    """Reference-style model_params dict (main.py:29-55) -> ModelParams."""
    known = {f.name for f in dataclasses.fields(ModelParams)}
    return ModelParams(**{k: v for k, v in d.items() if k in known})


class ThermoViscoProblem:
    def __init__(self, mesh: Mesh | None = None, *,
                 mesh_path: str | None = None,
                 config: RunConfig | dict | None = None,
                 time: tuple | None = None,
                 dt: float | None = None,
                 model_parameters: dict | ModelParams | None = None,
                 physics_mode: str | None = None,
                 dtype: Any = None,
                 jit_options: dict | None = None):
        # ---- resolve configuration (typed or reference-dict style) ----
        if isinstance(config, dict):       # reference fe_config dict
            run_cfg = RunConfig(fe=_fe_config_from_dict(config))
        elif isinstance(config, RunConfig):
            run_cfg = config
        else:
            run_cfg = RunConfig()
        if time is not None or dt is not None:
            t0, t1 = time if time is not None else (run_cfg.time.t_start, run_cfg.time.t_end)
            run_cfg = dataclasses.replace(
                run_cfg, time=TimeConfig(t_start=t0, t_end=t1,
                                         dt=dt if dt is not None else run_cfg.time.dt))
        if isinstance(model_parameters, dict):
            run_cfg = dataclasses.replace(run_cfg, params=_model_params_from_dict(model_parameters))
        elif isinstance(model_parameters, ModelParams):
            run_cfg = dataclasses.replace(run_cfg, params=model_parameters)
        if physics_mode is not None:
            run_cfg = dataclasses.replace(run_cfg, physics_mode=physics_mode)
        self.config = run_cfg
        # jit_options accepted for constructor parity; XLA needs no CFFI flags
        del jit_options

        self.dtype = dtype or (jnp.float64 if run_cfg.dtype == "float64" else jnp.float32)
        if self.dtype == jnp.float64 and not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)
        # On TPU, default matmul precision downcasts einsum/matmul inputs
        # (bf16 passes) — in f64 that silently diverges the Newton-CG solve,
        # in f32 it degrades CG below its rtol. Pin full-precision passes
        # unless the user set a policy themselves.
        if jax.config.jax_default_matmul_precision is None:
            jax.config.update("jax_default_matmul_precision", "highest")

        # ---- mesh ----
        if mesh is not None:
            self.mesh = mesh
        elif mesh_path is not None:
            self.mesh = read_msh(mesh_path)
        else:
            self.mesh = reference_glass_mesh_1d()
        self.dim = self.mesh.tdim

        # ---- spaces (scalar T space; tensor sigma space is blocked over the
        # scalar sigma space, reference ThermoViscoProblem.py:61-103) ----
        fe = run_cfg.fe
        self.fs_T = FunctionSpace(self.mesh, fe.T_family, fe.T_degree)
        self.fs_sigma = FunctionSpace(self.mesh, fe.sigma_family, fe.sigma_degree,
                                      value_shape=(self.dim, self.dim))

        self.dt = run_cfg.time.dt
        self.time = (run_cfg.time.t_start, run_cfg.time.t_end)
        self.t = run_cfg.time.t_start
        self.n_steps = run_cfg.time.n_steps

        self.params = run_cfg.params
        self.engine = ViscoelasticEngine(
            self.fs_T, self.fs_sigma, self.params, self.dt,
            physics_mode=run_cfg.physics_mode,
            shift_function=run_cfg.shift_function,
            xi_formula=run_cfg.xi_formula, dtype=self.dtype,
            use_pallas=run_cfg.use_pallas,
        )
        self.heat: HeatOperator | None = None
        self.state: ViscoState | None = None
        self._writers: list = []
        self.diagnostics = StepDiagnostics()
        self._step_jit = None
        self._multi_step_jit = None

    # ------------------------------------------------------------------
    def setup(self, dirichlet_bc: bool = False, output_dir: str | None = None,
              flux_marker=None, flux_tag=None, dirichlet_tag=None) -> None:
        """Initial conditions + solver + (optional) output writers.

        Mirrors reference setup() (ThermoViscoProblem.py:176-184); the
        Dirichlet option clamps the boundary to T_ambient and works.
        `flux_marker(midpoints) -> bool mask` restricts the radiation +
        convection flux to selected boundary facets (insulated elsewhere) —
        e.g. only the large faces of a plate.

        `flux_tag` / `dirichlet_tag` select facets by gmsh physical group
        (int tag or $PhysicalNames name) from a tagged mesh — the dolfinx
        meshtag-driven BC pattern (the reference reads facet_tags at
        ThermoViscoProblem.py:27-28 and locates BCs at :236-243). The mesh
        must carry facet tags (read_msh on a tagged .msh).
        `dirichlet_tag` implies a Dirichlet BC at T_ambient on exactly the
        tagged facets.
        """
        if flux_tag is not None:
            if flux_marker is not None:
                raise ValueError("pass flux_marker or flux_tag, not both")
            _fmask = self.mesh.boundary_facets_with_tag(flux_tag)
            flux_marker = lambda mids, _m=_fmask: _m  # noqa: E731
        import os as _os
        import sys as _sys
        _timing = _os.environ.get("FGT_SETUP_TIMING") == "1"
        _last = [_time.perf_counter()]

        def _mark(label: str) -> None:
            # FGT_SETUP_TIMING=1 prints per-phase setup wall times to
            # stderr — the DG facet tables / mixed-precision twins can
            # dominate setup through the remote-TPU tunnel (BENCH.md)
            if _timing:
                now = _time.perf_counter()
                print(f"setup[{label}]: {now - _last[0]:.1f}s",
                      file=_sys.stderr, flush=True)
                _last[0] = now

        sc = self.config.solver
        if sc.preconditioner == "auto":
            # the reference preconditions with GAMG unconditionally
            # (/root/reference/ThermoViscoProblem.py:344); resolve to the
            # strongest equivalent this mesh/space supports
            if (self.mesh.structured is not None
                    and ((self.fs_T.degree == 1
                          and self.fs_T.family in ("CG", "DG"))
                         or (self.fs_T.degree == 2
                             and self.fs_T.family == "CG"))):
                resolved = "mg"
            else:
                resolved = "amg"
            sc = dataclasses.replace(sc, preconditioner=resolved)
            self.config = dataclasses.replace(self.config, solver=sc)
        bc_dofs = bc_val = None
        if dirichlet_tag is not None:
            bc_dofs = self.fs_T.boundary_scalar_dofs(
                facet_mask=self.mesh.boundary_facets_with_tag(dirichlet_tag))
            bc_val = self.params.T_ambient
            dirichlet_bc = True
        elif dirichlet_bc:
            bc_dofs = self.fs_T.boundary_scalar_dofs()
            bc_val = self.params.T_ambient
        heat_form = getattr(self.config, "heat_form", "reference")
        # when the gather-free DG block stencil (ops/stencil.py) will carry
        # the whole outer loop, the SIPG facet tables are never read on
        # device — skip their upload (several GB at 1M cells in f64
        # through the remote-TPU tunnel); the matrix-free fallback in
        # _build_step calls ensure_interior_tables()
        dg_stencil = (self.fs_T.family == "DG"
                      and self.mesh.structured is not None
                      and sc.linear_operator == "stencil")
        self.heat = HeatOperator(
            self.fs_T, self.params, self.dt, dtype=self.dtype,
            bc_dofs=bc_dofs, bc_value=bc_val,
            quad_degree=self.config.fe.quad_degree,
            flux_marker=flux_marker, form=heat_form,
            interior_device_tables=not dg_stencil,
        )
        _mark("heat_op_f64")
        # gather-free grid-native path (residual + diag + stencil values as
        # static slice ops — ops/grid.py) when the mesh/space qualify
        self._grid = None
        if getattr(sc, "grid_native", "auto") != "off":
            from fem_glass_tempering_tpu.ops.grid import GridHeatOperator
            try:
                # allow_const=False: the constant-row form's per-apply
                # face-flux blocks and boundary-row overwrites serialize
                # on TPU — measured 13x slower in the full step than the
                # materialized-table matvec (159 vs 11.9 ms/step at
                # 64x64x16; BENCH.md "constant-row post-mortem") despite
                # the lower HBM traffic. Tables win; const stays
                # available for memory-bound opt-in via direct
                # construction.
                self._grid = GridHeatOperator(
                    self.heat, use_pallas=self.config.use_pallas,
                    flux_marker=flux_marker, allow_const=False)
            except ValueError:
                if getattr(sc, "grid_native", "auto") == "on":
                    raise
        # CG-2 lattice-native path (ops/grid2.py): sum-factorized Kron
        # operator on the Q2 dof lattice — the high-order fast path
        # (BASELINE config #4); gather assembly stays the fallback
        self._grid2 = None
        if (self._grid is None
                and getattr(sc, "grid_native", "auto") != "off"):
            from fem_glass_tempering_tpu.ops.grid2 import GridHeatOperator2
            try:
                self._grid2 = GridHeatOperator2(
                    self.heat, flux_marker=flux_marker)
            except ValueError:
                pass
        _mark("grid_native")
        self._mech = None
        if self.config.mechanics == "equilibrium":
            from fem_glass_tempering_tpu.models.mechanics import (
                GridMechanicsCoupling,
                MechanicsCoupling,
            )
            # gather-free grid-native mechanics when the mesh/space
            # qualify (ops/grid_elasticity.py), flat assembly otherwise
            self._mech = None
            mech_max_it = max(self.config.solver.cg_max_it, 2000)
            # f32 CG residual norms bottom out near ~1e-6 relative;
            # below that the extra iterations refine noise (measured
            # 16x16x8 f32: 127 iters at rtol 1e-8 vs 114 at 2e-6 for
            # bitwise-equivalent stress output)
            mech_rtol = min(self.config.solver.cg_rtol, 1e-8)
            if self.dtype == jnp.float32:
                mech_rtol = max(mech_rtol, 2e-6)
            mech_inc = self.config.solver.mech_inc_rtol
            if mech_inc is None:
                mech_inc = 1e-2
            if self._grid is not None or (
                    self.fs_T.family == "DG"
                    and self.mesh.structured is not None):
                try:
                    gm = GridMechanicsCoupling(
                        self.fs_sigma, self.engine, dtype=self.dtype,
                        cg_rtol=mech_rtol, cg_max_it=mech_max_it,
                        inc_rtol=mech_inc)
                    if self.fs_T.family == "DG":
                        # DG T space: node-grid elasticity through the
                        # cross-eval (models/mechanics.py adapter) —
                        # matches the sharded-DG semantics
                        from fem_glass_tempering_tpu.models.mechanics \
                            import DGNodeMechAdapter
                        self._mech = DGNodeMechAdapter(
                            gm, self.engine.to_sigma.eval)
                    else:
                        self._mech = gm
                except ValueError:
                    pass
            if self._mech is None:
                self._mech = MechanicsCoupling(
                    self.fs_T, self.fs_sigma, self.engine, dtype=self.dtype,
                    cg_rtol=mech_rtol, cg_max_it=mech_max_it,
                    inc_rtol=mech_inc)
        _mark("mechanics")
        self._mg = None
        self._dg_mg = None
        # V-cycle table streaming dtype (SolverConfig.mg_table_dtype)
        mg_tdt = (jnp.bfloat16
                  if getattr(sc, "mg_table_dtype", "same") == "bfloat16"
                  else None)
        # mixed precision replaces the f64 preconditioner with its f32
        # twin (built below) — skip building/freezing the f64 hierarchy:
        # it would be dead weight, and its setup runs f64 batched
        # factorizations the TPU backend cannot compile
        self._mixed = (getattr(sc, "cg_dtype", "same") == "float32"
                       and self.dtype == jnp.float64)
        if sc.preconditioner == "mg" and not self._mixed:
            if (self.mesh.structured is None
                    or self.fs_T.family not in ("CG", "DG")
                    or self.fs_T.degree > 2
                    or (self.fs_T.degree == 2
                        and self.fs_T.family != "CG")):
                raise ValueError(
                    "preconditioner='mg' needs a structured box mesh with a "
                    "CG-1/CG-2 or DG-1 temperature space; use 'jacobi' "
                    "otherwise")
            from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace
            from fem_glass_tempering_tpu.solver.multigrid import (
                DGMultigrid,
                GeometricMG,
            )

            def make_operator(level_mesh):
                fs = FunctionSpace(level_mesh, "CG", 1)
                bd = fs.boundary_scalar_dofs() if dirichlet_bc else None
                return HeatOperator(fs, self.params, self.dt,
                                    dtype=self.dtype, bc_dofs=bd,
                                    bc_value=bc_val, form=heat_form)

            import jax.numpy as _jnp
            if self.fs_T.degree == 2:
                # CG-2: p-MG over the embedded CG-1 lattice (ops/grid2.py)
                from fem_glass_tempering_tpu.ops.grid2 import Q2MG
                if self._grid2 is None:
                    raise ValueError(
                        "CG-2 'mg' needs the lattice-native operator "
                        "(grid_native must not be 'off')")
                self._mg = Q2MG(self._grid2, make_operator,
                                nu_pre=sc.mg_nu_pre, nu_post=sc.mg_nu_post,
                                mg_kwargs={"smoother": sc.mg_smoother})
                self._mg.freeze_rhos(self.dt)
            elif self.fs_T.family == "DG":
                self._dg_mg = DGMultigrid(
                    self.heat, make_operator, dtype=self.dtype,
                    smoother=getattr(sc, "dg_smoother", "auto"),
                    mg_kwargs={"smoother": sc.mg_smoother,
                               "nu_pre": sc.mg_nu_pre,
                               "nu_post": sc.mg_nu_post,
                               "max_levels": sc.mg_max_levels,
                               "coarse": sc.mg_coarse,
                               "table_dtype": mg_tdt})
                self._dg_mg.freeze(
                    _jnp.full(self.fs_T.n_scalar_dofs, self.params.T_0,
                              dtype=self.dtype), self.dt)
            else:
                self._mg = GeometricMG(self.mesh, make_operator,
                                       dtype=self.dtype,
                                       smoother=sc.mg_smoother,
                                       nu_pre=sc.mg_nu_pre,
                                       nu_post=sc.mg_nu_post,
                                       max_levels=sc.mg_max_levels,
                                       coarse=sc.mg_coarse,
                                       table_dtype=mg_tdt)
                self._mg.freeze_omegas(
                    _jnp.full(self.fs_T.n_scalar_dofs, self.params.T_0,
                              dtype=self.dtype), self.dt)
        # mixed-precision twins: f32 operator tables for the inner CG when
        # cg_dtype='float32' under an f64 outer solve (TPUs have no native
        # f64 — the Krylov loop is the hot path, the f64 residual and the
        # incremental test keep Newton at reference accuracy, rtol 1e-12
        # per ThermoViscoProblem.py:336)
        _mark("precond_f64")
        self._heat32 = self._grid32 = self._mg32 = self._dg_mg32 = None
        self._grid2_32 = None
        if self._mixed:
            f32 = jnp.float32
            self._heat32 = HeatOperator(
                self.fs_T, self.params, self.dt, dtype=f32,
                bc_dofs=bc_dofs, bc_value=bc_val,
                quad_degree=self.config.fe.quad_degree,
                flux_marker=flux_marker, form=heat_form,
                interior_device_tables=not dg_stencil)
            _mark("heat_op_f32_twin")
            if self._grid is not None:
                from fem_glass_tempering_tpu.ops.grid import GridHeatOperator
                self._grid32 = GridHeatOperator(
                    self._heat32, use_pallas=self.config.use_pallas,
                    flux_marker=flux_marker, allow_const=False)
            if self._grid2 is not None:
                from fem_glass_tempering_tpu.ops.grid2 import (
                    GridHeatOperator2,
                )
                self._grid2_32 = GridHeatOperator2(
                    self._heat32, flux_marker=flux_marker)
            _mark("grid32_twin")
            if sc.preconditioner == "mg":
                if (self.mesh.structured is None
                        or self.fs_T.family not in ("CG", "DG")
                        or self.fs_T.degree > 2
                        or (self.fs_T.degree == 2
                            and self.fs_T.family != "CG")):
                    raise ValueError(
                        "preconditioner='mg' needs a structured box mesh "
                        "with a CG-1/CG-2 or DG-1 temperature space")
                from fem_glass_tempering_tpu.fem.functionspace import (
                    FunctionSpace,
                )
                from fem_glass_tempering_tpu.solver.multigrid import (
                    DGMultigrid,
                    GeometricMG,
                )

                def make_operator32(level_mesh):
                    fsl = FunctionSpace(level_mesh, "CG", 1)
                    bd = fsl.boundary_scalar_dofs() if dirichlet_bc else None
                    return HeatOperator(fsl, self.params, self.dt, dtype=f32,
                                        bc_dofs=bd, bc_value=bc_val,
                                        form=heat_form)

                T0 = jnp.full(self.fs_T.n_scalar_dofs, self.params.T_0,
                              dtype=f32)
                if self.fs_T.degree == 2:
                    from fem_glass_tempering_tpu.ops.grid2 import Q2MG
                    if self._grid2_32 is None:
                        raise ValueError(
                            "CG-2 'mg' needs the lattice-native operator "
                            "(grid_native must not be 'off')")
                    self._mg32 = Q2MG(
                        self._grid2_32, make_operator32,
                        nu_pre=sc.mg_nu_pre, nu_post=sc.mg_nu_post,
                        mg_kwargs={"smoother": sc.mg_smoother})
                    self._mg32.freeze_rhos(self.dt)
                    _mark("q2_mg32_freeze")
                elif self.fs_T.family == "DG":
                    self._dg_mg32 = DGMultigrid(
                        self._heat32, make_operator32, dtype=f32,
                        smoother=getattr(sc, "dg_smoother", "auto"),
                        mg_kwargs={"smoother": sc.mg_smoother,
                                   "nu_pre": sc.mg_nu_pre,
                                   "nu_post": sc.mg_nu_post,
                                   "max_levels": sc.mg_max_levels,
                                   "coarse": sc.mg_coarse,
                                   "table_dtype": mg_tdt})
                    self._dg_mg32.freeze(T0, self.dt)
                    _mark("dg_mg32_freeze")
                else:
                    self._mg32 = GeometricMG(self.mesh, make_operator32,
                                             dtype=f32,
                                             smoother=sc.mg_smoother,
                                             nu_pre=sc.mg_nu_pre,
                                             nu_post=sc.mg_nu_post,
                                             max_levels=sc.mg_max_levels,
                                             coarse=sc.mg_coarse,
                                             table_dtype=mg_tdt)
                    self._mg32.freeze_omegas(T0, self.dt)
                    _mark("mg32_freeze")
        # smoothed-aggregation AMG (solver/amg.py): the mesh-agnostic GAMG
        # stand-in for unstructured meshes; hierarchy frozen at (T_0, dt)
        self._amg = self._amg32 = None
        if sc.preconditioner == "amg":
            from fem_glass_tempering_tpu.ops.spmv import EllMatrix
            from fem_glass_tempering_tpu.solver.amg import (
                SmoothedAggregationMG,
            )
            T0v = jnp.full(self.fs_T.n_scalar_dofs, self.params.T_0,
                           dtype=self.dtype)
            self._amg = SmoothedAggregationMG(
                EllMatrix(self.heat), T0v, self.dt, dtype=self.dtype)
            if self._mixed:
                self._amg32 = SmoothedAggregationMG(
                    EllMatrix(self._heat32), T0v.astype(jnp.float32),
                    self.dt, dtype=jnp.float32)
        _mark("amg")
        self.state = self.engine.init_state()
        _mark("init_state")
        self._build_step()
        _mark("build_step")
        if output_dir is not None:
            self.config = dataclasses.replace(
                self.config,
                output=dataclasses.replace(self.config.output, output_dir=output_dir))
        self._history: list[dict] = []
        self._setup_writers()

    def _setup_writers(self) -> None:
        """Instantiate the configured output writers (reference
        _write_initial_output parity, ThermoViscoProblem.py:246-276 — T, phi,
        Tf, xi streams + tensor sigma; our writers handle tensors directly)."""
        self._writers = []
        oc = self.config.output
        if oc.write_every <= 0 or not oc.formats:
            return
        out = oc.output_dir
        if "npz" in oc.formats:
            from fem_glass_tempering_tpu.io.series import NPZSeriesWriter
            self._writers.append(
                NPZSeriesWriter(f"{out}/series.npz", fields=oc.npz_fields))
        if "vtu" in oc.formats:
            from fem_glass_tempering_tpu.io.vtu import VTUSeriesWriter
            w = VTUSeriesWriter(out, "visco", self.mesh)
            w.write = self._wrap_vtu(w)  # type: ignore[method-assign]
            self._writers.append(w)
        if "xdmf" in oc.formats:
            from fem_glass_tempering_tpu.io.xdmf import XDMFWriter
            w = XDMFWriter(f"{out}/sigma.xdmf", self.mesh)
            orig = w.write_function
            w.write = lambda t, state: orig(  # type: ignore[attr-defined]
                "Stress_tensor", self.fs_sigma, state.sigma, t)
            self._writers.append(w)

    def _wrap_vtu(self, w):
        orig_write = type(w).write

        def write(t, state):
            orig_write(w, t, {
                "Temperature": (self.fs_T, np.asarray(state.T)),
                "Fictive_Temperature": (self.fs_T, np.asarray(state.Tf)),
                "Shift_function": (self.fs_T, np.asarray(state.phi)),
                "Shifted_time": (self.fs_T, np.asarray(state.xi)),
                "Stress_tensor": (self.fs_sigma, np.asarray(state.sigma)),
            })
        return write

    # ------------------------------------------------------------------
    def save_checkpoint(self, path: str) -> None:
        from fem_glass_tempering_tpu.io.checkpoint import save_checkpoint
        save_checkpoint(path, self.state, config=self.config,
                        extra={"t": self.t})

    def resume_from(self, path: str) -> None:
        """Restore state + time from a checkpoint (capability the reference
        lacks entirely, SURVEY.md §5)."""
        from fem_glass_tempering_tpu.io.checkpoint import load_checkpoint
        state, meta = load_checkpoint(path, dtype=self.dtype)
        self.state = state
        self.t = float(meta.get("extra", {}).get("t", float(state.t)))

    def _build_step(self) -> None:
        heat, engine, sc = self.heat, self.engine, self.config.solver
        default_dt = self.dt

        mg = self._mg
        mech_fn = self._mech
        grid = self._grid if self._grid is not None else self._grid2
        # the grid-native path subsumes HeatOperator for residual/diag and
        # StencilMatrix for the Jacobian action (CG-1 GridHeatOperator or
        # the CG-2 lattice operator — same duck-typed surface)
        hres = grid if grid is not None else heat
        ell = None
        if sc.linear_operator == "assembled":
            from fem_glass_tempering_tpu.ops.spmv import EllMatrix
            ell = EllMatrix(heat)
        elif sc.linear_operator == "stencil":
            if grid is not None:
                ell = grid
            elif self._dg_mg is not None:
                # share the (non-mixed) DG p-MG's table-form block stencil
                ell = self._dg_mg.stencil
            else:
                from fem_glass_tempering_tpu.ops.stencil import (
                    make_stencil_operator,
                )
                ell = make_stencil_operator(heat)
        self._ell = ell

        # gather-free DG outer loop: the block stencil carries a
        # residual/diag twin of HeatOperator (one stencil matvec + a
        # boundary-layer term instead of full facet-gather assembly —
        # the facet gathers dominate the DG step in emulated f64 on TPU)
        if (grid is None and ell is not None
                and type(ell).__name__ == "DGStencilMatrix"):
            hres = ell
        elif hres is heat and heat.is_dg:
            # matrix-free / gather fallback: the traced SIPG residual
            # reads the interior facet device tables — materialize them
            # now (no-op unless setup skipped the upload)
            heat.ensure_interior_tables()

        dg_mg = self._dg_mg
        amg = getattr(self, "_amg", None)
        amg32 = getattr(self, "_amg32", None)

        # mixed precision: f32 operator twins for the inner CG
        mixed = self._mixed
        grid32 = (self._grid32 if self._grid32 is not None
                  else self._grid2_32)
        ell32 = None
        if mixed:
            if sc.linear_operator == "stencil":
                if grid32 is not None:
                    ell32 = grid32
                elif self._dg_mg32 is not None:
                    # share the DG p-MG's table-form block stencil: the
                    # CG-loop matvec rides the same materialized tables
                    # (one upload, one HBM copy; tables beat the
                    # constant-block form 2x on TPU, profile_dg.py)
                    ell32 = self._dg_mg32.stencil
                else:
                    from fem_glass_tempering_tpu.ops.stencil import (
                        make_stencil_operator,
                    )
                    ell32 = make_stencil_operator(self._heat32)
            elif sc.linear_operator == "assembled":
                from fem_glass_tempering_tpu.ops.spmv import EllMatrix
                ell32 = EllMatrix(self._heat32)
        heat32 = self._heat32
        hres32 = grid32 if grid32 is not None else heat32
        if (grid32 is None and ell32 is not None
                and type(ell32).__name__ == "DGStencilMatrix"):
            hres32 = ell32
        elif mixed and hres32 is heat32 and heat32 is not None and heat32.is_dg:
            heat32.ensure_interior_tables()
        mg32, dg_mg32 = self._mg32, self._dg_mg32
        f32 = jnp.float32
        # the effective f32 CG tolerance: tighter than ~1e-6 is not
        # representable in f32 residual norms. For DG/SIPG the TRUE
        # attainable floor is higher still — ~eps32 * kappa(A) from the
        # input-cast loss alone (measured ~1e-2 relative at 64x64x16 with
        # the SPD vol/area penalty; a jump-form matvec prototype only
        # improved it 2.3x, so it is not a matvec-formulation artifact).
        # Ask f32 CG for 1e-4 on the RECURRENCE: the p-MG-preconditioned
        # solve reaches it in ~3-4 iterations (rho(E)=0.185), the true
        # residual lands at the floor, and the f64 outer Newton acts as
        # iterative refinement contracting by ~the floor per iteration —
        # rtol 1e-12 in ~6-8 Newton x ~3 CG for the hard early steps.
        cg_rtol32 = max(sc.cg_rtol, 1e-4 if heat.is_dg else 1e-6)

        # Residual noise floor (solver/newton.py noise_fn): auto-enabled
        # for mixed precision on TPU, where f64 is double-float emulation
        # (~2^-49 relative) and the late near-equilibrium residual sinks
        # into evaluation roundoff (the BENCH.md noise-floor NaN). The
        # per-row magnitude scale is ||diag(J) * T||: the Jacobian
        # diagonal bounds each row's intermediate term sizes, so
        # noise_rel * that norm bounds the 2-norm of the roundoff in F.
        noise_rel = sc.newton_noise_rel
        if noise_rel is None:
            noise_rel = (64 * 2.0 ** -49) if (
                mixed and jax.default_backend() == "tpu") else 0.0
        # increment-relative forcing (SolverConfig.newton_inc_forcing,
        # solver/newton.py inc_forcing): None = auto 0.05
        inc_forcing = sc.newton_inc_forcing
        if inc_forcing is None:
            inc_forcing = 0.05

        def build_ops(lin_state, dt, lag_mech=False):
            """Frozen-linearization operator bundle at the chunk-start
            state (the jac_lag/jac_every build: one per step or per
            chunk). `lag_mech` additionally freezes the elasticity
            V-cycle (models/mechanics.py build_precond) — engaged only
            for multi-step chunks: per-step it just duplicates the
            fine-table build __call__ shares with its own V-cycle
            (A/B at 64x64x16: 82 vs 64 ms/step)."""
            state_T = lin_state.T
            precond_fn = None
            matvec_fn = None
            diag_fn = None
            if mixed:
                dt32 = jnp.asarray(dt, f32)
                cast = lambda T: T.astype(f32)
                if mg32 is not None:
                    precond_fn = lambda T: mg32.preconditioner(
                        mg32.linearization_states(cast(T)), dt32)
                elif dg_mg32 is not None:
                    precond_fn = lambda T: dg_mg32.preconditioner(
                        cast(T), dt32)
                elif amg32 is not None:
                    precond_fn = lambda T: amg32.preconditioner()
                if ell32 is not None:
                    matvec_fn = lambda T: ell32.make_matvec(cast(T), dt32)
                else:
                    # matrix-free: jvp of the f32 residual at the cast iterate
                    Tp32 = cast(state_T)

                    def matvec_fn(T):
                        T32 = cast(T)
                        return lambda v: jax.jvp(
                            lambda u: heat32.residual(u, Tp32, dt32),
                            (T32,), (v,))[1]
                if sc.preconditioner == "jacobi":
                    diag_fn = lambda T: hres32.jacobian_diag(cast(T), dt32)
            else:
                if mg is not None:
                    precond_fn = lambda T: mg.preconditioner(
                        mg.linearization_states(T), dt)
                elif dg_mg is not None:
                    precond_fn = lambda T: dg_mg.preconditioner(T, dt)
                elif amg is not None:
                    precond_fn = lambda T: amg.preconditioner()
                if ell is not None:
                    matvec_fn = lambda T: ell.make_matvec(T, dt)
                if sc.preconditioner == "jacobi":
                    diag_fn = lambda T: hres.jacobian_diag(T, dt)
            if getattr(sc, "jac_lag", "step") == "step":
                # frozen operator/preconditioner at the linearization
                # temperature (SolverConfig.jac_lag)
                if precond_fn is not None:
                    _pc = precond_fn(state_T)
                    precond_fn = lambda T, _p=_pc: _p
                if matvec_fn is not None:
                    _mv = matvec_fn(state_T)
                    matvec_fn = lambda T, _m=_mv: _m
                if diag_fn is not None:
                    _dgn = diag_fn(state_T)
                    diag_fn = lambda T, _d=_dgn: _d
            noise_fn = None
            inc_diag = None
            if noise_rel or inc_forcing:
                # the per-step Jacobi diagonal feeds the noise floor and
                # the increment-relative forcing. Both are magnitude
                # SCALES (~1% accuracy suffices) that barely move within
                # one step's Newton iterations — evaluate ONCE per step
                # at T_prev instead of per Newton iteration, and in the
                # f32 twin when it exists: the emulated-f64 DG
                # jacobian_diag costs 19.7 ms per call at 524k dofs
                # (examples/profile_dg.py) vs ~0.5 ms for the f32 twin.
                if mixed and hres32 is not None:
                    inc_diag = hres32.jacobian_diag(cast(state_T), dt32)
                    d32 = inc_diag * cast(state_T)
                    floor = (noise_rel * jnp.sqrt(jnp.vdot(d32, d32))
                             ).astype(state_T.dtype)
                else:
                    inc_diag = hres.jacobian_diag(state_T, dt)
                    d = inc_diag * state_T
                    floor = noise_rel * jnp.sqrt(jnp.vdot(d, d))
                if noise_rel:
                    noise_fn = lambda T: floor
            mech_pre = (mech_fn.build_precond(lin_state)
                        if (lag_mech and mech_fn is not None) else None)
            return dict(precond_fn=precond_fn, matvec_fn=matvec_fn,
                        diag_fn=diag_fn, noise_fn=noise_fn,
                        inc_diag=inc_diag, mech_pre=mech_pre)

        def step(state: ViscoState, dt, ops=None):
            if ops is None:
                ops = build_ops(state, dt)
            precond_fn = ops["precond_fn"]
            matvec_fn = ops["matvec_fn"]
            diag_fn = ops["diag_fn"]
            noise_fn = ops["noise_fn"]
            inc_diag = ops["inc_diag"]
            res = newton_solve(
                lambda T: hres.residual(T, state.T, dt),
                state.T,
                noise_fn=noise_fn,
                jac_diag_fn=diag_fn,
                precond_fn=precond_fn,
                matvec_fn=matvec_fn,
                rtol=sc.newton_rtol, atol=sc.newton_atol, max_it=sc.newton_max_it,
                cg_rtol=cg_rtol32 if mixed else sc.cg_rtol,
                cg_atol=sc.cg_atol, cg_max_it=sc.cg_max_it,
                cg_cast=f32 if mixed else None,
                # stall exit tuned to preconditioner strength: an
                # MG-preconditioned solve that hasn't improved in 25
                # iterations is floored (each iteration contracts
                # multiplicatively), while Jacobi-CG has legitimate long
                # plateaus (keep newton_solve's 100 auto-window).
                # Measured (DG 524k rtol 1e-12 on TPU): floored solves
                # burned ~(floor + 100) iterations per Newton step — the
                # stall tail was ~half the remaining CG work.
                cg_stall_window=(25 if (mixed and precond_fn is not None)
                                 else None),
                inc_forcing=inc_forcing, inc_diag=inc_diag,
            )
            mech_call = mech_fn
            if ops.get("mech_pre") is not None:
                mech_call = (lambda st, xi, th, _p=ops["mech_pre"]:
                             mech_fn(st, xi, th, precond=_p))
            new_state = engine.material_step(state, res.x, dt,
                                             mech=mech_call)
            finite = jnp.isfinite(res.x).all()
            return new_state, res.converged & finite, res.iters, res.krylov_iters

        self._step_fn = step

        # operator tables ride as jit ARGUMENTS (utils/jitargs.py): baked
        # closure constants would bloat the serialized HLO past what the
        # remote-compile path accepts (~30 MB, measured HTTP 413) and
        # scale with the mesh; as arguments they are device-resident
        # parameters with zero per-call cost.
        from fem_glass_tempering_tpu.utils.jitargs import TableBundle
        bundle = TableBundle()
        for obj in (grid, heat, ell, mg, dg_mg, amg, amg32, grid32,
                    self._heat32, self._mg32, self._dg_mg32, ell32, engine,
                    mech_fn):
            bundle.register_operator(obj)
        self._bundle = bundle

        def step_outer(state, dt, tbl):
            with bundle.bound(tbl):
                return step(state, dt)

        _step_c = jax.jit(step_outer, donate_argnums=0)
        self._step_jit = lambda state, dt=default_dt: _step_c(
            state, dt, bundle.collect())

        # tolerance-aware default (SolverConfig.resolved_jac_every): stale
        # operators amortize only in the loose-tolerance throughput
        # regime; at tight tolerance the modified-Newton tail costs far
        # more than the build saves (A/B in BENCH.md)
        jac_every = sc.resolved_jac_every()
        chunked = jac_every > 1 and getattr(sc, "jac_lag", "step") == "step"

        def multi_step(state: ViscoState, n: int, dt, tbl):
            with bundle.bound(tbl):
                carry = (state, jnp.bool_(True), jnp.int32(0),
                         jnp.int32(0))
                if not chunked:
                    def body(_, carry):
                        st, ok, ni, ki = carry
                        st2, conv, it, kit = step(st, dt)
                        return st2, ok & conv, ni + it, ki + kit
                    return jax.lax.fori_loop(0, n, body, carry)
                # jac_every chunking: rebuild the frozen operator bundle
                # every jac_every steps (SolverConfig.jac_every); the
                # Python loop unrolls n/jac_every chunk traces inside ONE
                # jitted program
                for c0 in range(0, n, jac_every):
                    ops = build_ops(carry[0], dt, lag_mech=True)

                    def body(_, carry, ops=ops):
                        st, ok, ni, ki = carry
                        st2, conv, it, kit = step(st, dt, ops)
                        return st2, ok & conv, ni + it, ki + kit
                    carry = jax.lax.fori_loop(
                        0, min(jac_every, n - c0), body, carry)
                return carry

        self._multi_step_inner = multi_step   # (state, n, dt, tbl) traced form
        self._multi_step_raw = lambda state, n, dt: multi_step(
            state, n, dt, bundle.collect())
        _ms_dt = jax.jit(multi_step, static_argnums=1)
        self._multi_step_dt = lambda state, n, dt: _ms_dt(
            state, n, dt, bundle.collect())
        _ms = jax.jit(lambda state, n, tbl: multi_step(state, n, default_dt, tbl),
                      static_argnums=1, donate_argnums=0)
        self._multi_step_jit = lambda state, n: _ms(
            state, n, bundle.collect())

    # ------------------------------------------------------------------
    def solve_timestep(self, check_convergence: bool = True) -> ViscoState:
        """Advance one step (heat solve + material update), reference
        solve_timestep parity (ThermoViscoProblem.py:367-381)."""
        state, converged, iters, kiters = self._step_jit(self.state)
        if check_convergence and not bool(converged):
            raise RuntimeError(f"Newton failed to converge at t={self.t + self.dt}")
        self.state = state
        self.t += self.dt
        self.diagnostics.newton_iters += int(iters)
        self.diagnostics.krylov_iters += int(kiters)
        return state

    def solve(self, progress: bool = False,
              on_snapshot: Callable[[float, ViscoState], None] | None = None) -> ViscoState:
        """Run the full time loop (reference solve(),
        ThermoViscoProblem.py:598-611) as jitted multi-step chunks between
        output snapshots. Records end-to-end wall-clock like the reference's
        sole timer, plus per-phase diagnostics."""
        assert self.state is not None, "call setup() first"
        t_start = _time.time()
        we = self.config.output.write_every
        chunk = we if we and we > 0 else self.n_steps
        adaptive = self.config.solver.on_failure == "halve_dt"
        done = 0
        while done < self.n_steps:
            n = min(chunk, self.n_steps - done)
            if adaptive:
                snapshot = jax.device_get(self.state)
            self.state, ok, ni, ki = self._multi_step_jit(self.state, n)
            if not bool(ok):
                if not adaptive:
                    raise RuntimeError(
                        f"Newton failed to converge in steps {done}..{done + n}")
                self.state, ni, ki = self._retry_chunk(snapshot, n)
            done += n
            self.t = self.time[0] + done * self.dt
            self.diagnostics.newton_iters += int(ni)
            self.diagnostics.krylov_iters += int(ki)
            t_io = _time.time()
            for w in self._writers:
                w.write(self.t, self.state)
            ce = self.config.output.checkpoint_every
            if ce and done % ce == 0:
                self.save_checkpoint(
                    f"{self.config.output.output_dir}/checkpoint_{done:06d}.npz")
            self.diagnostics.io_seconds += _time.time() - t_io
            if on_snapshot is not None:
                on_snapshot(self.t, self.state)
            if progress:
                print(f"t={self.t:.3f}")
        jax.block_until_ready(self.state)
        self.elapsed_seconds = _time.time() - t_start
        self._finalize()
        if progress:
            print(f"Solve finished in {self.elapsed_seconds} seconds.")
        return self.state

    def solve_scan(self, fields: tuple = ("T", "Tf", "sigma")):
        """Fully on-device time loop: ONE dispatch for the whole run via
        lax.scan over snapshot chunks, returning stacked field snapshots.
        No host synchronization until the end — the maximal-fusion
        counterpart of solve()'s streaming loop (use solve() when you want
        per-snapshot writers/checkpoints instead).

        Returns (final_state, dict with 'times' + stacked arrays per field).
        """
        assert self.state is not None, "call setup() first"
        import time as _t

        t_start = _t.time()
        we = self.config.output.write_every
        chunk = we if we and we > 0 else self.n_steps
        n_chunks = self.n_steps // chunk
        rem = self.n_steps - n_chunks * chunk
        ms = self._multi_step_inner
        dtv = self.dt

        def run(state, tbl):
            def body(carry, _):
                st, ok_all = carry
                st, ok, ni, ki = ms(st, chunk, dtv, tbl)
                outs = tuple(getattr(st, f) for f in fields)
                return (st, ok_all & ok), (st.t, outs, ni, ki)

            (st, ok), (ts, outs, ni, ki) = jax.lax.scan(
                body, (state, jnp.bool_(True)), None, length=n_chunks)
            return st, ok, ts, outs, ni, ki

        st, ok, ts, outs, ni, ki = jax.jit(run, donate_argnums=0)(
            self.state, self._bundle.collect())
        if rem:
            st, ok2, ni2, ki2 = self._multi_step_dt(st, rem, dtv)
            ok = ok & ok2
        jax.block_until_ready(st)
        if not bool(ok):
            raise RuntimeError("Newton failed to converge during solve_scan")
        self.state = st
        self.t = self.time[0] + self.n_steps * self.dt
        self.diagnostics.newton_iters += int(np.sum(np.asarray(ni)))
        self.diagnostics.krylov_iters += int(np.sum(np.asarray(ki)))
        self.elapsed_seconds = _t.time() - t_start
        result = {"times": np.asarray(ts)}
        for i, f in enumerate(fields):
            result[f] = np.asarray(outs[i])
        return st, result

    def _retry_chunk(self, snapshot, n: int):
        """Failure recovery (absent in the reference, which aborts —
        ThermoViscoProblem.py:390): rerun a failed n-step chunk at
        successively halved dt. Each halving runs the SAME compiled
        program twice per level with dt/2 (dt is a traced scalar), so no
        recompilation. Raises after solver.max_dt_halvings levels."""
        sc = self.config.solver
        dt = self.dt
        for level in range(1, sc.max_dt_halvings + 1):
            dt = dt / 2.0
            state = jax.device_put(snapshot)
            ok_all = True
            ni_tot = ki_tot = 0
            for _ in range(2 ** level):
                state, ok, ni, ki = self._multi_step_dt(state, n, dt)
                ni_tot += int(ni)
                ki_tot += int(ki)
                if not bool(ok):
                    ok_all = False
                    break
            if ok_all:
                self.diagnostics.dt_halvings = getattr(
                    self.diagnostics, "dt_halvings", 0) + level
                return state, ni_tot, ki_tot
        raise RuntimeError(
            f"Newton failed even after {sc.max_dt_halvings} dt halvings")

    def _finalize(self) -> None:
        for w in self._writers:
            try:
                w.close()
            except TypeError:
                pass
