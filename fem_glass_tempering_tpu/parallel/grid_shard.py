"""GSPMD domain decomposition: the sharded grid-native coupled step.

The TPU-idiomatic replacement for the reference's `mpiexec -np N` domain
decomposition (/root/reference/README.md:62-66, partition at
ThermoViscoProblem.py:27-28, ghost exchange :349-354): every ViscoState
field is stored GRID-SHAPED — (gx, gy, gz) node grid plus trailing
tableau/tensor axes — and sharded over a 1D device mesh along grid axis 0
with `jax.sharding.NamedSharding`. The step is the fully gather-free
operator chain (ops/grid.py stencils + face-slice flux + the pointwise
material cascade), so XLA's SPMD partitioner lowers it to

  - local stencil arithmetic per shard,
  - one-plane halo exchange as collective-permute at the pad/slice shifts
    (the `scatter_forward` analog, riding ICI),
  - psum'd dot products in Newton/CG (PETSc's VecDot reduction analog).

Nothing is replicated: dof vectors, material history, and the stencil
value tables all scale 1/N per device — unlike parallel/sharding.py
(which distributes assembly only) and without the per-iteration index
gathers of the explicit shard_map paths (parallel/domain*.py). Validated
against the single-device step to ~1e-15 on a forced multi-device CPU
mesh (tests/test_grid_ops.py, tests/test_grid_mg.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fem_glass_tempering_tpu.config import RunConfig
from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace
from fem_glass_tempering_tpu.fem.mesh import Mesh as FEMesh
from fem_glass_tempering_tpu.models.viscoelastic import (
    ViscoState,
    ViscoelasticEngine,
)
from fem_glass_tempering_tpu.ops.grid import GridHeatOperator
from fem_glass_tempering_tpu.ops.heat import HeatOperator
from fem_glass_tempering_tpu.solver.newton import newton_solve

AXIS = "x"


class GridShardedProblem:
    """Coupled thermo-viscoelastic tempering, sharded over a device mesh.

    Requires the flagship configuration: uniform box mesh, CG-1 T space,
    CG-1 sigma space (same scalar dofs — the cross-space evaluation is the
    identity, so the material chain is purely pointwise)."""

    def __init__(self, mesh: FEMesh, config: RunConfig, devices=None):
        fe = config.fe
        if fe.T_family == "DG" and fe.T_degree != 1:
            raise ValueError("GridShardedProblem supports DG degree 1")
        if fe.T_family == "CG" and fe.T_degree not in (1, 2):
            raise ValueError("GridShardedProblem supports CG degree 1-2")
        if fe.T_family not in ("CG", "DG"):
            raise ValueError("GridShardedProblem needs a CG or DG T space")
        if fe.sigma_family != "CG" or fe.sigma_degree != 1:
            raise ValueError("GridShardedProblem needs a CG-1 sigma space")
        if mesh.structured is None:
            raise ValueError("GridShardedProblem needs a structured box mesh")
        self.is_dg = fe.T_family == "DG"
        self.is_q2 = fe.T_family == "CG" and fe.T_degree == 2
        if config.solver.preconditioner == "auto":
            # structured degree-1 is guaranteed here (checks above): 'auto'
            # resolves to grid-native (p-)MG, the GAMG equivalent
            config = dataclasses.replace(
                config, solver=dataclasses.replace(
                    config.solver, preconditioner="mg"))
        self.config = config
        self.mesh = mesh
        self.dtype = (jnp.float64 if config.dtype == "float64"
                      else jnp.float32)
        if self.dtype == jnp.float64 and not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)
        if jax.config.jax_default_matmul_precision is None:
            jax.config.update("jax_default_matmul_precision", "highest")

        self.fs_T = FunctionSpace(mesh, fe.T_family, fe.T_degree)
        self.fs_sigma = FunctionSpace(mesh, "CG", 1,
                                      value_shape=(mesh.tdim, mesh.tdim))
        self.params = config.params
        self.dt = config.time.dt
        self.n_steps = config.time.n_steps
        self.engine = ViscoelasticEngine(
            self.fs_T, self.fs_sigma, self.params, self.dt,
            physics_mode=config.physics_mode,
            shift_function=config.shift_function,
            xi_formula=config.xi_formula, dtype=self.dtype)
        devices = list(devices if devices is not None else jax.devices())
        self.dev_mesh = Mesh(np.array(devices), (AXIS,))
        self.n_devices = len(devices)
        heat_form = getattr(config, "heat_form", "reference")
        self._mixed = (config.solver.cg_dtype == "float32"
                       and self.dtype == jnp.float64)
        if self.is_dg:
            self._init_dg(mesh, config, heat_form)
            self._build_shardings()
            self._build_step()
            return
        if self.is_q2:
            self._init_q2(mesh, config, heat_form)
            self._build_shardings()
            self._build_step()
            return
        assert self.engine.to_sigma.same_space("T"), \
            "CG-1/CG-1 must share the scalar dofmap"
        self.heat = HeatOperator(self.fs_T, self.params, self.dt,
                                 dtype=self.dtype)
        # pad the sharded node-grid axis up to a device multiple; the ghost
        # planes are identity rows (GSPMD cannot shard uneven dims)
        gx = mesh.structured["dims"][0] + 1
        pad = (-gx) % self.n_devices
        self.grid_op = GridHeatOperator(self.heat, pad_axis0=pad,
                                        allow_const=False)
        self.grid = self.grid_op.grid
        self._ngrid_base = self.grid_op.st.grid
        self.pad0 = pad
        # mixed precision (f64 Newton / f32 Krylov): f32 operator twins,
        # exactly the single-device route to the reference's rtol 1e-12
        # on TPU (models/problem.py; TPUs have no native f64)
        self.grid_op32 = None
        if self._mixed:
            heat32 = HeatOperator(self.fs_T, self.params, self.dt,
                                  dtype=jnp.float32,
                                  form=heat_form)
            self.grid_op32 = GridHeatOperator(heat32, pad_axis0=pad,
                                              allow_const=False)
        # geometric-MG preconditioner, grid-native so it shards with the
        # step (solver/grid_mg.py) — the GAMG-under-MPI transparency of
        # the reference (/root/reference/ThermoViscoProblem.py:339-346):
        # the same V-cycle program runs single-device or sharded
        self.grid_mg = None
        if config.solver.preconditioner == "mg":
            from fem_glass_tempering_tpu.solver.grid_mg import GridMG
            heat_form = getattr(config, "heat_form", "reference")
            mg_dtype = jnp.float32 if self._mixed else self.dtype
            mg_fine = self.grid_op32 if self._mixed else self.grid_op

            def make_heat_operator(level_mesh):
                fs = FunctionSpace(level_mesh, "CG", 1)
                return HeatOperator(fs, self.params, self.dt,
                                    dtype=mg_dtype, form=heat_form)

            self.grid_mg = GridMG(
                mg_fine, make_heat_operator,
                smoother=config.solver.mg_smoother,
                nu_pre=getattr(config.solver, "mg_nu_pre", 2),
                nu_post=getattr(config.solver, "mg_nu_post", 2),
                # 'dense' (explicit cap) maps to 'auto' here: GridMG's
                # dense coarse is always the auto stopping rule
                coarse=("smooth" if getattr(config.solver, "mg_coarse",
                                            "auto") == "smooth"
                        else "auto"))
            self.grid_mg.freeze_rhos(self.dt)
        # equilibrium mechanics, gather-free and grid-shaped so it shards
        # with the step (models/mechanics.py GridMechanicsCoupling)
        self.mech = None
        if config.mechanics == "equilibrium":
            from fem_glass_tempering_tpu.models.mechanics import (
                GridMechanicsCoupling,
            )
            mech_rtol = min(config.solver.cg_rtol, 1e-8)
            if self.dtype == jnp.float32:
                # f32 CG residual norms bottom out near ~1e-6 relative;
                # below that the extra iterations refine noise (same
                # floor as the single-device driver, models/problem.py)
                mech_rtol = max(mech_rtol, 2e-6)
            mech_inc = getattr(config.solver, "mech_inc_rtol", None)
            if mech_inc is None:
                mech_inc = 1e-2
            self.mech = GridMechanicsCoupling(
                self.fs_sigma, self.engine, dtype=self.dtype,
                cg_rtol=mech_rtol, inc_rtol=mech_inc,
                pad_axis0=pad, grid_shaped=True)
        self._build_shardings()
        self._build_step()

    # ------------------------------------------------------------------
    def _init_dg(self, mesh: FEMesh, config: RunConfig,
                 heat_form: str) -> None:
        """DG-1 temperature under GSPMD: the reference's DEFAULT element
        (/root/reference/main.py:25) on the flagship sharded path. The
        T-space state lives CELL-grid-shaped (cx, cy, cz, nloc) sharded on
        cell axis 0 (must divide the device count); sigma-space fields
        stay node-grid-shaped exactly like the CG path. The heat solve is
        the gather-free grid DG stencil (solver/grid_dg.py), the
        preconditioner the column-smoothed p-MG with its CG correction on
        GridMG — the whole step is one GSPMD program."""
        from fem_glass_tempering_tpu.solver.grid_dg import (
            GridDGOperator,
            dg_vertex_offsets,
        )

        sc = config.solver
        dims = tuple(mesh.structured["dims"])
        # cell-grid axis 0 need not divide the device count: T-space state
        # fields are PADDED with edge-replicated ghost cell layers up to a
        # device multiple (explicit NamedSharding requires divisibility),
        # and the step body slices back to the physical cell grid before
        # the unpadded operators run — GSPMD handles the uneven
        # intermediate shardings internally. Ghost layers are
        # re-edge-padded from the solved fields at step exit, so they
        # never influence physics (equivalence tested vs single-device,
        # tests/test_grid_dg.py).
        self.cell_pad0 = (-dims[0]) % self.n_devices
        self.cell_dims = dims
        self._vert_offs, self._ngrid_base = dg_vertex_offsets(mesh)
        self.nloc = self.fs_T.element.nloc
        # sigma (node-grid) fields pad axis 0 to a device multiple like
        # the CG path; T-space cell grids divide exactly (checked above)
        gx = self._ngrid_base[0]
        self.pad0 = (-gx) % self.n_devices
        self.grid = (gx + self.pad0,) + self._ngrid_base[1:]
        self.heat = HeatOperator(self.fs_T, self.params, self.dt,
                                 dtype=self.dtype, form=heat_form,
                                 interior_device_tables=False)
        self.dg_op = GridDGOperator(self.heat)
        self.dg_op32 = None
        heat32 = None
        if self._mixed:
            heat32 = HeatOperator(self.fs_T, self.params, self.dt,
                                  dtype=jnp.float32, form=heat_form,
                                  interior_device_tables=False)
            self.dg_op32 = GridDGOperator(heat32)
        self.grid_op = self.grid_op32 = None
        self.grid_mg = None
        # equilibrium mechanics under sharded DG: the elasticity solve
        # lives on the NODE grid (sigma space) exactly as in the CG path;
        # the step body converts the cell-grid xi / thermal-strain scalar
        # through the DG->CG vertex map before calling it (_build_step)
        self.mech = None
        if config.mechanics == "equilibrium":
            from fem_glass_tempering_tpu.models.mechanics import (
                GridMechanicsCoupling,
            )
            mech_rtol = min(sc.cg_rtol, 1e-8)
            if self.dtype == jnp.float32:
                mech_rtol = max(mech_rtol, 2e-6)
            mech_inc = getattr(sc, "mech_inc_rtol", None)
            if mech_inc is None:
                mech_inc = 1e-2
            self.mech = GridMechanicsCoupling(
                self.fs_sigma, self.engine, dtype=self.dtype,
                cg_rtol=mech_rtol, inc_rtol=mech_inc,
                pad_axis0=self.pad0, grid_shaped=True)
        self.dg_mg = None
        if sc.preconditioner == "mg":
            from fem_glass_tempering_tpu.solver.multigrid import DGMultigrid
            mg_dtype = jnp.float32 if self._mixed else self.dtype
            mg_heat = heat32 if self._mixed else self.heat

            def make_cg_operator(level_mesh):
                fs = FunctionSpace(level_mesh, "CG", 1)
                return HeatOperator(fs, self.params, self.dt,
                                    dtype=mg_dtype, form=heat_form)

            self.dg_mg = DGMultigrid(
                mg_heat, make_cg_operator, dtype=mg_dtype,
                smoother=getattr(sc, "dg_smoother", "auto"),
                coarse_kind="grid", grid_pad0=self.pad0,
                mg_kwargs={"smoother": sc.mg_smoother,
                           "nu_pre": getattr(sc, "mg_nu_pre", 2),
                           "nu_post": getattr(sc, "mg_nu_post", 2),
                           "coarse": ("smooth" if getattr(
                               sc, "mg_coarse", "auto") == "smooth"
                               else "auto")})
            self.dg_mg.freeze(float(self.params.T_0), self.dt)

    # ------------------------------------------------------------------
    def _init_q2(self, mesh: FEMesh, config: RunConfig,
                 heat_form: str) -> None:
        """CG-2 temperature under GSPMD: the T-space state lives on the
        Q2 dof LATTICE (2n+1 per axis) sharded along axis 0 with a
        state-level ghost pad (the DG cell_pad0 mechanism — explicit
        shardings need divisibility; the step computes on the physical
        lattice). The heat solve is the sum-factorized lattice operator
        (ops/grid2.py) whose banded passes and face-plane flux are pure
        pad/slice/elementwise — XLA partitions them with halo
        collective-permutes — and the preconditioner is Q2MG's
        grid-shaped apply with its CG-1 GridMG coarse chain padded the
        same way as the CG-1 flagship path."""
        from fem_glass_tempering_tpu.ops.grid2 import (
            GridHeatOperator2,
            Q2MG,
        )

        sc = config.solver
        dims = tuple(mesh.structured["dims"])
        self.lat_base = tuple(2 * n + 1 for n in dims)
        self.lat_pad0 = (-self.lat_base[0]) % self.n_devices
        # sigma node grid pads like the CG-1 path
        gx = dims[0] + 1
        self.pad0 = (-gx) % self.n_devices
        self.grid = (gx + self.pad0,) + tuple(n + 1 for n in dims[1:])
        self._ngrid_base = tuple(n + 1 for n in dims)
        self.heat = HeatOperator(self.fs_T, self.params, self.dt,
                                 dtype=self.dtype, form=heat_form)
        self.q2_op = GridHeatOperator2(self.heat)
        self.q2_op32 = None
        heat32 = None
        if self._mixed:
            heat32 = HeatOperator(self.fs_T, self.params, self.dt,
                                  dtype=jnp.float32, form=heat_form)
            self.q2_op32 = GridHeatOperator2(heat32)
        self.grid_op = self.grid_op32 = None
        self.dg_op = self.dg_op32 = None
        self.dg_mg = None
        self.mech = None
        if config.mechanics == "equilibrium":
            raise ValueError("equilibrium mechanics under sharded CG-2 "
                             "is not wired yet — use the CG-1 path")
        self.grid_mg = None
        if sc.preconditioner == "mg":
            mg_dtype = jnp.float32 if self._mixed else self.dtype
            mg_fine = self.q2_op32 if self._mixed else self.q2_op

            def make_cg_operator(level_mesh):
                fs = FunctionSpace(level_mesh, "CG", 1)
                return HeatOperator(fs, self.params, self.dt,
                                    dtype=mg_dtype, form=heat_form)

            self.grid_mg = Q2MG(
                mg_fine, make_cg_operator,
                nu_pre=getattr(sc, "mg_nu_pre", 2),
                nu_post=getattr(sc, "mg_nu_post", 2),
                mg_kwargs={"smoother": sc.mg_smoother},
                coarse_pad0=self.pad0)
            self.grid_mg.freeze_rhos(self.dt)

    _TSPACE_FIELDS = frozenset(
        {"T", "T_prev", "Tf", "Tf_prev", "Tf_partial", "phi", "xi"})

    def _is_cellgrid(self, name: str) -> bool:
        return ((self.is_dg or self.is_q2)
                and name in self._TSPACE_FIELDS)

    def _t_shape(self) -> tuple:
        """UNPADDED grid shape of a scalar T-space field."""
        if self.is_dg:
            return self.cell_dims + (self.nloc,)
        return self.lat_base

    def _t_pad0(self) -> int:
        return (getattr(self, "cell_pad0", 0) if self.is_dg
                else getattr(self, "lat_pad0", 0))

    # ------------------------------------------------------------------
    def _to_grid(self, state: ViscoState) -> ViscoState:
        """Flat dof-vector state -> grid-shaped state, ghost planes padded
        by edge replication (so the pointwise material chain stays finite
        there; the heat solve treats them as identity rows). DG T-space
        fields reshape to the cell grid + local-dof axis, unpadded."""
        base = self._ngrid_base           # unpadded node grid

        def f(name, a):
            if name == "t" or a is None:
                return a
            if self._is_cellgrid(name):
                g = a.reshape(self._t_shape() + a.shape[1:])
                cp = self._t_pad0()
                if cp:
                    pc = [(0, cp)] + [(0, 0)] * (g.ndim - 1)
                    g = jnp.pad(g, pc, mode="edge")
                return g
            g = a.reshape(base + a.shape[1:])
            if self.pad0:
                pc = [(0, self.pad0)] + [(0, 0)] * (g.ndim - 1)
                g = jnp.pad(g, pc, mode="edge")
            return g
        return ViscoState(**{k: f(k, getattr(state, k))
                             for k in ViscoState._fields})

    def _to_flat(self, state: ViscoState) -> ViscoState:
        def f(name, a):
            if name == "t" or a is None:
                return a
            if self._is_cellgrid(name):
                cp = self._t_pad0()
                if cp:
                    a = a[: a.shape[0] - cp]
                d = len(self._t_shape())
                extra = a.shape[d:]
                return a.reshape((-1,) + extra)
            if self.pad0:
                a = a[: a.shape[0] - self.pad0]
            extra = a.shape[len(self.grid):]
            return a.reshape((-1,) + extra)
        return ViscoState(**{k: f(k, getattr(state, k))
                             for k in ViscoState._fields})

    def _build_shardings(self) -> None:
        shard = NamedSharding(self.dev_mesh, P(AXIS))
        rep = NamedSharding(self.dev_mesh, P())
        proto = self._to_grid(self.engine.init_state())
        self._state_shardings = ViscoState(**{
            k: (rep if k == "t" else shard) for k in ViscoState._fields})
        self._proto = proto

    def init_state(self) -> ViscoState:
        """Initial state, grid-shaped, sharded across the mesh. Built
        inside jit (out_shardings) so uneven plane counts are padded by
        GSPMD — device_put would require divisibility."""
        make = jax.jit(lambda: self._to_grid(self.engine.init_state()),
                       out_shardings=self._state_shardings)
        return make()

    # ------------------------------------------------------------------
    def _build_step(self) -> None:
        g = self.grid_op
        engine = self.engine
        sc = self.config.solver
        default_dt = self.dt
        if self.is_dg:
            # T-space (cell-grid) fields -> sigma (node-grid) fields: the
            # last-cell-wins vertex map as 2^d slice writes + the sigma
            # ghost-plane edge pad (solver/grid_dg.py dg_to_nodes_g)
            from fem_glass_tempering_tpu.solver.grid_dg import dg_to_nodes_g
            vo, ngrid = self._vert_offs, self._ngrid_base
            pad_sig = self.pad0

            def ident(name, ag):
                ng = dg_to_nodes_g(ag, vo, ngrid)
                if pad_sig:
                    ng = jnp.pad(ng, [(0, pad_sig)]
                                 + [(0, 0)] * (ng.ndim - 1), mode="edge")
                return ng
        elif self.is_q2:
            # Q2 lattice -> CG-1 node values: the vertices ARE the even
            # lattice points (Lagrange nodal basis), so the cross-eval is
            # an even-stride injection (strided READS are fine on TPU)
            # plus the sigma ghost-plane edge pad
            pad_sig = self.pad0
            d = len(self.lat_base)

            def ident(name, ag):
                ng = ag
                for a in range(d):
                    ng = jax.lax.slice_in_dim(ng, 0, ng.shape[a],
                                              stride=2, axis=a)
                if pad_sig:
                    ng = jnp.pad(ng, [(0, pad_sig)]
                                 + [(0, 0)] * (ng.ndim - 1), mode="edge")
                return ng
        else:
            ident = lambda name, arr: arr  # CG-1/CG-1: cross-eval is identity

        mg = self.grid_mg
        mech_fn = self.mech
        if self.is_dg and mech_fn is not None:
            # the elasticity coupling consumes NODE-grid scalars; convert
            # the cell-grid xi / thermal-strain args through the DG->CG
            # vertex map (the engine's other sigma-space inputs already
            # ride through `ident`)
            _mech_raw = mech_fn

            class _DGMech:
                @staticmethod
                def __call__(st, xi, th, precond=None):
                    return _mech_raw(st, ident("T", xi), ident("T", th),
                                     precond=precond)

                @staticmethod
                def build_precond(st):
                    return _mech_raw.build_precond(
                        st._replace(xi=ident("T", st.xi)))
            mech_fn = _DGMech()
        g32 = self.grid_op32
        mixed = self._mixed
        f32 = jnp.float32
        # f32 residual norms cannot certify tighter than ~1e-6
        cg_rtol_eff = max(sc.cg_rtol, 1e-6) if mixed else sc.cg_rtol
        # residual noise floor (solver/newton.py): auto for mixed precision
        # on TPU, where f64 is double-float emulation (models/problem.py)
        noise_rel = sc.newton_noise_rel
        if noise_rel is None:
            noise_rel = (64 * 2.0 ** -49) if (
                mixed and jax.default_backend() == "tpu") else 0.0
        # increment-relative forcing (SolverConfig.newton_inc_forcing,
        # solver/newton.py inc_forcing): None = auto 0.05. The psum-
        # reduced dots inside newton_solve keep the prediction global
        # under sharding.
        inc_forcing = sc.newton_inc_forcing
        if inc_forcing is None:
            inc_forcing = 0.05

        dg = getattr(self, "dg_op", None)
        dg32 = getattr(self, "dg_op32", None)
        dmg = getattr(self, "dg_mg", None)
        is_dg = self.is_dg
        is_q2 = self.is_q2
        q2 = getattr(self, "q2_op", None)
        q232 = getattr(self, "q2_op32", None)
        # production / f32-twin operator views with a COMMON surface:
        # residual_g / make_matvec_g / jacobian_diag_g — the step body
        # below is element-family-agnostic
        op_main = dg if is_dg else (q2 if is_q2 else g)
        op_fast = ((dg32 or dg) if is_dg
                   else ((q232 or q2) if is_q2 else (g32 or g)))

        # T-space ghost layers (state-level pad for non-divisible DG cell
        # / Q2 lattice axes): slice off at step entry, edge-pad at exit.
        cpad = self._t_pad0() if (is_dg or is_q2) else 0
        cell_fields = (self._TSPACE_FIELDS if (is_dg or is_q2)
                       else frozenset())

        def unpad_cs(st: ViscoState) -> ViscoState:
            if not cpad:
                return st
            return ViscoState(**{
                k: (jax.lax.slice_in_dim(v, 0, v.shape[0] - cpad, axis=0)
                    if (k in cell_fields and v is not None) else v)
                for k, v in zip(ViscoState._fields, st)})

        def pad_cs(st: ViscoState) -> ViscoState:
            if not cpad:
                return st
            return ViscoState(**{
                k: (jnp.pad(v, [(0, cpad)] + [(0, 0)] * (v.ndim - 1),
                            mode="edge")
                    if (k in cell_fields and v is not None) else v)
                for k, v in zip(ViscoState._fields, st)})

        def build_ops(lin_state, dt, lag_mech=False):
            """Frozen-linearization operator bundle (models/problem.py
            build_ops, sharded twin): one build per step or per
            jac_every chunk. `lag_mech` freezes the elasticity V-cycle —
            chunked path only (see models/problem.py rationale)."""
            T_lin = lin_state.T
            if mixed:
                dt32 = jnp.asarray(dt, f32)
                cast = lambda T: T.astype(f32)
                matvec_fn = lambda T: op_fast.make_matvec_g(cast(T), dt32)
                if is_dg and dmg is not None:
                    precond_fn = lambda T: dmg.preconditioner_g(
                        cast(T), dt32, op_fast.make_matvec_g(cast(T), dt32))
                    diag_fn = None
                elif mg is not None:
                    precond_fn = lambda T: mg.preconditioner_g(
                        mg.linearization_states_g(cast(T)), dt32)
                    diag_fn = None
                else:
                    precond_fn = None
                    diag_fn = lambda T: op_fast.jacobian_diag_g(cast(T),
                                                                dt32)
            else:
                matvec_fn = lambda T: op_main.make_matvec_g(T, dt)
                if is_dg and dmg is not None:
                    precond_fn = lambda T: dmg.preconditioner_g(
                        T, dt, op_main.make_matvec_g(T, dt))
                    diag_fn = None
                elif mg is not None:
                    precond_fn = lambda T: mg.preconditioner_g(
                        mg.linearization_states_g(T), dt)
                    diag_fn = None
                else:
                    precond_fn = None
                    diag_fn = lambda T: op_main.jacobian_diag_g(T, dt)
            if getattr(sc, "jac_lag", "step") == "step":
                if precond_fn is not None:
                    _pc = precond_fn(T_lin)
                    precond_fn = lambda T, _p=_pc: _p
                if matvec_fn is not None:
                    _mv = matvec_fn(T_lin)
                    matvec_fn = lambda T, _m=_mv: _m
                if diag_fn is not None:
                    _dgn = diag_fn(T_lin)
                    diag_fn = lambda T, _d=_dgn: _d
            noise_fn = None
            if noise_rel:
                def noise_fn(T):
                    d = op_main.jacobian_diag_g(T, dt) * T
                    return noise_rel * jnp.sqrt(jnp.vdot(d, d))
            inc_diag = None
            if inc_forcing:
                # frozen magnitude scale (models/problem.py): the f32
                # twin when it exists, else the production operator
                if mixed:
                    inc_diag = op_fast.jacobian_diag_g(cast(T_lin), dt32)
                else:
                    inc_diag = op_main.jacobian_diag_g(T_lin, dt)
            # lagged elasticity V-cycle (models/mechanics.py
            # build_precond): the mech CG system stays fresh per step
            mech_pre = (mech_fn.build_precond(lin_state)
                        if (lag_mech and mech_fn is not None) else None)
            return dict(precond_fn=precond_fn, matvec_fn=matvec_fn,
                        diag_fn=diag_fn, noise_fn=noise_fn,
                        inc_diag=inc_diag, mech_pre=mech_pre)

        def step(state: ViscoState, dt, ops=None):
            state = unpad_cs(state)
            if ops is None:
                ops = build_ops(state, dt)
            precond_fn = ops["precond_fn"]
            matvec_fn = ops["matvec_fn"]
            diag_fn = ops["diag_fn"]
            noise_fn = ops["noise_fn"]
            inc_diag = ops["inc_diag"]
            res = newton_solve(
                lambda T: op_main.residual_g(T, state.T, dt), state.T,
                jac_diag_fn=diag_fn,
                precond_fn=precond_fn,
                matvec_fn=matvec_fn,
                noise_fn=noise_fn,
                rtol=sc.newton_rtol, atol=sc.newton_atol,
                max_it=sc.newton_max_it, cg_rtol=cg_rtol_eff,
                cg_atol=sc.cg_atol, cg_max_it=sc.cg_max_it,
                cg_cast=f32 if mixed else None,
                inc_forcing=inc_forcing, inc_diag=inc_diag,
            )
            mech_call = mech_fn
            if ops.get("mech_pre") is not None:
                mech_call = (lambda st, xi, th, _p=ops["mech_pre"]:
                             mech_fn(st, xi, th, precond=_p))
            new_state = engine.material_step_with(state, res.x, ident, dt,
                                                  mech=mech_call)
            finite = jnp.isfinite(res.x).all()
            return (pad_cs(new_state), res.converged & finite, res.iters,
                    res.krylov_iters)

        # operator tables as jit arguments (see utils/jitargs.py) — baked
        # constants would exceed the remote-compile payload limit at
        # production mesh sizes. Only the grid-native tables are needed
        # here (the gather-assembly tables are never touched); each is
        # sharded along its grid-x axis so devices hold only their slab
        # of the stencil values.
        from fem_glass_tempering_tpu.utils.jitargs import TableBundle
        bundle = TableBundle()
        if is_dg:
            bundle.register_operator(dg)
            if dg32 is not None:
                bundle.register_operator(dg32)
            if dmg is not None:
                bundle.register_operator(dmg)
        elif is_q2:
            bundle.register_operator(q2)
            if q232 is not None:
                bundle.register_operator(q232)
            if mg is not None:
                bundle.register_operator(mg)   # Q2MG (fine + CG-1 chain)
        else:
            bundle.register(g, ("vals_mass", "vals_stiff", "M1g",
                                "bc_mask_g", "bc_values_g"))
            if g32 is not None:
                bundle.register(g32, ("vals_mass", "vals_stiff", "M1g",
                                      "bc_mask_g", "bc_values_g"))
            if mg is not None:
                bundle.register(mg, ("coarse_inv",))
                for op in mg.ops[1:]:
                    bundle.register(op, ("vals_mass", "vals_stiff", "M1g",
                                         "bc_mask_g", "bc_values_g"))
        if self.mech is not None:
            # register the RAW coupling (the DG adapter is a thin shim)
            bundle.register_operator(self.mech)
        self._bundle = bundle
        shard = NamedSharding(self.dev_mesh, P(AXIS))
        rep = NamedSharding(self.dev_mesh, P())
        d = len(self.grid)
        # every level's node grid gets sliced along the sharded axis; the
        # fine level is padded to a device multiple, coarse levels shard
        # unevenly (GSPMD pads internally) and replicate once their plane
        # count drops below the device count
        if is_dg:
            grids = [self.cell_dims]
            if dmg is not None:
                grids += [gr for gr in dmg.cg_mg.grids()]
                # the column smoother's per-type mask leads with the
                # merged cross-column axis (cx outermost) — shardable
                data = getattr(dmg, "_frozen_smoother_data", None)
                if data is not None and "colmask" in data:
                    grids.append(tuple(data["colmask"].shape[:1]))
        elif is_q2:
            grids = [self.lat_base]
            if mg is not None:
                grids += [gr for gr in mg.gmg.grids()]
        else:
            grids = [self.grid] + ([gr for gr in mg.grids()[1:]]
                                   if mg is not None else [])

        def leaf_sharding(a):
            for gr in grids:
                dg_ = len(gr)
                # explicit placement needs divisibility; uneven (coarse)
                # level tables stay replicated — they are small
                if gr[0] % self.n_devices:
                    continue
                if a.ndim >= dg_ + 1 and a.shape[1:dg_ + 1] == gr:
                    return NamedSharding(self.dev_mesh, P(None, AXIS))
                if a.ndim >= dg_ and a.shape[:dg_] == gr:
                    return shard
            return rep

        tbl0 = bundle.collect()
        tbl_sh = jax.tree_util.tree_map(leaf_sharding, tbl0)
        # place tables on the mesh ONCE (jit would otherwise re-transfer
        # the device-0-committed arrays on every call)
        place = jax.jit(lambda t: t, out_shardings=tbl_sh)
        self._tbl = place(tbl0)

        ss = self._state_shardings

        def step_outer(state, dt, tbl):
            with bundle.bound(tbl):
                return step(state, dt)

        _step_c = jax.jit(
            step_outer,
            in_shardings=(ss, None, tbl_sh),
            out_shardings=(ss, rep, rep, rep),
            donate_argnums=0)
        self._step_jit = lambda state, dt=default_dt: _step_c(
            state, dt, self._tbl)

        jac_every = sc.resolved_jac_every()
        chunked = (jac_every > 1
                   and getattr(sc, "jac_lag", "step") == "step")

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
                for c0 in range(0, n, jac_every):
                    ops = build_ops(unpad_cs(carry[0]), dt, lag_mech=True)

                    def body(_, carry, ops=ops):
                        st, ok, ni, ki = carry
                        st2, conv, it, kit = step(st, dt, ops)
                        return st2, ok & conv, ni + it, ki + kit
                    carry = jax.lax.fori_loop(
                        0, min(jac_every, n - c0), body, carry)
                return carry

        _ms = jax.jit(
            multi_step, static_argnums=1,
            in_shardings=(ss, None, tbl_sh),
            out_shardings=(ss, rep, rep, rep),
            donate_argnums=0)
        self._multi_step_jit = lambda state, n, dt=default_dt: _ms(
            state, n, dt, self._tbl)

    # ------------------------------------------------------------------
    def step(self, state: ViscoState):
        state, ok, ni, ki = self._step_jit(state)
        return state, bool(ok), int(ni), int(ki)

    def run(self, state: ViscoState, n_steps: int | None = None):
        n = n_steps if n_steps is not None else self.n_steps
        state, ok, ni, ki = self._multi_step_jit(state, n)
        return state, bool(ok), int(ni), int(ki)

    # ------------------------------------------------------------------
    def solve(self, state: ViscoState | None = None, *,
              n_steps: int | None = None, progress: bool = False):
        """Full time loop with PER-SHARD streaming output and sharded
        checkpointing — the reference's per-rank ADIOS2 write loop
        (ThermoViscoProblem.py:246-263, :374) for the GSPMD path: jitted
        multi-step chunks between snapshots, each snapshot streaming only
        the local shards to disk (io/sharded.py), never a global gather."""
        import time as _time

        if state is None:
            state = self.init_state()
        n_total = n_steps if n_steps is not None else self.n_steps
        oc = self.config.output
        we = oc.write_every
        chunk = we if we and we > 0 else n_total
        writer = None
        if we and we > 0 and oc.formats:
            from fem_glass_tempering_tpu.io.sharded import ShardedSeriesWriter
            cell_kw = {}
            if self.is_dg or self.is_q2:
                cp = self._t_pad0()
                base = self._t_shape()
                if self.is_dg:
                    base = base[:-1]          # drop the local-dof axis
                cell_kw = dict(
                    cell_grid=(base[0] + cp,) + base[1:],
                    cell_pad0=cp,
                    cell_fields=tuple(sorted(self._TSPACE_FIELDS)),
                    cell_local_axis=self.is_dg)
            writer = ShardedSeriesWriter(
                f"{oc.output_dir}/sharded_series",
                fields=tuple(f for f in oc.npz_fields
                             if f in ViscoState._fields),
                grid=self.grid, pad0=self.pad0, **cell_kw)
        t0 = _time.time()
        t = 0.0
        done = 0
        ni_tot = ki_tot = 0
        while done < n_total:
            n = min(chunk, n_total - done)
            state, ok, ni, ki = self._multi_step_jit(state, n)
            if not bool(ok):
                raise RuntimeError(
                    f"Newton failed to converge in steps {done}..{done + n}")
            done += n
            t = done * self.dt
            ni_tot += int(ni)
            ki_tot += int(ki)
            if writer is not None:
                writer.write(t, state)
            ce = oc.checkpoint_every
            if ce and done % ce == 0:
                self.save_checkpoint(
                    f"{oc.output_dir}/sharded_ckpt_{done:06d}", state,
                    extra={"t": t, "done": done})
            if progress:
                print(f"t={t:.3f}")
        if writer is not None:
            writer.close()
        self.elapsed_seconds = _time.time() - t0
        self.newton_iters = ni_tot
        self.krylov_iters = ki_tot
        return state

    def save_checkpoint(self, out_dir: str, state: ViscoState,
                        extra: dict | None = None) -> None:
        from fem_glass_tempering_tpu.io.sharded import save_sharded_checkpoint
        save_sharded_checkpoint(out_dir, state, extra=extra)

    def load_checkpoint(self, out_dir: str) -> ViscoState:
        """Restore a sharded checkpoint directly onto this problem's mesh
        (per-shard piece reads, no host-global array)."""
        from fem_glass_tempering_tpu.io.sharded import load_sharded_checkpoint
        state, _ = load_sharded_checkpoint(
            out_dir, self._state_shardings, dtype=self.dtype)
        return state

    def gather_state(self, state: ViscoState) -> ViscoState:
        """Device-sharded grid state -> host flat-layout ViscoState for the
        shared writers / checkpointing."""
        host = jax.device_get(state)
        return self._to_flat(host)
