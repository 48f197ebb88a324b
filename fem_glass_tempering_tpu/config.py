"""Typed configuration for the tempering solver.

Replaces the plain dicts of the reference driver (reference main.py:6-55)
with validated dataclasses, and adds the knobs the reference README promised
but never shipped (problem_dim, parallel) plus ours (dtype, physics_mode,
output cadence, checkpointing).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


_VALID_FAMILIES = ("CG", "DG")


@dataclass(frozen=True)
class FEConfig:
    """Finite-element choice per field (reference main.py:24-27).

    family: 'CG' (continuous Lagrange) or 'DG' (discontinuous Lagrange;
    the heat equation then gets SIPG interior-penalty facet terms,
    reference ThermoViscoProblem.py:308-326).
    """

    T_family: str = "DG"
    T_degree: int = 1
    sigma_family: str = "CG"
    sigma_degree: int = 1
    # override the automatic quadrature degree (cell: 2p+1, boundary: 5p
    # for the T^4 radiation integrand); None = automatic
    quad_degree: int | None = None

    def __post_init__(self) -> None:
        for fam in (self.T_family, self.sigma_family):
            if fam not in _VALID_FAMILIES:
                raise ValueError(
                    f"Only CG and DG elements are supported, got {fam!r}"
                )
        if self.T_degree < 1 or self.sigma_degree < 1:
            raise ValueError("element degree must be >= 1")


@dataclass(frozen=True)
class TimeConfig:
    """Time domain (reference main.py:11-16)."""

    t_start: float = 0.0
    t_end: float = 50.0
    dt: float = 0.1

    @property
    def n_steps(self) -> int:
        """ceil((t_end - t_start)/dt), with an epsilon so fp noise in
        t_end = n*dt round-trips to exactly n (the reference's bare ceil,
        ThermoViscoProblem.py-equivalent, would give n+1)."""
        import math

        return math.ceil((self.t_end - self.t_start) / self.dt - 1e-9)


@dataclass(frozen=True)
class ModelParams:
    """Physical parameters (reference main.py:29-55).

    Names match the reference's model_params dict. Note the reference's
    quirks, reproduced deliberately: rho/cp/k are carried but unused by the
    weak form (reference ThermoViscoProblem.py:293-306 uses alpha only), and
    the radiation/convection boundary terms carry a 0.001 scale factor.
    """

    f: float = 0.0            # volumetric heat source
    epsilon: float = 0.93     # radiative emissivity
    sigma: float = 5.670e-8   # Stefan-Boltzmann constant
    T_ambient: float = 600.0  # ambient temperature [K]
    T_0: float = 800.0        # initial temperature [K]
    alpha: float = 1.0        # diffusion coefficient in the weak form
    htc: float = 280.1        # convective heat transfer coefficient
    rho: float = 2500.0       # density (unused in form; parity with reference)
    cp: float = 1433.0        # specific heat (unused in form)
    k: float = 1.0            # conductivity (unused in form)
    H: float = 627.8e3        # activation energy [J/mol]
    Tb: float = 869.0         # base temperature [K]
    Rg: float = 8.314         # universal gas constant
    alpha_solid: float = 9.10e-6
    alpha_liquid: float = 25.10e-6
    Tf_init: float = 873.0    # carried for parity; ICs use T_0 (reference ThermoViscoProblem.py:179)
    chi: float = 0.5          # TN weighting (reference ViscoelasticModel.py:15)
    boundary_scale: float = 0.001  # the undocumented 0.001 factor (reference ThermoViscoProblem.py:302-304)
    dg_penalty: float = 5.0   # SIPG penalty (reference ThermoViscoProblem.py:313)


@dataclass(frozen=True)
class SolverConfig:
    """Newton-Krylov settings (reference ThermoViscoProblem.py:330-346)."""

    newton_rtol: float = 1e-12   # incremental criterion rtol (reference :336)
    newton_atol: float = 1e-10
    newton_max_it: int = 50
    cg_rtol: float = 1e-12
    cg_atol: float = 0.0
    cg_max_it: int = 10000       # PETSc's ksp_max_it default; the SIPG
    # system on anisotropic plates needs >1000 Jacobi-CG iterations
    # 'auto' (default) resolves at setup to the reference's always-GAMG
    # semantics (/root/reference/ThermoViscoProblem.py:344): geometric MG /
    # DG p-MG on structured box meshes with a degree-1 T space, smoothed-
    # aggregation AMG everywhere else. Explicit values override.
    preconditioner: str = "auto"  # 'auto' | 'jacobi' | 'mg' | 'amg' | 'none'
    mg_smoother: str = "jacobi"     # 'jacobi' | 'chebyshev' (GAMG-style)
    # pre/post smoothing sweeps per V-cycle level. Fine-level sweeps are
    # the V-cycle's HBM traffic: each costs ~a stencil-matvec at 1M dofs,
    # so V(1,1) is ~40% less traffic per MG-CG iteration than V(2,2) and
    # wins wall-clock whenever the iteration count holds within ~1.6x.
    mg_nu_pre: int = 2
    mg_nu_post: int = 2
    # cap on the geometric-MG hierarchy depth (0 = coarsen to the floor).
    # The small tail levels are kernel-launch-bound on TPU; a shallower
    # hierarchy pairs with mg_coarse='dense' (solver/multigrid.py).
    mg_max_levels: int = 0
    # coarsest-level solve: 'auto' (default) stops coarsening at the
    # first level <= 4096 nodes and solves it EXACTLY with a frozen
    # dense inverse (one MXU matvec) — measured at 1M dofs: 13.0 CG
    # iters/step vs 45.5 for the deep smooth-coarse hierarchy;
    # 'smooth' = fixed Chebyshev/Jacobi sweeps at the full-depth floor;
    # 'dense' = dense inverse at an explicit mg_max_levels cap
    mg_coarse: str = "auto"
    # dtype the V-cycle's per-level stencil tables STREAM in: 'same'
    # keeps the cycle dtype; 'bfloat16' halves the dominant HBM traffic
    # of the MG-preconditioned CG iteration (the fine-level value tables
    # are ~115 MB/apply at 1M dofs) at ~3 significant digits of operator
    # accuracy — a preconditioner-only perturbation: the CG system
    # matvec, residuals, transfers, diagonals and the dense coarse solve
    # keep the cycle dtype. Vectors stay in cycle dtype throughout.
    mg_table_dtype: str = "same"    # 'same' | 'bfloat16'
    # DG-level smoother for the DG-1 p-multigrid (solver/multigrid.py):
    # 'auto' picks 'column' (block-tridiagonal line solve along the
    # strongly coupled axis) on anisotropic plates, 'block' otherwise;
    # explicit 'jacobi'/'chebyshev'/'block'/'column' override
    dg_smoother: str = "auto"
    # 'matrix_free' = jvp-of-residual matvec (reassembles each CG iter);
    # 'assembled' = pre-assembled HBM-resident ELL SpMV (ops/spmv.py);
    # 'stencil' = gather-free lattice stencil on structured box meshes
    # (CG-1 nodal or DG block stencil, ops/stencil.py)
    linear_operator: str = "matrix_free"
    # gather-free grid-native residual/diagonal/Jacobian-update path for
    # CG-1 on uniform box meshes (ops/grid.py): 'auto' uses it whenever the
    # mesh/space qualify, 'on' requires it (raises otherwise), 'off' keeps
    # the gather/segment_sum assembly
    grid_native: str = "auto"
    # 'float32' with dtype='float64' runs the inner CG (matvec +
    # preconditioner) in f32 while residuals and the Newton incremental
    # test stay f64 — mixed-precision inexact Newton. TPUs have no native
    # f64; this recovers rtol-1e-12 Newton accuracy at f32 Krylov speed.
    cg_dtype: str = "same"          # 'same' | 'float32'
    # Residual noise floor, relative to the magnitude of the residual's
    # non-cancelling terms (stiffness + boundary, measured per Newton
    # iteration as ||residual(T, T, dt)||): once ||F|| drops below
    # newton_noise_rel * that scale, F is evaluation roundoff and the
    # iterate is declared converged with dx = 0. None = auto: 64 * 2^-49
    # (the TPU double-float emulation epsilon with headroom) when
    # cg_dtype='float32' under f64, else 0 (off). Set 0.0 to force off.
    # This is what lets the late near-equilibrium transient survive at
    # Newton rtol 1e-12 on TPU (BENCH.md noise-floor NaN).
    newton_noise_rel: float | None = None
    # Increment-relative inexact-Newton forcing for the heat chain
    # (solver/newton.py inc_forcing): each inner CG runs at the loosest
    # tolerance whose increment error stays below this fraction of the
    # incremental acceptance threshold rtol*||T||, with the increment
    # scale predicted from a once-per-step Jacobi diagonal. Early hard
    # solves keep full tolerance (the clip floor is cg_rtol); late
    # near-equilibrium steps stop over-resolving right-hand sides whose
    # accuracy the incremental test cannot see. None = auto (0.05);
    # 0.0 = off. Measured at rtol 1e-12: 16x16x8 3D 50-step transient
    # (CPU f64 MG) 546 -> 113 total CG iterations with a bitwise-
    # identical final field; the reference 500-step 1D workload
    # 12,008 -> 5,962 with 1.2e-12 rel drift vs the oracle (within the
    # acceptance-threshold envelope; the strict chain is 1.2e-14);
    # the 64x64x16 matched-tolerance TPU run 143 -> 88 CG (BENCH.md).
    # DG mixed precision is unaffected: its inner tolerance already
    # sits at the f32 SIPG noise floor (1e-4), which is also the
    # forcing's never-looser clip floor.
    newton_inc_forcing: float | None = None
    # Jacobian/preconditioner build cadence: "step" builds the frozen
    # Krylov operator + V-cycle ONCE per time step at the step's initial
    # temperature (the dominant per-Newton cost at 1M dofs — the 27-slot
    # value-table bake + 7-level preconditioner build measured 12.3 ms
    # per Newton iteration, profile r4); within-step temperature motion
    # perturbs only the boundary-flux rows by O(dT/T), far inside the
    # inexact-Newton forcing, and the convergence test always evaluates
    # the EXACT residual. "newton" rebuilds at every Newton iterate
    # (classic exact-Newton; the r3 behavior).
    jac_lag: str = "step"
    # With jac_lag="step": rebuild the frozen operator/preconditioner
    # every `jac_every` time steps inside the jitted multi-step loop
    # (1 = every step). The per-step build is ~13 ms of the 33.6 ms 1M
    # step (profile r4); over an early-transient window the temperature
    # moves ~1 K/step at ~800 K, so a few-step-stale boundary-flux
    # linearization stays far inside the inexact-Newton forcing.
    # "auto" (default) resolves by newton_rtol: 5 at loose tolerance
    # (throughput regime — measured 33.6 -> 26.3 ms/step at 1M, rtol
    # 1e-5), 1 at tight tolerance (newton_rtol <= 1e-10), where a
    # 5-step-stale Jacobian blows the solve up instead of amortizing it
    # (measured at rtol 1e-12, BENCH.md "jac_every tolerance
    # sensitivity": Newton 40 -> 65 iters, CG 42 -> 375 — the
    # modified-Newton linear-convergence tail dominates long before the
    # build is amortized). An explicit int overrides either way.
    jac_every: int | str = "auto"

    def resolved_jac_every(self) -> int:
        """Resolve jac_every='auto' by Newton tolerance (see field doc)."""
        je = self.jac_every
        if je == "auto":
            je = 1 if self.newton_rtol <= 1e-10 else 5
        return max(int(je), 1)
    # Equilibrium-mechanics elasticity solve: increment-relative CG
    # tolerance (pcg rtol_r0, solver/krylov.py). Each step's quasi-static
    # solve warm-starts from the previous displacement, so the residual
    # AT THE WARM START measures the step's CHANGE; reducing it by this
    # factor bounds the per-step solve error to that fraction of the
    # change (total drift <= factor * total variation) instead of
    # chasing a fixed fraction of ||b|| on every step. The fixed
    # mech tolerance stays in force as a never-tighter floor.
    # None = auto (0.01; measured on the full 500-step 32x32x8 quench,
    # CPU f64: 15,191 -> 5,333 total elasticity CG iterations vs the
    # fixed 1e-8 solve, final stress within 0.21% max / 0.044% on the
    # through-thickness profile — the tempering deliverable); 0.0 = off.
    # Cold solves (||r0|| not well under ||b||) keep full accuracy: the
    # relaxation is gated on the warm start being warm (solver/krylov.py).
    mech_inc_rtol: float | None = None
    # failure handling (the reference just aborts via assert,
    # ThermoViscoProblem.py:390): 'raise' | 'halve_dt' (retry the failed
    # chunk at dt/2 — same compiled program, dt is a traced scalar)
    on_failure: str = "raise"
    max_dt_halvings: int = 4


@dataclass(frozen=True)
class OutputConfig:
    """Output/checkpoint settings. The reference writes every step
    (ThermoViscoProblem.py:374); we make cadence configurable and add
    checkpoint/resume, which the reference lacks (SURVEY.md §5)."""

    output_dir: str = "output"
    write_every: int = 1          # steps between field snapshots (0 = off)
    formats: tuple = ("npz",)     # subset of ('npz', 'vtu', 'xdmf')
    checkpoint_every: int = 0      # steps between checkpoints (0 = off)
    # fields recorded by the npz series writer (any ViscoState field name;
    # the reference could not write Tf_partial at all — VTXWriter lacks
    # mixed-element support, ThermoViscoProblem.py:257-259)
    npz_fields: tuple = ("T", "Tf", "phi", "xi", "sigma")


@dataclass(frozen=True)
class RunConfig:
    """Top-level bundle."""

    fe: FEConfig = field(default_factory=FEConfig)
    time: TimeConfig = field(default_factory=TimeConfig)
    params: ModelParams = field(default_factory=ModelParams)
    solver: SolverConfig = field(default_factory=SolverConfig)
    output: OutputConfig = field(default_factory=OutputConfig)
    # 'reference' reproduces the reference's runtime semantics exactly,
    # including its dead-rotation quirks (see models/viscoelastic.py docstring);
    # 'corrected' uses the literature (Nielsen et al.) semantics.
    physics_mode: str = "reference"
    # 'eq5' Arrhenius (the reference's live definition) | 'eq25' chi-weighted TN
    shift_function: str = "eq5"
    # 'none' reproduces the reference (total strain = -thermal strain, no
    # force balance); 'equilibrium' solves quasi-static mechanical
    # equilibrium each step (models/mechanics.py) — self-equilibrated
    # residual stress, a capability the reference explicitly skips
    mechanics: str = "none"
    # 'reference': xi = dt/2 (phi_next - phi) as the reference codes eq. 19
    # (negative while cooling — no true relaxation; SURVEY.md §Quirks 4);
    # 'trapezoid': the physical dt/2 (phi_next + phi)
    xi_formula: str = "reference"
    # 'reference': the reference's non-dimensionalized heat form (mass 1,
    # diffusion alpha — rho/cp/k created but unused, SURVEY.md Quirks 6);
    # 'physical': the dimensional rho*cp / k equation (models/thermal.py)
    heat_form: str = "reference"
    # fp64 for parity runs, fp32 for TPU perf runs.
    dtype: str = "float64"
    # hand-fused Pallas kernels for the stencil matvec / pointwise chain.
    # "auto" (default): select by size — the hand-tiled kernel's
    # in-register lane rotates win below ~300k dofs (measured 0.010 vs
    # 0.023 ms at 72k) and TIE the XLA flat form at 1M (0.171 vs 0.171 ms
    # r4 A/B — both at the HBM roofline). True/False force it on/off.
    use_pallas: bool | str = "auto"

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(text: str) -> "RunConfig":
        raw: dict[str, Any] = json.loads(text)
        return RunConfig(
            fe=FEConfig(**raw.get("fe", {})),
            time=TimeConfig(**raw.get("time", {})),
            params=ModelParams(**raw.get("params", {})),
            solver=SolverConfig(**raw.get("solver", {})),
            output=OutputConfig(
                **{
                    k: tuple(v) if k in ("formats", "npz_fields") else v
                    for k, v in raw.get("output", {}).items()
                }
            ),
            physics_mode=raw.get("physics_mode", "reference"),
            shift_function=raw.get("shift_function", "eq5"),
            mechanics=raw.get("mechanics", "none"),
            xi_formula=raw.get("xi_formula", "reference"),
            dtype=raw.get("dtype", "float64"),
            use_pallas=raw.get("use_pallas", "auto"),
        )


def default_model_params() -> ModelParams:
    """The reference's default parameter set (reference main.py:29-55)."""
    return ModelParams()
