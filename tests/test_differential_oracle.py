"""Differential parity vs the independent numpy/scipy oracle.

The oracle (validation/oracle_1d.py) is a from-scratch second
implementation of the reference's algorithm — hand-integrated sparse
matrices, assembled-Jacobian Newton + scipy direct solves, plain-numpy
material cascade — sharing no assembly/solver/material code with the
framework. Agreement over the full 500-step default transient replaces
the dolfinx differential (BASELINE.md) in this environment, where the
dolfinx stack cannot be installed, and breaks the circularity of
self-anchored golden values.

Measured agreement (f64): T ~1e-14, Tf ~1e-15, sigma ~5e-12 rel L2 —
four-plus orders below the 1e-6 L2 north-star.
"""

import numpy as np
import pytest

from fem_glass_tempering_tpu.fem.mesh import reference_glass_mesh_1d
from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem
from fem_glass_tempering_tpu.validation.oracle_1d import run_oracle


def _rel(a, b):
    return np.linalg.norm(a - b) / np.linalg.norm(b)


def _strict_solver(prob):
    """Pin the exact-solve chain (newton_inc_forcing=0): the differential
    gates below are trajectory-level (1e-12 over 500 steps), tighter than
    the reference's own per-step acceptance threshold, and only the
    solve-every-system-to-machine-tolerance chain reproduces the oracle
    at that level."""
    import dataclasses

    prob.config = dataclasses.replace(
        prob.config, solver=dataclasses.replace(
            prob.config.solver, newton_inc_forcing=0.0))


@pytest.mark.parametrize("family", ["DG", "CG"])
def test_full_transient_differential(family):
    """Full default workload (500 steps, t in [0,50], dt=0.1) on the graded
    glass mesh: framework vs oracle, both discretizing the reference's
    weak form (ThermoViscoProblem.py:293-326) and cascade (:367-595)."""
    mesh = reference_glass_mesh_1d()
    fe = {"T": {"element": family, "degree": 1},
          "sigma": {"element": "CG", "degree": 1}}
    prob = ThermoViscoProblem(mesh=mesh, config=fe, time=(0.0, 50.0), dt=0.1)
    _strict_solver(prob)
    prob.setup(dirichlet_bc=False)
    st = prob.solve()

    o = run_oracle(mesh.nodes[:, 0], 500, 0.1, T_family=family)
    assert _rel(np.asarray(st.T), o["T"]) < 1e-12
    assert _rel(np.asarray(st.Tf), o["Tf"]) < 1e-12
    assert _rel(np.asarray(st.sigma)[:, 0, 0], o["sigma"]) < 1e-9


def test_full_transient_differential_default_forcing():
    """The DEFAULT solver chain (increment-relative forcing auto = 0.05,
    SolverConfig.newton_inc_forcing) on the same 500-step workload: each
    accepted step's solve error is bounded by 5% of the Newton acceptance
    threshold (rtol*||T|| + atol — the same envelope the reference's
    incremental criterion accepts, ThermoViscoProblem.py:334-337), so the
    accumulated drift vs the oracle must stay within one order of that
    per-step envelope while the inner-CG total is cut ~2x (measured:
    12,008 -> 5,962 iterations, drift 1.2e-12 rel)."""
    mesh = reference_glass_mesh_1d()
    fe = {"T": {"element": "DG", "degree": 1},
          "sigma": {"element": "CG", "degree": 1}}
    prob = ThermoViscoProblem(mesh=mesh, config=fe, time=(0.0, 50.0), dt=0.1)
    prob.setup(dirichlet_bc=False)
    st = prob.solve()

    o = run_oracle(mesh.nodes[:, 0], 500, 0.1, T_family="DG")
    assert _rel(np.asarray(st.T), o["T"]) < 1e-11
    assert _rel(np.asarray(st.Tf), o["Tf"]) < 1e-12
    assert _rel(np.asarray(st.sigma)[:, 0, 0], o["sigma"]) < 1e-9
    assert prob.diagnostics.krylov_iters < 0.7 * 12_008


def test_literal_fp_mode_quantifies_reference_roundoff():
    """The reference computes the eq. 15 factor literally as
    (lam/xi)(1 - texp(xi/lam)) (ViscoelasticModel.py:180-201), which
    cancels catastrophically as xi -> 0 near equilibrium: its own sigma
    output carries ~10% relative fp noise late in the run. The oracle's
    literal_fp mode reproduces that; this pins the measurement so the
    BENCH.md parity claim ('sigma parity is limited by the reference's
    own roundoff') stays evidenced."""
    mesh = reference_glass_mesh_1d()
    nodes = mesh.nodes[:, 0]
    stable = run_oracle(nodes, 500, 0.1)
    literal = run_oracle(nodes, 500, 0.1, literal_fp=True)
    noise = _rel(literal["sigma"], stable["sigma"])
    assert 1e-3 < noise < 1.0  # the literal form is genuinely noisy...
    # ...but identical where it matters analytically: T/Tf are untouched
    assert _rel(literal["T"], stable["T"]) == 0.0
    assert _rel(literal["Tf"], stable["Tf"]) == 0.0


def test_oracle_confirms_golden_anchors():
    """The golden-regression constants in test_problem_e2e.py were pinned
    from the framework itself in round 1 (self-anchored); the oracle now
    reproduces them independently."""
    mesh = reference_glass_mesh_1d()
    o = run_oracle(mesh.nodes[:, 0], 500, 0.1)
    x = o["x_T"]
    assert o["T"][np.argmin(x)] == pytest.approx(644.5809518419135, rel=1e-10)
    assert o["T"][np.argmin(np.abs(x - 25.0))] == pytest.approx(
        797.5500316300408, rel=1e-10)
    assert o["Tf"][np.argmin(x)] == pytest.approx(799.8808751898703, rel=1e-10)
    assert float(np.linalg.norm(o["sigma"])) == pytest.approx(
        0.00013725924857443605, rel=1e-9)


@pytest.mark.slow
@pytest.mark.parametrize("family", ["CG", "DG"])
def test_framework_matches_3d_oracle(family):
    """3D differential anchor (VERDICT r4 missing #2): the coupled
    framework transient on a small 3D box matches the independent
    scipy/numpy oracle (validation/oracle_3d.py — Kronecker closed-form
    CG assembly, explicit sparse SIPG, assembled-Jacobian Newton + direct
    solves, literal material chain with live deviatoric branch) for BOTH
    elements. T/Tf to ~1e-13; sigma/xi to ~1e-9 — their comparison is
    amplified by the xi cancellation (xi = dt/2*(phi_next - phi), a tiny
    difference of near-equal exponentials), the same fp-noise mechanism
    test_literal_fp_eq15_noise_floor pins in 1D."""
    from fem_glass_tempering_tpu.config import (
        FEConfig, OutputConfig, RunConfig, SolverConfig, TimeConfig,
    )
    from fem_glass_tempering_tpu.fem.mesh import box_mesh_3d
    from fem_glass_tempering_tpu.models.problem import ThermoViscoProblem
    from fem_glass_tempering_tpu.validation.oracle_3d import run_oracle_3d

    dims, lengths = (4, 3, 2), (1.0, 0.8, 0.05)
    steps = 10
    cfg = RunConfig(
        fe=FEConfig(T_family=family, T_degree=1,
                    sigma_family="CG", sigma_degree=1),
        time=TimeConfig(0.0, steps * 0.1, 0.1),
        solver=SolverConfig(newton_rtol=1e-13, newton_atol=1e-14,
                            cg_rtol=1e-13, cg_max_it=3000,
                            jac_lag="newton"),
        output=OutputConfig(write_every=0, formats=()),
        dtype="float64")
    prob = ThermoViscoProblem(mesh=box_mesh_3d(*dims, *lengths), config=cfg)
    prob.setup()
    st = prob.solve()
    o = run_oracle_3d(dims, lengths, steps, 0.1, T_family=family)
    assert _rel(np.asarray(st.T), o["T"]) < 1e-12
    assert _rel(np.asarray(st.Tf), o["Tf"]) < 1e-12
    assert _rel(np.asarray(st.phi), o["phi"]) < 1e-10
    assert _rel(np.asarray(st.xi), o["xi"]) < 3e-9
    assert _rel(np.asarray(st.sigma), o["sigma"]) < 3e-9
