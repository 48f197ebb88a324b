"""Matrix-free Newton with the 'incremental' convergence criterion.

TPU-native replacement for dolfinx's C++ NewtonSolver
(reference ThermoViscoProblem.py:334-337: criterion "incremental",
rtol 1e-12): a lax.while_loop whose body assembles the residual, solves
J dx = -F with Jacobi-preconditioned CG (J action via jax.jvp — the UFL-AD
Jacobian derivation becomes JAX AD), applies a full step, and declares
convergence when ||dx|| <= rtol * ||x|| + atol.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from fem_glass_tempering_tpu.solver.krylov import pcg


class NewtonResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    converged: jnp.ndarray
    increment_norm: jnp.ndarray
    krylov_iters: jnp.ndarray  # total CG iterations across Newton steps


def newton_solve(residual_fn: Callable, x0: jnp.ndarray, *,
                 jac_diag_fn: Callable | None = None,
                 rtol: float = 1e-12, atol: float = 1e-10, max_it: int = 50,
                 cg_rtol: float = 1e-12, cg_atol: float = 0.0,
                 cg_max_it: int = 1000,
                 dot: Callable | None = None,
                 precond_fn: Callable | None = None,
                 matvec_fn: Callable | None = None,
                 cg_cast=None,
                 cg_replace_every: int | None = None,
                 cg_accept_rtol: float | None = None,
                 cg_stall_window: int | None = None,
                 mp_floor_inc_rtol: float | None = None,
                 inc_forcing: float = 0.0,
                 inc_diag: jnp.ndarray | None = None,
                 noise_fn: Callable | None = None) -> NewtonResult:
    """Solve residual_fn(x) = 0 starting from x0 (the previous step's
    solution, as in the reference where T_current seeds each solve).
    `dot` overrides the inner product for distributed (shard_map) use.
    `precond_fn(x)` builds a general preconditioner apply at the current
    iterate (takes precedence over jac_diag_fn). `matvec_fn(x)` builds the
    Jacobian action at the current iterate (e.g. an assembled ELL SpMV,
    ops/spmv.py) instead of the default jax.jvp of the residual.

    `cg_cast` (e.g. jnp.float32) runs the inner CG in that dtype while the
    residual, update, and the incremental convergence test stay in x's
    dtype — mixed-precision inexact Newton. TPUs have no native f64
    (SURVEY.md §7 'hard parts'), so an f64 x / f32 CG split recovers f64
    Newton accuracy at f32 Krylov speed: the RHS is normalized before the
    cast (the inner solve is scale-free), and the inexact increment only
    costs O(1) extra Newton iterations since its relative error is bounded
    by the f32 CG tolerance, not by ||F||. matvec_fn/jac_diag_fn/
    precond_fn must then produce cg_cast-dtype operators.

    `cg_accept_rtol` accepts a Newton increment whose inner solve missed
    cg_rtol but still achieved a residual reduction ||r||/||b|| below this
    threshold — standard inexact Newton (Eisenstat–Walker): ANY forcing
    term eta < 1 contracts the outer iteration by ~eta per step. This is
    what makes mixed precision live with operators whose f32 evaluation
    noise floors the attainable linear residual ABOVE cg_rtol (the f32
    SIPG matvec floors at ~8e-4 relative on anisotropic plates, measured
    — strict rejection then starves Newton at the full cg_max_it cost per
    iteration). Solves worse than the threshold are still rejected (the
    garbage-dx protection below). None = auto: 0.1 under cg_cast, else
    strict. `cg_stall_window` is pcg's stall exit (None = auto: 100 under
    cg_cast, else off).

    `mp_floor_inc_rtol` is the mixed-precision incremental floor: when the
    inner solve STALLS outright (no meaningful residual reduction — the
    remaining right-hand side lies in the cast-dtype operator's noise
    subspace, e.g. f32 SIPG penalty cancellation, measured: CG reduction
    0.999 after 100 V-cycles once ||F|| sinks to ~4e-5 of its initial
    value) AND the returned increment is already below this fraction of
    ||x||, the iterate is declared converged at the floor: no f32-Krylov
    process can move it further, and iterating forever just burns
    cg_max_it per Newton step. None = auto: 1e-6 (~16 eps32) under
    cg_cast, else off. Distinct from `noise_fn`, which floors on the
    RESIDUAL EVALUATION noise scale before solving.

    `inc_forcing` > 0 is the increment-relative inexact-Newton forcing:
    each inner solve runs at the LOOSEST relative tolerance whose
    increment error still stays below inc_forcing x the Newton acceptance
    threshold (rtol*||x|| + atol). The increment scale is predicted from
    the Jacobi diagonal (dx_pred = ||F / diag(J)||, available before the
    solve at one elementwise op), so
        eta_k = clip(inc_forcing * thr / dx_pred, cg_rtol, 0.5):
    never tighter than the configured cg_rtol, never so loose the
    returned dx is meaningless. Early hard solves (dx_pred >> thr) keep
    full tolerance; near-equilibrium steps — whose increments sit at or
    below the acceptance threshold the incremental criterion tests
    against (reference ThermoViscoProblem.py:334-337) — converge in a
    handful of inner iterations instead of chasing cg_rtol*||b|| on a
    right-hand side whose resolution the outer test cannot see. The
    accepted-iterate error is bounded by ~max_it * inc_forcing * thr
    (each iteration's increment error is <= inc_forcing of the
    acceptance threshold). The diagonal comes from `inc_diag` (a frozen
    per-step diagonal — it is a magnitude scale, not an operator, so
    once per step suffices and callers can reuse the noise-floor
    diagonal) or else from jac_diag_fn; silently off when neither is
    given.

    `noise_fn(x)` returns an absolute floor for ||F(x)|| below which the
    residual is indistinguishable from evaluation roundoff (e.g. the
    TPU-emulated-f64 noise of the stiffness/boundary terms). Once
    ||F|| <= noise_fn(x) the iterate is declared converged with dx = 0:
    solving J dx = -F against a pure-noise right-hand side near
    equilibrium otherwise drives the incremental test with noise and can
    destabilize the late transient (observed as NaNs at the emulation
    noise floor on TPU, BENCH.md)."""
    if dot is None:
        dot = jnp.vdot
    if cg_replace_every is None:
        # auto: in f32 the CG recurrence residual drifts from the true
        # residual on ill-conditioned systems (see pcg docstring); a
        # 50-iteration replacement window never triggers on healthy
        # MG-preconditioned solves (~10-50 iters) and bounds the drift
        # on the hard ones
        cg_replace_every = 50 if cg_cast is not None else 0
    if cg_accept_rtol is None:
        cg_accept_rtol = 0.1 if cg_cast is not None else 0.0
    if cg_stall_window is None:
        cg_stall_window = 100 if cg_cast is not None else 0
    if mp_floor_inc_rtol is None:
        mp_floor_inc_rtol = 1e-6 if cg_cast is not None else 0.0

    def norm(v):
        return jnp.sqrt(dot(v, v))

    def cond(state):
        x, k, converged, dxn, cg_total = state
        return (~converged) & (k < max_it)

    def body(state):
        x, k, converged, _, cg_total = state
        F = residual_fn(x)
        Fn = norm(F)
        if noise_fn is not None:
            at_floor = Fn <= noise_fn(x)
            # zero the RHS at the floor: CG exits at iteration 0 with
            # dx = 0 and converged=True, so the iterate is left untouched
            F = jnp.where(at_floor, jnp.zeros_like(F), F)
        else:
            at_floor = jnp.bool_(False)

        if matvec_fn is not None:
            matvec = matvec_fn(x)
        else:
            def matvec(v):
                return jax.jvp(residual_fn, (x,), (v,))[1]

        diag = jac_diag_fn(x) if jac_diag_fn is not None else None
        precond = precond_fn(x) if precond_fn is not None else None
        cg_rtol_k = cg_rtol
        pred_diag = inc_diag if inc_diag is not None else diag
        if inc_forcing and pred_diag is not None:
            # increment-relative forcing (docstring above): Jacobi-
            # predicted increment scale vs the incremental acceptance
            # threshold. Jacobi UNDERpredicts smooth increments, which
            # errs in the tighter (safe) direction.
            dxp = norm(F / pred_diag.astype(F.dtype))
            thr = rtol * norm(x) + atol
            tiny = jnp.asarray(jnp.finfo(F.dtype).tiny, F.dtype)
            cg_rtol_k = jnp.clip(inc_forcing * thr / jnp.maximum(dxp, tiny),
                                 cg_rtol, 0.5)
        if cg_cast is not None:
            scale = jnp.where((Fn == 0) | at_floor, 1.0, Fn)
            b = (-F / scale).astype(cg_cast)
            lin = pcg(matvec, b, diag=diag, rtol=cg_rtol_k, atol=cg_atol,
                      max_it=cg_max_it, dot=dot, precond=precond,
                      replace_every=cg_replace_every,
                      stall_window=cg_stall_window)
            dx = lin.x.astype(x.dtype) * scale
            bn = norm(b)
        else:
            lin = pcg(matvec, -F, diag=diag, rtol=cg_rtol_k, atol=cg_atol,
                      max_it=cg_max_it, dot=dot, precond=precond,
                      replace_every=cg_replace_every,
                      stall_window=cg_stall_window)
            dx = lin.x
            bn = Fn
        x_new = x + dx
        dxn = norm(dx)
        # the incremental test alone can be fooled by a FAILED linear
        # solve: a garbage dx inflates ||x_new|| and with it the
        # acceptance threshold (observed: a diverging f32 DG run sailed
        # through with T ~ 1e11 'converged'). Demand the inner CG
        # actually met its tolerance — failures then surface as
        # non-convergence and reach the dt-halving retry machinery
        # instead of silently corrupting the state.
        solve_ok = lin.converged
        if cg_accept_rtol:
            # inexact-Newton acceptance: the achieved reduction is a valid
            # forcing term; reductions worse than the threshold stay
            # rejected (failed-solve protection above)
            solve_ok = solve_ok | (lin.residual_norm <= cg_accept_rtol * bn)
        xn_new = norm(x_new)
        conv = at_floor | ((dxn <= rtol * xn_new + atol) & solve_ok)
        if mp_floor_inc_rtol:
            # mixed-precision floor: the solve went NOWHERE (residual
            # reduction worse than 0.5 — the RHS is invisible to the cast
            # operator) and the increment is sub-resolvable. A merely-hard
            # early-transient solve never matches: its dx/||x|| is far
            # above the floor threshold.
            stalled = (~lin.converged) & (lin.residual_norm >= 0.5 * bn)
            conv = conv | (stalled & (dxn <= mp_floor_inc_rtol * xn_new))
        return x_new, k + 1, conv, dxn, cg_total + lin.iters

    x0 = jnp.asarray(x0)
    init = (x0, jnp.int32(0), jnp.bool_(False), jnp.asarray(jnp.inf, x0.dtype),
            jnp.int32(0))
    x, k, converged, dxn, cg_total = jax.lax.while_loop(cond, body, init)
    return NewtonResult(x=x, iters=k, converged=converged,
                        increment_norm=dxn, krylov_iters=cg_total)
