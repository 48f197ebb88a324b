"""Matrix-free preconditioned conjugate gradients as a lax.while_loop.

TPU-native replacement for PETSc's KSP CG (reference KSP config:
ThermoViscoProblem.py:339-346, ksp_type=cg). The operator is a closure
(typically a jax.jvp of the residual); the preconditioner is a diagonal
(Jacobi) vector — the GAMG stand-in per SURVEY.md §2b. Convergence follows
PETSc's default test ||r||_2 < max(rtol*||b||, atol).

On a sharded dof vector the dot products become jnp.vdot under pjit/shard_map
and XLA inserts psum collectives — the same reductions PETSc does over MPI
(SURVEY.md §5, communication pattern 2).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class PCGResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    converged: jnp.ndarray
    residual_norm: jnp.ndarray


def pcg(matvec: Callable, b: jnp.ndarray, *, x0: jnp.ndarray | None = None,
        diag: jnp.ndarray | None = None, rtol: float = 1e-12,
        atol: float = 0.0, max_it: int = 1000,
        dot: Callable | None = None,
        precond: Callable | None = None,
        replace_every: int = 0,
        stall_window: int = 0,
        rtol_r0: float = 0.0) -> PCGResult:
    """`dot` overrides the inner product — inside shard_map regions pass a
    psum-reduced dot so convergence tests are global (the PETSc/MPI
    reduction pattern, SURVEY.md §5 item 2). `precond` is a general SPD
    preconditioner apply r -> M^{-1} r (e.g. a multigrid V-cycle,
    solver/multigrid.py) and takes precedence over `diag` (Jacobi).

    `replace_every` > 0 recomputes the TRUE residual b - A x every that
    many iterations (van der Vorst-style residual replacement — the
    search direction is NOT restarted: the replacement delta is tiny
    relative to the current residual, so conjugacy and the beta recurrence
    survive, while a p-restart degrades CG to restarted steepest descent,
    measured 100x worse on a cond-1e3 system). In f32 the recurrence
    residual drifts from the true residual on ill-conditioned systems
    (measured on the 16x16x8 DG plate: recurrence 'converged' at 1e-6
    with a true relative residual of 8e-5); periodic replacement bounds
    the drift at the cost of one extra matvec per window. Healthy solves
    that converge in fewer iterations never pay it.

    `stall_window` > 0 tracks the best iterate seen and exits once the
    residual norm has not improved for that many iterations, returning the
    BEST iterate instead of the last. On systems whose attainable (true)
    residual floor sits above the requested tolerance — the f32 SIPG
    matvec floors at ~8e-4 relative on the 16x16x8 50:1 plate, measured —
    plain PCG burns the full max_it budget oscillating at the floor; the
    stall exit returns the floored solution in ~(floor iterations +
    window), and the caller decides whether the achieved reduction is
    usable (inexact Newton does: any reduction < 1 contracts)."""
    if dot is None:
        dot = jnp.vdot

    def norm(v):
        return jnp.sqrt(dot(v, v))

    x = jnp.zeros_like(b) if x0 is None else x0
    inv_diag = None if diag is None else 1.0 / diag

    def apply_M(r):
        if precond is not None:
            return precond(r)
        return r if inv_diag is None else inv_diag * r

    r = b - matvec(x)
    z = apply_M(r)
    p = z
    rz = dot(r, z)
    bnorm = norm(b)
    rnorm0 = norm(r)
    tol = jnp.maximum(rtol * bnorm, atol)
    if rtol_r0:
        # increment-relative test: reduce the residual AT THE WARM START
        # by rtol_r0 instead of chasing rtol*||b||. For a quasi-static
        # sequence solved with x0 = previous solution, ||r(x0)|| is the
        # step-increment scale, so the per-step solve error stays a fixed
        # fraction of each step's CHANGE (total drift <= rtol_r0 * total
        # variation) while late steps cost a handful of iterations. The
        # rtol*||b|| term acts as a floor: never solve TIGHTER than the
        # fixed-tolerance configuration would. Gated on the warm start
        # actually being warm (||r0|| well under ||b||): a cold solve's
        # "change" is the whole solution, and relaxing it would degrade
        # absolute accuracy — measured as 1.4e-3 spurious stress on a
        # uniform free contraction whose du solve IS the first step.
        warm = rnorm0 < 0.3 * bnorm
        tol = jnp.maximum(tol, jnp.where(warm, rtol_r0 * rnorm0, 0.0))
    use_best = stall_window > 0

    def cond(state):
        k, rnorm = state[5], state[6]
        ok = (rnorm > tol) & (k < max_it)
        if use_best:
            ok = ok & (k - state[9] < stall_window)
        return ok

    def body(state):
        if use_best:
            x, r, z, p, rz, k, _, bx, brn, kb = state
        else:
            x, r, z, p, rz, k, _ = state
        Ap = matvec(p)
        pAp = dot(p, Ap)
        alpha = rz / jnp.where(pAp == 0, 1.0, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        if replace_every:
            do = (k + 1) % replace_every == 0
            r = jax.lax.cond(do, lambda _: b - matvec(x),
                             lambda _: r, None)
        z = apply_M(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        rnorm = norm(r)
        if use_best:
            better = rnorm < brn
            bx = jnp.where(better, x, bx)
            kb = jnp.where(better, k + 1, kb)
            brn = jnp.minimum(rnorm, brn)
            return x, r, z, p, rz_new, k + 1, rnorm, bx, brn, kb
        return x, r, z, p, rz_new, k + 1, rnorm

    init = (x, r, z, p, rz, jnp.int32(0), rnorm0)
    if use_best:
        init = init + (x, rnorm0, jnp.int32(0))
    out = jax.lax.while_loop(cond, body, init)
    if use_best:
        x, rnorm = out[7], out[8]
    else:
        x, rnorm = out[0], out[6]
    k = out[5]
    return PCGResult(x=x, iters=k, converged=rnorm <= tol, residual_norm=rnorm)
