"""Dense direct linear solve for small/validation problems.

Stand-in for the reference's latent MUMPS configuration
(ThermoViscoProblem.py:345 sets pc_factor_mat_solver_type=mumps though the
active PC is gamg — SURVEY.md §2b): materialize the Jacobian column-by-column
via jvp (fine for the 1D validation meshes) and solve with LU. Useful to
cross-check the matrix-free CG path and for stiff configs where Krylov
iteration counts explode.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def materialize_jacobian(residual_fn: Callable, x: jnp.ndarray) -> jnp.ndarray:
    """Dense (n, n) Jacobian of residual_fn at x via batched jvp columns."""
    n = x.shape[0]
    eye = jnp.eye(n, dtype=x.dtype)
    return jax.vmap(lambda v: jax.jvp(residual_fn, (x,), (v,))[1])(eye).T


def newton_direct(residual_fn: Callable, x0: jnp.ndarray, *,
                  rtol: float = 1e-12, atol: float = 1e-10,
                  max_it: int = 50):
    """Newton with a dense LU inner solve. Returns (x, iters, converged)."""

    def cond(state):
        x, k, conv = state
        return (~conv) & (k < max_it)

    def body(state):
        x, k, _ = state
        F = residual_fn(x)
        J = materialize_jacobian(residual_fn, x)
        dx = jnp.linalg.solve(J, -F)
        x_new = x + dx
        conv = jnp.linalg.norm(dx) <= rtol * jnp.linalg.norm(x_new) + atol
        return x_new, k + 1, conv

    x, k, conv = jax.lax.while_loop(
        cond, body, (jnp.asarray(x0), jnp.int32(0), jnp.bool_(False)))
    return x, k, conv
