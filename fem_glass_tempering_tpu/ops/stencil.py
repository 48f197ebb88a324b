"""Stencil matvec for CG-1 on structured box meshes: the TPU-native SpMV.

Measured on TPU v5e (see BENCH.md): an ELL gather x[cols] of (9801, 27)
costs ~1.9 ms — two orders of magnitude over the CG-loop floor (~120 us),
because XLA lowers irregular gathers poorly on TPU. On a structured grid
the Jacobian is a (3^d)-point stencil, so the matvec needs NO gather at
all: J x = sum_o vals[o] * shift(x, o) with static pad+slice shifts —
pure VPU streaming.

Construction: reuse EllMatrix's assembled values; map each (row, col) pair
to its lattice offset and lay values out as (3^d, *grid). The constant
mass/stiffness parts are laid out once at setup (numpy); the per-Newton
boundary linearization is scattered into a small precomputed index set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fem_glass_tempering_tpu.ops.heat import HeatOperator
from fem_glass_tempering_tpu.ops.spmv import EllMatrix


class StencilMatrix:
    def __init__(self, op: HeatOperator):
        fs = op.fs
        mesh = fs.mesh
        if mesh.structured is None or fs.family != "CG" or fs.degree != 1:
            raise ValueError("StencilMatrix needs a structured box mesh "
                             "with a CG-1 space")
        self.op = op
        dims = tuple(mesh.structured["dims"])
        d = len(dims)
        self.grid = tuple(n + 1 for n in dims)
        n = fs.n_scalar_dofs
        assert int(np.prod(self.grid)) == n

        # lattice offsets, lexicographic: index o = sum((delta_i+1)*3^pos)
        deltas = [(-1, 0, 1)] * d
        self.offsets = [off for off in np.ndindex(*([3] * d))]
        self.n_off = 3 ** d
        strides = np.array([int(np.prod(self.grid[i + 1:])) for i in range(d)])

        ell = EllMatrix(op)
        cols = np.asarray(ell.cols)          # (n, K)
        K = ell.K

        def multi(idx):
            out = []
            for s in strides:
                out.append(idx // s)
                idx = idx % s
            return np.stack(out, axis=-1)

        rows_m = multi(np.arange(n)[:, None] * np.ones((1, K), dtype=np.int64))
        cols_m = multi(cols.astype(np.int64))
        delta = cols_m - rows_m + 1          # in [0, 2]
        # column-0 padding slots of ELL may produce out-of-range deltas;
        # their values are zero, route them to a dump slot
        valid = np.all((delta >= 0) & (delta <= 2), axis=-1)
        o_map = np.zeros((n, K), dtype=np.int64)
        for i in range(d):
            o_map = o_map * 3 + delta[..., i].clip(0, 2)
        o_map = np.where(valid, o_map, self.n_off)    # dump slot

        # flat index into (n_off+1, n)
        flat = o_map * n + np.arange(n)[:, None]

        vals_mass = np.zeros((self.n_off + 1) * n)
        vals_stiff = np.zeros((self.n_off + 1) * n)
        np.add.at(vals_mass, flat.reshape(-1),
                  np.asarray(ell.vals_mass).reshape(-1))
        np.add.at(vals_stiff, flat.reshape(-1),
                  np.asarray(ell.vals_stiff).reshape(-1))
        dtype = op.dtype
        self.st_mass = jnp.asarray(
            vals_mass[: self.n_off * n].reshape((self.n_off,) + self.grid),
            dtype=dtype)
        self.st_stiff = jnp.asarray(
            vals_stiff[: self.n_off * n].reshape((self.n_off,) + self.grid),
            dtype=dtype)

        # boundary-block scatter positions into the stencil layout
        if ell.b_flat_idx is not None:
            b_rows = np.asarray(ell.b_flat_idx) // ell.K
            b_slots = np.asarray(ell.b_flat_idx) % ell.K
            b_o = o_map[b_rows, b_slots]
            self.b_st_idx = jnp.asarray(b_o * n + b_rows)
        else:
            self.b_st_idx = None
        self.n = n
        self.d = d

    # ------------------------------------------------------------------
    def values_at(self, T: jnp.ndarray, dt) -> jnp.ndarray:
        op = self.op
        p = op.params
        vals = self.st_mass + dt * self.st_stiff
        if self.b_st_idx is not None:
            Tb = jnp.einsum("fql,fl->fq", op.b_phi, T[op.b_dofmap])
            dflux = p.boundary_scale * (4.0 * p.sigma * p.epsilon * Tb**3 + p.htc)
            blocks = jnp.einsum("fq,fql,fqm->flm", op.b_qw * dt * dflux,
                                op.b_phi, op.b_phi)
            flat = jnp.concatenate(
                [vals.reshape(-1),
                 jnp.zeros((self.n,), vals.dtype)])  # dump slot
            flat = flat.at[self.b_st_idx].add(blocks.reshape(-1))
            vals = flat[: self.n_off * self.n].reshape(vals.shape)
        return vals

    def matvec(self, vals: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        xg = x.reshape(self.grid)
        xp = jnp.pad(xg, 1)
        acc = jnp.zeros(self.grid, dtype=x.dtype)
        for o, off in enumerate(self.offsets):
            start = tuple(int(v) for v in off)
            limit = tuple(s + g for s, g in zip(start, self.grid))
            acc = acc + vals[o] * jax.lax.slice(xp, start, limit)
        return acc.reshape(-1)

    def make_matvec(self, T: jnp.ndarray, dt):
        vals = self.values_at(T, dt)
        if self.op.has_bc:
            mask = self.op.bc_mask
            return lambda v: jnp.where(
                mask, v, self.matvec(vals, jnp.where(mask, 0.0, v)))
        return lambda v: self.matvec(vals, v)
