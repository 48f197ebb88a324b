"""Pallas TPU kernel for the 27-point variable-coefficient stencil matvec.

The hot op of the whole framework: every CG iteration applies
y_i = sum_o vals[o]_i * x_{i+offset_o} over the node grid. The XLA
pad+27-slice formulation reaches ~1/3 of HBM peak at 1M dofs (0.42-0.52
ms measured on v5e; the roofline for the 115 MB value table is ~0.15 ms).
This kernel closes the gap with explicit blocking:

- the grid is flattened to (gx, gy*gz): every lattice offset (dx,dy,dz)
  becomes a row shift dx plus a FLAT column shift dy*gz+dz. Wrapped
  entries at y/z edges read the neighboring row's cells — harmless,
  because the assembled stencil VALUES are exactly zero wherever the
  lattice neighbor does not exist (nothing was ever assembled there),
  so garbage reads multiply by zero. This is what makes the flat layout
  legal and keeps the minor dimension large (lane-friendly).
- the value table (27, gx, M) streams through VMEM in x-blocks via the
  BlockSpec pipeline (the dominant traffic, perfectly sequential);
- the halo'd solution window rides along manually (one small DMA per
  block from ANY/HBM memory space, pl.ds dynamic slicing).

Used by GridHeatOperator.make_matvec when enabled (config use_pallas) on
the TPU backend; the XLA formulation remains the portable fallback and
the correctness oracle (tests compare the two to fp tolerance).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shifts(d: int, minor_sizes: tuple) -> list:
    """(row_shift, flat_col_shift) per lattice offset, lexicographic to
    match StencilMatrix's value ordering. minor_sizes = grid[1:]."""
    out = []
    for off in np.ndindex(*([3] * d)):
        dx = int(off[0])
        s = 0
        for a in range(1, d):
            s = s * minor_sizes[a - 1] + (int(off[a]) - 1)
        # note: iteratively s*size + delta accumulates sum(delta_a * prod
        # of later sizes) — the flat shift in the merged minor axis
        out.append((dx, s))
    return out


@functools.partial(jax.jit,
                   static_argnames=("grid_shape", "block_x", "interpret"))
def stencil_matvec_pallas(vals: jnp.ndarray, x: jnp.ndarray,
                          grid_shape: tuple, block_x: int = 8,
                          interpret: bool = False) -> jnp.ndarray:
    """y = A x for stencil values `vals` (n_off, *grid_shape) and a flat
    or grid-shaped x; returns flat (n,). float32, TPU."""
    d = len(grid_shape)
    gx = grid_shape[0]
    M = int(np.prod(grid_shape[1:])) if d > 1 else 1
    n_off = vals.shape[0]
    minor = grid_shape[1:]
    if d == 1:
        # 1D: tiny problems — fall back to the XLA path shape handling
        raise ValueError("pallas stencil requires d >= 2")
    shifts = _shifts(d, minor)
    P = max(abs(s) for _, s in shifts)

    v2 = vals.reshape(n_off, gx, M)
    x2 = x.reshape(gx, M)

    BX = int(block_x)
    assert BX % 8 == 0, "block_x must be sublane-aligned (multiple of 8)"
    gxp = -(-gx // BX) * BX                   # gx rounded up to BX
    pad_rows = gxp - gx
    # halo'd solution window. The HBM->VMEM DMA window must be
    # sublane-aligned (multiple of 8 rows for f32), so read BX+8 rows
    # (1 halo row above, BX rows, 7 spare below) — spare rows multiply
    # zero-padded values.
    W = BX + 8
    # lanes of the DMA'd window must be 128-aligned too
    LP = -(-(M + 2 * P) // 128) * 128
    xp = jnp.pad(x2, ((1, 7 + pad_rows), (P, LP - M - P)))
    v2 = jnp.pad(v2, ((0, 0), (0, pad_rows), (0, 0)))
    n_blocks = gxp // BX

    def kernel(x_hbm, v_ref, o_ref, xw, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * BX, W)], xw, sem)
        cp.start()
        cp.wait()
        # load the halo window as a VALUE: Mosaic cannot slice a tiled
        # VMEM ref at arbitrary lane offsets, but value slices lower to
        # in-register rotates
        xv = xw[:, :]
        acc = jnp.zeros((BX, M), dtype=o_ref.dtype)
        for o, (dx, s) in enumerate(shifts):
            win = jax.lax.slice(xv, (dx, P + s), (dx + BX, P + s + M))
            acc = acc + v_ref[o] * win
        o_ref[:, :] = acc

    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((n_off, BX, M), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BX, M), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gxp, M), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((W, LP), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, v2)
    return out[:gx].reshape(-1)
