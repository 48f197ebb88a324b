"""Hand-fused Pallas TPU kernels for the hot per-point/per-cell ops.

Two kernels (each with a jnp reference path used for testing and as CPU
fallback):

1. material_tspace_pallas — the T-space Tool-Narayanaswamy chain
   (shift function, 6-term partial fictive temperature recursion, weighted
   fictive temperature, linear T predictor, scaled time) as ONE VPU kernel
   over (rows, 128) blocks. The reference runs this as ~6 separate
   interpolated Expressions per step (ThermoViscoProblem.py:455-545); XLA
   fuses our jnp version into a few kernels; this removes the remaining
   HBM round-trips between them. The 6-term Prony tableau is unrolled with
   the tableau constants baked into the kernel as compile-time scalars.

2. dg_cell_residual_pallas — the DG heat-equation cell-term residual
   (mass + diffusion + source) fused gather->quadrature->store. With DG
   dofs cell-contiguous, scatter is a reshape, so the whole term is one
   pallas_call over cell blocks; a custom_jvp makes it differentiable for
   the Newton matvec (the kernel is linear in T and T_prev).

Layout notes (pallas_guide.md): f32 min tile (8, 128); 1D dof vectors are
padded to rows*128 and viewed as (rows, 128); block = (BLOCK_ROWS, 128).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

BLOCK_ROWS = 64
LANES = 128


def _pad_rows(n: int) -> int:
    per_block = BLOCK_ROWS * LANES
    return ((n + per_block - 1) // per_block) * per_block


# ======================================================================
# 1. fused T-space material chain
# ======================================================================

def material_tspace_reference(T, T_prev, Tf_partial_prev, *, dt, H_over_Rg,
                              Tb, m_n, lambda_m_n):
    """jnp reference of the fused chain; returns (phi, Tf_partial, Tf, xi)."""
    phi = jnp.exp(H_over_Rg * (1.0 / Tb - 1.0 / T))
    Tf_partial = (
        lambda_m_n[None, :] * Tf_partial_prev + (T * dt * phi)[:, None]
    ) / (lambda_m_n[None, :] + (dt * phi)[:, None])
    Tf = Tf_partial @ m_n
    T_next = 2.0 * T - T_prev
    phi_next = jnp.exp(H_over_Rg * (1.0 / Tb - 1.0 / T_next))
    xi = 0.5 * dt * (phi_next - phi)
    return phi, Tf_partial, Tf, xi


def _material_kernel(T_ref, Tp_ref, Tfp_ref, phi_ref, Tfp_out_ref, Tf_ref,
                     xi_ref, *, dt, H_over_Rg, Tb, m_n, lambda_m_n):
    T = T_ref[:]
    Tp = Tp_ref[:]
    phi = jnp.exp(H_over_Rg * (1.0 / Tb - 1.0 / T))
    dtphi = dt * phi
    Tdtphi = T * dtphi
    Tf = jnp.zeros_like(T)
    # 6-term tableau unrolled with baked scalar constants
    for n in range(len(m_n)):
        lam = lambda_m_n[n]
        tfp = (lam * Tfp_ref[n] + Tdtphi) / (lam + dtphi)
        Tfp_out_ref[n] = tfp
        Tf = Tf + m_n[n] * tfp
    T_next = 2.0 * T - Tp
    phi_next = jnp.exp(H_over_Rg * (1.0 / Tb - 1.0 / T_next))
    phi_ref[:] = phi
    Tf_ref[:] = Tf
    xi_ref[:] = 0.5 * dt * (phi_next - phi)


def material_tspace_pallas(T, T_prev, Tf_partial_prev, *, dt, H_over_Rg,
                           Tb, m_n, lambda_m_n, interpret: bool = False):
    """Fused chain via pallas_call. Shapes: T (n,), Tf_partial_prev (n, 6).
    Returns (phi (n,), Tf_partial (n, 6), Tf (n,), xi (n,))."""
    if not _HAS_PALLAS:
        return material_tspace_reference(
            T, T_prev, Tf_partial_prev, dt=dt, H_over_Rg=H_over_Rg, Tb=Tb,
            m_n=jnp.asarray(m_n), lambda_m_n=jnp.asarray(lambda_m_n))
    n = T.shape[0]
    nt = Tf_partial_prev.shape[1]
    N = _pad_rows(n)
    rows = N // LANES
    dtype = T.dtype

    def pad2(x):
        return jnp.pad(x, (0, N - n), constant_values=1.0).reshape(rows, LANES)

    Tp2 = pad2(T)
    Tpp2 = pad2(T_prev)
    # tableau-major layout (6, rows, 128)
    Tfp2 = jnp.pad(Tf_partial_prev.T, ((0, 0), (0, N - n)),
                   constant_values=1.0).reshape(nt, rows, LANES)

    kernel = partial(
        _material_kernel, dt=float(dt), H_over_Rg=float(H_over_Rg),
        Tb=float(Tb), m_n=tuple(float(v) for v in np.asarray(m_n)),
        lambda_m_n=tuple(float(v) for v in np.asarray(lambda_m_n)))

    grid = (rows // BLOCK_ROWS,)
    row_block = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    tab_block = pl.BlockSpec((nt, BLOCK_ROWS, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    phi2, Tfp_out2, Tf2, xi2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_block, row_block, tab_block],
        out_specs=[row_block, tab_block, row_block, row_block],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), dtype),
            jax.ShapeDtypeStruct((nt, rows, LANES), dtype),
            jax.ShapeDtypeStruct((rows, LANES), dtype),
            jax.ShapeDtypeStruct((rows, LANES), dtype),
        ],
        interpret=interpret,
    )(Tp2, Tpp2, Tfp2)
    phi = phi2.reshape(-1)[:n]
    Tf_partial = Tfp_out2.reshape(nt, -1)[:, :n].T
    Tf = Tf2.reshape(-1)[:n]
    xi = xi2.reshape(-1)[:n]
    return phi, Tf_partial, Tf, xi


# ======================================================================
# 2. DG cell residual (mass + diffusion + source), fused + linear custom_jvp
# ======================================================================

def _dg_cell_kernel(phiT_ref, Tc_ref, Tpc_ref, qw_ref, gphiT_ref, out_ref, *,
                    dt, alpha, f_src, nloc, gdim):
    """One block of cells: Tc (B, nloc) -> r (B, nloc).

    Fully unrolled over (nloc, gdim) — every op is a 2D (B, q) VPU
    elementwise/broadcast or a q-axis reduction, which Mosaic lowers
    directly (batched 4D dot_general does not). Layouts: phiT (nloc, q)
    replicated; gphiT (nloc, gdim, B, q) so slices are leading-dim indexed.
    """
    Tc = Tc_ref[:]                       # (B, l)
    Tpc = Tpc_ref[:]
    qw = qw_ref[:]                       # (B, q)
    phiT = phiT_ref[:]                   # (l, q)
    # Tq[b,q] = sum_l Tc[b,l] phi[q,l] — unrolled broadcast products
    Tq = Tc[:, 0:1] * phiT[0:1, :]
    Tpq = Tpc[:, 0:1] * phiT[0:1, :]
    for l in range(1, nloc):
        Tq = Tq + Tc[:, l:l + 1] * phiT[l:l + 1, :]
        Tpq = Tpq + Tpc[:, l:l + 1] * phiT[l:l + 1, :]
    mass_src = qw * ((Tq - Tpq) - dt * f_src)                   # (B, q)
    # diffusion: coef_g = dt*alpha*qw * (sum_l Tc_l gphi[l,g])
    coefs = []
    for g in range(gdim):
        gT = Tc[:, 0:1] * gphiT_ref[0, g]
        for l in range(1, nloc):
            gT = gT + Tc[:, l:l + 1] * gphiT_ref[l, g]
        coefs.append(dt * alpha * qw * gT)                      # (B, q)
    cols = []
    for l in range(nloc):
        acc = mass_src * phiT[l:l + 1, :]
        for g in range(gdim):
            acc = acc + coefs[g] * gphiT_ref[l, g]
        cols.append(jnp.sum(acc, axis=1, keepdims=True))        # (B, 1)
    out_ref[:] = jnp.concatenate(cols, axis=1)


def _dg_cell_residual_impl(Tc, Tpc, qw, gphi, *, phi_tab, dt, alpha, f_src,
                           block_cells, interpret):
    n_cells, nloc = Tc.shape
    q = qw.shape[1]
    g = gphi.shape[-1]
    B = block_cells
    n_pad = (-n_cells) % B
    # kernel layout: gphiT (nloc, gdim, cells, q) for leading-dim slicing
    gphiT = jnp.transpose(gphi, (2, 3, 0, 1))
    if n_pad:
        Tc = jnp.pad(Tc, ((0, n_pad), (0, 0)))
        Tpc = jnp.pad(Tpc, ((0, n_pad), (0, 0)))
        qw = jnp.pad(qw, ((0, n_pad), (0, 0)))
        gphiT = jnp.pad(gphiT, ((0, 0), (0, 0), (0, n_pad), (0, 0)))
    grid = ((n_cells + n_pad) // B,)
    kernel = partial(_dg_cell_kernel, dt=dt, alpha=alpha, f_src=f_src,
                     nloc=nloc, gdim=g)
    phiT_arr = jnp.asarray(phi_tab, dtype=Tc.dtype).T   # (nloc, q)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nloc, q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, nloc), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, nloc), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, q), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nloc, g, B, q), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, nloc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_cells + n_pad, nloc), Tc.dtype),
        interpret=interpret,
    )(phiT_arr, Tc, Tpc, qw, gphiT)
    return out[:n_cells]


def make_dg_cell_residual(phi_tab: np.ndarray, dt: float, alpha: float,
                          f_src: float, block_cells: int = 512,
                          interpret: bool = False):
    """Returns r(Tc, Tpc, qw, gphi) -> (n_cells, nloc), differentiable
    (linear in Tc/Tpc, so the custom JVP reuses the same kernel)."""
    phi_tab = tuple(map(tuple, np.asarray(phi_tab)))

    impl = partial(_dg_cell_residual_impl, phi_tab=phi_tab, dt=float(dt),
                   alpha=float(alpha), f_src=float(f_src),
                   block_cells=block_cells, interpret=interpret)

    @jax.custom_jvp
    def residual(Tc, Tpc, qw, gphi):
        return impl(Tc, Tpc, qw, gphi)

    @residual.defjvp
    def _jvp(primals, tangents):
        Tc, Tpc, qw, gphi = primals
        dTc, dTpc, _, _ = tangents
        y = impl(Tc, Tpc, qw, gphi)
        # linear in (Tc, Tpc) with f_src contributing only to the primal:
        # evaluate the same kernel on tangents with f_src's effect removed
        # by subtracting the zero-input response.
        dy = impl(dTc, dTpc, qw, gphi)
        if f_src != 0.0:
            z = jnp.zeros_like(Tc)
            dy = dy - impl(z, z, qw, gphi)
        return y, dy

    return residual
