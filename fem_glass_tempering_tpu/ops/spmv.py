"""Assembled-Jacobian ELL SpMV path for the heat operator.

Matrix-free Newton-CG recomputes the full element assembly on every CG
iteration (jvp of the residual). For the heat Jacobian
  J(T) = M + dt*(alpha*K + SIPG) + dt*B'(T)
only the boundary linearization B'(T) changes between CG solves, so we
pre-assemble M and (alpha*K + SIPG) into HBM-resident ELL arrays at setup
(numpy), add the per-Newton-iterate boundary blocks with one scatter, and
run CG matvecs as gather + row-sum:

  y[i] = sum_k vals[i, k] * x[cols[i, k]]

~an order of magnitude fewer flops per matvec than reassembly, ideal
VPU/HBM streaming shape, and trivially shardable by rows. This is the
'preconditioned-CG SpMV in Pallas on HBM-resident CSR/ELL' component of
the north-star (BASELINE.json); the reference gets the equivalent from
PETSc's assembled AIJ matrices.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fem_glass_tempering_tpu.ops.heat import HeatOperator


class EllMatrix:
    """Static ELL structure + assembly maps for a HeatOperator's Jacobian."""

    def __init__(self, op: HeatOperator):
        self.op = op
        fs = op.fs
        n = fs.n_scalar_dofs
        dofmap = np.asarray(op.np_dofmap)       # (c, l)
        nloc = dofmap.shape[1]

        # ---- collect (row, col) pairs from all coupling sources ----
        pairs = [np.stack(np.broadcast_arrays(
            dofmap[:, :, None], dofmap[:, None, :]), axis=-1).reshape(-1, 2)]
        b_dofmap = np.asarray(op.np_b_dofmap)
        if len(b_dofmap):
            pairs.append(np.stack(np.broadcast_arrays(
                b_dofmap[:, :, None], b_dofmap[:, None, :]), axis=-1).reshape(-1, 2))
        if op.is_dg:
            dp = np.asarray(op.np_i["dofmap_p"])
            dm = np.asarray(op.np_i["dofmap_m"])
            for a, b in ((dp, dp), (dp, dm), (dm, dp), (dm, dm)):
                pairs.append(np.stack(np.broadcast_arrays(
                    a[:, :, None], b[:, None, :]), axis=-1).reshape(-1, 2))
        allp = np.unique(np.concatenate(pairs, axis=0), axis=0)
        rows, cols = allp[:, 0], allp[:, 1]
        counts = np.bincount(rows, minlength=n)
        K = int(counts.max())
        self.K = K
        ell_cols = np.zeros((n, K), dtype=np.int32)
        slot_of = {}
        fill = np.zeros(n, dtype=np.int32)
        for r, c in allp:
            s = fill[r]
            ell_cols[r, s] = c
            slot_of[(int(r), int(c))] = s
            fill[r] = s + 1
        # unused slots point at column 0 with zero values -> harmless
        self.cols = jnp.asarray(ell_cols)
        self.n = n

        def flat_idx(rowcol_pairs):
            return np.array(
                [slot_of[(int(r), int(c))] + K * int(r) for r, c in rowcol_pairs],
                dtype=np.int64)

        # ---- constant element matrices pre-assembled (numpy) ----
        qw = np.asarray(op.np_qw)
        phi = np.asarray(op.np_phi)
        gphi = np.asarray(op.np_gphi)
        if qw.ndim == 1:       # uniform-mesh compact tables ((q,), (q,l,g))
            nc = dofmap.shape[0]
            qw = np.broadcast_to(qw, (nc,) + qw.shape)
            gphi = np.broadcast_to(gphi, (nc,) + gphi.shape)
        mass_el = op.c_mass * np.einsum("cq,ql,qm->clm", qw, phi, phi)
        stiff_el = op.c_diff * np.einsum("cq,cqlg,cqmg->clm", qw, gphi, gphi)
        vals_mass = np.zeros(n * K)
        vals_stiff = np.zeros(n * K)
        cell_pairs = np.stack(np.broadcast_arrays(
            dofmap[:, :, None], dofmap[:, None, :]), axis=-1).reshape(-1, 2)
        idx = flat_idx(cell_pairs)
        np.add.at(vals_mass, idx, mass_el.reshape(-1))
        np.add.at(vals_stiff, idx, stiff_el.reshape(-1))

        if op.is_dg:
            coef = op.c_diff * op.np_i["qw"]                      # (f, q)
            php = op.np_i["phi_p"]
            phm = op.np_i["phi_m"]
            dnp_ = op.np_i["dnphi_p"]
            dnm = op.np_i["dnphi_m"]
            penh = (op.params.dg_penalty / op.np_i["h_p"])[:, None]
            # d r_p / d T_p etc. — matches the residual's SIPG terms
            Jpp = (np.einsum("fq,fql,fqm->flm", coef * penh, php, php)
                   - 0.5 * np.einsum("fq,fql,fqm->flm", coef, dnp_, php)
                   - 0.5 * np.einsum("fq,fql,fqm->flm", coef, php, dnp_))
            Jpm = (-np.einsum("fq,fql,fqm->flm", coef * penh, php, phm)
                   + 0.5 * np.einsum("fq,fql,fqm->flm", coef, dnp_, phm)
                   - 0.5 * np.einsum("fq,fql,fqm->flm", coef, php, dnm))
            Jmp = (-np.einsum("fq,fql,fqm->flm", coef * penh, phm, php)
                   - 0.5 * np.einsum("fq,fql,fqm->flm", coef, dnm, php)
                   + 0.5 * np.einsum("fq,fql,fqm->flm", coef, phm, dnp_))
            Jmm = (np.einsum("fq,fql,fqm->flm", coef * penh, phm, phm)
                   + 0.5 * np.einsum("fq,fql,fqm->flm", coef, dnm, phm)
                   + 0.5 * np.einsum("fq,fql,fqm->flm", coef, phm, dnm))
            dp = np.asarray(op.np_i["dofmap_p"])
            dm = np.asarray(op.np_i["dofmap_m"])
            for J, (a, b) in ((Jpp, (dp, dp)), (Jpm, (dp, dm)),
                              (Jmp, (dm, dp)), (Jmm, (dm, dm))):
                prs = np.stack(np.broadcast_arrays(
                    a[:, :, None], b[:, None, :]), axis=-1).reshape(-1, 2)
                np.add.at(vals_stiff, flat_idx(prs), J.reshape(-1))

        dtype = op.dtype
        self.vals_mass = jnp.asarray(vals_mass.reshape(n, K), dtype=dtype)
        self.vals_stiff = jnp.asarray(vals_stiff.reshape(n, K), dtype=dtype)

        # boundary-block scatter indices (values recomputed per Newton iter)
        if len(b_dofmap):
            bprs = np.stack(np.broadcast_arrays(
                b_dofmap[:, :, None], b_dofmap[:, None, :]), axis=-1).reshape(-1, 2)
            self.b_flat_idx = jnp.asarray(flat_idx(bprs))
        else:
            self.b_flat_idx = None

    # ------------------------------------------------------------------
    def values_at(self, T: jnp.ndarray, dt) -> jnp.ndarray:
        """ELL values of J(T) = mass + dt*(stiff + B'(T))."""
        op = self.op
        p = op.params
        vals = self.vals_mass + dt * self.vals_stiff
        if self.b_flat_idx is not None:
            Tb = jnp.einsum("fql,fl->fq", op.b_phi, T[op.b_dofmap])
            dflux = p.boundary_scale * (4.0 * p.sigma * p.epsilon * Tb**3 + p.htc)
            blocks = jnp.einsum("fq,fql,fqm->flm", op.b_qw * dt * dflux,
                                op.b_phi, op.b_phi)
            vals = vals.reshape(-1).at[self.b_flat_idx].add(
                blocks.reshape(-1)).reshape(self.n, self.K)
        return vals

    def matvec(self, vals: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """y = A x via ELL gather + row-sum."""
        return jnp.einsum("nk,nk->n", vals, x[self.cols])

    def make_matvec(self, T: jnp.ndarray, dt):
        vals = self.values_at(T, dt)
        if self.op.has_bc:
            mask = self.op.bc_mask
            base = lambda v: jnp.where(
                mask, v, self.matvec(vals, jnp.where(mask, 0.0, v)))
            return base
        return lambda v: self.matvec(vals, v)
