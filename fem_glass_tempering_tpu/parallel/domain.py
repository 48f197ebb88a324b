"""Explicit domain decomposition: shard_map coupled step with halo exchange.

The second distributed strategy (beyond parallel/sharding's XLA-managed
cell data parallelism): the mesh is partitioned into contiguous blocks
(parallel/partition.py), every per-device quantity lives in arrays with a
leading device axis P, and ONE shard_map region runs the whole coupled step
— Newton/CG with psum-reduced inner products (the reference's KSP/MPI
reductions, SURVEY.md §5 item 2) and an all-gather halo of interface-cell
temperature values standing in for `scatter_forward` ghost updates
(ThermoViscoProblem.py:349-354). On TPU hardware the all_gather/psum ride
the ICI mesh.

Scope: DG temperature spaces (the reference's default config, main.py:25),
where dofs are cell-local so the ONLY communication is (a) interface-cell
values for cross-partition SIPG facets and (b) global reductions. Cross
facets are computed on BOTH incident devices, each producing only its own
rows — halo traffic is one-way, no reverse accumulation. CG temperature
spaces use parallel/sharding instead.

The viscoelastic chain is fully local: each sigma-space dof is owned by the
device of its owner cell, whose T dofs are local by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from fem_glass_tempering_tpu.config import RunConfig
from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace
from fem_glass_tempering_tpu.fem.mesh import Mesh as FEMesh
from fem_glass_tempering_tpu.models.viscoelastic import (
    TABLEAU_SIZE,
    ViscoState,
    ViscoelasticEngine,
)
from fem_glass_tempering_tpu.ops.assembly import (
    build_boundary_geometry,
    build_cell_geometry,
    build_interior_geometry,
)
from fem_glass_tempering_tpu.ops.interpolation import build_cross_eval
from fem_glass_tempering_tpu.parallel.partition import build_dd_layout
from fem_glass_tempering_tpu.solver.newton import newton_solve

AXIS = "p"


def _pad_to(arr: np.ndarray, n: int, fill=0.0) -> np.ndarray:
    out = np.full((n,) + arr.shape[1:], fill, dtype=arr.dtype)
    out[: len(arr)] = arr
    return out


class DDProblem:
    """Domain-decomposed coupled tempering problem (DG temperature)."""

    def __init__(self, mesh: FEMesh, config: RunConfig, n_parts: int,
                 devices=None, dtype=jnp.float64):
        fe = config.fe
        if fe.T_family != "DG":
            raise ValueError("DDProblem requires a DG temperature space; "
                             "use parallel.sharding for CG")
        self.config = config
        self.mesh = mesh
        self.dtype = dtype
        self.n_parts = n_parts
        self.fs_T = FunctionSpace(mesh, "DG", fe.T_degree)
        self.fs_sigma = FunctionSpace(mesh, fe.sigma_family, fe.sigma_degree,
                                      value_shape=(mesh.tdim, mesh.tdim))
        self.engine = ViscoelasticEngine(
            self.fs_T, self.fs_sigma, config.params, config.time.dt,
            physics_mode=config.physics_mode, dtype=dtype)
        self.params = config.params
        self.dt = config.time.dt
        devices = list(devices if devices is not None else jax.devices())
        if len(devices) < n_parts:
            raise RuntimeError(f"need {n_parts} devices, have {len(devices)}")
        self.dev_mesh = Mesh(np.array(devices[:n_parts]), (AXIS,))
        self._build_arrays()
        self._build_step()

    # ------------------------------------------------------------------
    def _build_arrays(self) -> None:
        mesh, fs = self.mesh, self.fs_T
        nloc = fs.element.nloc
        Pn = self.n_parts
        layout, part, aux = build_dd_layout(mesh, nloc, fs.dofmap, Pn)
        self.layout, self.part = layout, part
        L = layout.n_local_cells

        cg = build_cell_geometry(mesh, fs)
        # boundary degree 5p matches HeatOperator (T^4 radiation integrand)
        bg = build_boundary_geometry(mesh, fs, 5 * fs.degree)
        ig = build_interior_geometry(mesh, fs)
        q = cg.qweights.shape[1]
        g = mesh.gdim

        # ---- per-device cell geometry ----
        qw = np.zeros((Pn, L, q))
        gphi = np.zeros((Pn, L, q, nloc, g))
        for p, cl in enumerate(aux["cells_by_dev"]):
            qw[p, : len(cl)] = cg.qweights[cl]
            gphi[p, : len(cl)] = cg.grad_phys[cl]

        # ---- boundary facets by owning device ----
        bdev = part[bg.cell]
        B = max(int((bdev == p).sum()) for p in range(Pn)) or 1
        qfb = bg.qweights.shape[1]
        qf = ig.qweights.shape[1] if len(ig.qweights) else 1
        b_slot = np.zeros((Pn, B), dtype=np.int32)
        b_qw = np.zeros((Pn, B, qfb))
        b_phi = np.zeros((Pn, B, qfb, nloc))
        slot_of_cell = aux["slot_of_cell"]
        for p in range(Pn):
            idx = np.nonzero(bdev == p)[0]
            b_slot[p, : len(idx)] = slot_of_cell[bg.cell[idx]]
            b_qw[p, : len(idx)] = bg.qweights[idx]
            b_phi[p, : len(idx)] = bg.phi[idx]

        # ---- intra-device interior facets ----
        dnphi_p = np.einsum("fqlg,fqg->fql", ig.grad_p, ig.normal_p)
        dnphi_m = np.einsum("fqlg,fqg->fql", ig.grad_m, ig.normal_p)
        pen_h = self.params.dg_penalty / ig.h_p
        I_ = max((len(v) for v in aux["intra_by_dev"]), default=1) or 1
        ia_sp = np.zeros((Pn, I_), dtype=np.int32)
        ia_sm = np.zeros((Pn, I_), dtype=np.int32)
        ia_qw = np.zeros((Pn, I_, qf))
        ia_php = np.zeros((Pn, I_, qf, nloc))
        ia_phm = np.zeros((Pn, I_, qf, nloc))
        ia_dnp = np.zeros((Pn, I_, qf, nloc))
        ia_dnm = np.zeros((Pn, I_, qf, nloc))
        ia_pen = np.zeros((Pn, I_))
        for p in range(Pn):
            idx = aux["intra_by_dev"][p]
            n = len(idx)
            ia_sp[p, :n] = slot_of_cell[ig.cell_p[idx]]
            ia_sm[p, :n] = slot_of_cell[ig.cell_m[idx]]
            ia_qw[p, :n] = ig.qweights[idx]
            ia_php[p, :n] = ig.phi_p[idx]
            ia_phm[p, :n] = ig.phi_m[idx]
            ia_dnp[p, :n] = dnphi_p[idx]
            ia_dnm[p, :n] = dnphi_m[idx]
            ia_pen[p, :n] = pen_h[idx]

        # ---- cross-device facets (both sides, own-rows-only) ----
        F = layout.n_cross
        cr_slot = np.zeros((Pn, F), dtype=np.int32)
        cr_qw = np.zeros((Pn, F, qf))
        cr_ph_my = np.zeros((Pn, F, qf, nloc))
        cr_ph_rm = np.zeros((Pn, F, qf, nloc))
        cr_dn_my = np.zeros((Pn, F, qf, nloc))
        cr_dn_rm = np.zeros((Pn, F, qf, nloc))
        cr_pen = np.zeros((Pn, F))
        cr_sign = np.zeros((Pn, F))
        for p in range(Pn):
            for j, (fi, side) in enumerate(aux["cross_by_dev_side"][p]):
                cr_qw[p, j] = ig.qweights[fi]
                cr_pen[p, j] = pen_h[fi]
                if side == 0:  # this device owns the '+' cell
                    cr_slot[p, j] = slot_of_cell[ig.cell_p[fi]]
                    cr_ph_my[p, j] = ig.phi_p[fi]
                    cr_dn_my[p, j] = dnphi_p[fi]
                    cr_ph_rm[p, j] = ig.phi_m[fi]
                    cr_dn_rm[p, j] = dnphi_m[fi]
                    cr_sign[p, j] = -1.0
                else:          # owns the '-' cell
                    cr_slot[p, j] = slot_of_cell[ig.cell_m[fi]]
                    cr_ph_my[p, j] = ig.phi_m[fi]
                    cr_dn_my[p, j] = dnphi_m[fi]
                    cr_ph_rm[p, j] = ig.phi_p[fi]
                    cr_dn_rm[p, j] = dnphi_p[fi]
                    cr_sign[p, j] = +1.0

        # ---- sigma-space decomposition by owner cell ----
        fs_s = self.fs_sigma
        sdev = part[fs_s.owner_cell]
        Ls = max(int((sdev == p).sum()) for p in range(Pn)) or 1
        ce = build_cross_eval(fs_s, {"T": fs})
        if ce.same_space("T"):
            # identical spaces: interpolation is the identity on dofs, use a
            # trivial per-slot tab over the owner cell's own lattice points
            tab_rows = np.eye(nloc)[fs_s.owner_lpoint]
        else:
            tab_rows = np.asarray(ce._tab["T"])
        self.sigma_owner = sdev
        sg_tab = np.zeros((Pn, Ls, nloc))
        sg_src = np.zeros((Pn, Ls), dtype=np.int32)
        sg_dof = np.full((Pn, Ls), -1, dtype=np.int64)   # global sigma dof ids
        for p in range(Pn):
            idx = np.nonzero(sdev == p)[0]
            n = len(idx)
            sg_tab[p, :n] = tab_rows[idx]
            sg_src[p, :n] = slot_of_cell[fs_s.owner_cell[idx]]
            sg_dof[p, :n] = idx
        self.sg_dof = sg_dof
        self.n_local_sigma = Ls

        # ---- Jacobi diag padding mask ----
        valid_dof = np.zeros((Pn, L * nloc))
        for p, cl in enumerate(aux["cells_by_dev"]):
            valid_dof[p, : len(cl) * nloc] = 1.0

        f = lambda a: jnp.asarray(a, dtype=self.dtype)
        i = lambda a: jnp.asarray(a, dtype=jnp.int32)
        self.arrs = dict(
            qw=f(qw), gphi=f(gphi), phi=f(cg.phi),
            b_slot=i(b_slot), b_qw=f(b_qw), b_phi=f(b_phi),
            ia_sp=i(ia_sp), ia_sm=i(ia_sm), ia_qw=f(ia_qw),
            ia_php=f(ia_php), ia_phm=f(ia_phm), ia_dnp=f(ia_dnp),
            ia_dnm=f(ia_dnm), ia_pen=f(ia_pen),
            cr_slot=i(cr_slot), cr_qw=f(cr_qw), cr_ph_my=f(cr_ph_my),
            cr_ph_rm=f(cr_ph_rm), cr_dn_my=f(cr_dn_my), cr_dn_rm=f(cr_dn_rm),
            cr_pen=f(cr_pen), cr_sign=f(cr_sign),
            cr_recv=i(layout.cross_recv_flat),
            send_slot=i(layout.send_cell_slot),
            sg_tab=f(sg_tab), sg_src=i(sg_src),
            valid_dof=f(valid_dof),
        )

    # ------------------------------------------------------------------
    def _build_step(self) -> None:
        pcfg = self.params
        scfg = self.config.solver
        dt = self.dt
        L = self.layout.n_local_cells
        nloc = self.layout.nloc
        engine = self.engine
        arrs = self.arrs
        Pn = self.n_parts

        def dot(a, b):
            return jax.lax.psum(jnp.vdot(a, b), AXIS)

        def local_residual(T, T_prev, A):
            """Per-device residual; T is (L*nloc,). A = per-device arrays."""
            Tc = T.reshape(L, nloc)
            Tpc = T_prev.reshape(L, nloc)
            Tq = Tc @ A["phi"].T
            Tpq = Tpc @ A["phi"].T
            gTq = jnp.einsum("cl,cqlg->cqg", Tc, A["gphi"])
            mass_src = A["qw"] * ((Tq - Tpq) - dt * pcfg.f)
            r = jnp.einsum("cq,ql->cl", mass_src, A["phi"])
            r += dt * pcfg.alpha * jnp.einsum(
                "cqg,cqlg->cl", A["qw"][..., None] * gTq, A["gphi"])

            # boundary Robin terms
            Tb = jnp.einsum("fql,fl->fq", A["b_phi"], Tc[A["b_slot"]])
            gflux = pcfg.boundary_scale * (
                (pcfg.sigma * pcfg.epsilon) * (Tb**4 - pcfg.T_ambient**4)
                + pcfg.htc * (Tb - pcfg.T_ambient))
            r_b = jnp.einsum("fq,fql->fl", A["b_qw"] * dt * gflux, A["b_phi"])
            r = r.at[A["b_slot"]].add(r_b)

            # intra-device SIPG facets
            Tp = jnp.einsum("fql,fl->fq", A["ia_php"], Tc[A["ia_sp"]])
            Tm = jnp.einsum("fql,fl->fq", A["ia_phm"], Tc[A["ia_sm"]])
            dTp = jnp.einsum("fql,fl->fq", A["ia_dnp"], Tc[A["ia_sp"]])
            dTm = jnp.einsum("fql,fl->fq", A["ia_dnm"], Tc[A["ia_sm"]])
            jumpT = Tp - Tm
            avg = 0.5 * (dTp + dTm)
            coef = dt * pcfg.alpha * A["ia_qw"]
            penh = A["ia_pen"][:, None]
            r_p = (jnp.einsum("fq,fql->fl", coef * penh * jumpT, A["ia_php"])
                   - jnp.einsum("fq,fql->fl", coef * 0.5 * jumpT, A["ia_dnp"])
                   - jnp.einsum("fq,fql->fl", coef * avg, A["ia_php"]))
            r_m = (-jnp.einsum("fq,fql->fl", coef * penh * jumpT, A["ia_phm"])
                   - jnp.einsum("fq,fql->fl", coef * 0.5 * jumpT, A["ia_dnm"])
                   + jnp.einsum("fq,fql->fl", coef * avg, A["ia_phm"]))
            r = r.at[A["ia_sp"]].add(r_p)
            r = r.at[A["ia_sm"]].add(r_m)

            # cross-device SIPG facets: halo of interface-cell values
            publish = Tc[A["send_slot"]]                       # (H, nloc)
            allv = jax.lax.all_gather(publish, AXIS)           # (P, H, nloc)
            remote = allv.reshape(-1, nloc)[A["cr_recv"]]      # (F, nloc)
            T_my = jnp.einsum("fql,fl->fq", A["cr_ph_my"], Tc[A["cr_slot"]])
            T_rm = jnp.einsum("fql,fl->fq", A["cr_ph_rm"], remote)
            dT_my = jnp.einsum("fql,fl->fq", A["cr_dn_my"], Tc[A["cr_slot"]])
            dT_rm = jnp.einsum("fql,fl->fq", A["cr_dn_rm"], remote)
            D = T_my - T_rm
            Av = 0.5 * (dT_my + dT_rm)
            coef = dt * pcfg.alpha * A["cr_qw"]
            penh = A["cr_pen"][:, None]
            s = A["cr_sign"][:, None]
            r_c = (jnp.einsum("fq,fql->fl", coef * penh * D, A["cr_ph_my"])
                   + jnp.einsum("fq,fql->fl", coef * s * 0.5 * D, A["cr_dn_my"])
                   + jnp.einsum("fq,fql->fl", coef * s * Av, A["cr_ph_my"]))
            r = r.at[A["cr_slot"]].add(r_c)
            return r.reshape(-1)

        def local_diag(T, A, const_diag):
            Tc = T.reshape(L, nloc)
            Tb = jnp.einsum("fql,fl->fq", A["b_phi"], Tc[A["b_slot"]])
            dflux = pcfg.boundary_scale * (
                4.0 * pcfg.sigma * pcfg.epsilon * Tb**3 + pcfg.htc)
            d_b = jnp.einsum("fq,fql,fql->fl", A["b_qw"] * dt * dflux,
                             A["b_phi"], A["b_phi"])
            d = const_diag.reshape(L, nloc).at[A["b_slot"]].add(d_b)
            return d.reshape(-1)

        def const_diag_local(A):
            d = jnp.einsum("cq,ql,ql->cl", A["qw"], A["phi"], A["phi"])
            d += dt * pcfg.alpha * jnp.einsum(
                "cq,cqlg,cqlg->cl", A["qw"], A["gphi"], A["gphi"])
            coef = dt * pcfg.alpha * A["ia_qw"]
            penh = A["ia_pen"][:, None]
            d_p = (jnp.einsum("fq,fql,fql->fl", coef * penh, A["ia_php"], A["ia_php"])
                   - jnp.einsum("fq,fql,fql->fl", coef, A["ia_php"], A["ia_dnp"]))
            d_m = (jnp.einsum("fq,fql,fql->fl", coef * penh, A["ia_phm"], A["ia_phm"])
                   + jnp.einsum("fq,fql,fql->fl", coef, A["ia_phm"], A["ia_dnm"]))
            d = d.at[A["ia_sp"]].add(d_p)
            d = d.at[A["ia_sm"]].add(d_m)
            coef = dt * pcfg.alpha * A["cr_qw"]
            penh = A["cr_pen"][:, None]
            s = A["cr_sign"][:, None]
            d_c = (jnp.einsum("fq,fql,fql->fl", coef * penh, A["cr_ph_my"], A["cr_ph_my"])
                   + jnp.einsum("fq,fql,fql->fl", coef * s, A["cr_ph_my"], A["cr_dn_my"]))
            d = d.at[A["cr_slot"]].add(d_c)
            # padded slots: identity rows so Jacobi never divides by zero
            valid = A["valid_dof"].reshape(L, nloc)
            return (d * valid + (1.0 - valid)).reshape(-1)

        n_arr = len(arrs)
        keys = sorted(arrs)

        replicated = {"phi"}  # shared tabulation table, no device axis

        def body(state, *flat_arrs):
            A = {k: (v if k in replicated else v[0])
                 for k, v in zip(keys, flat_arrs)}
            st = jax.tree_util.tree_map(lambda x: x[0], state)
            cdiag = const_diag_local(A)
            res = newton_solve(
                lambda T: local_residual(T, st.T, A), st.T,
                jac_diag_fn=lambda T: local_diag(T, A, cdiag),
                rtol=scfg.newton_rtol, atol=scfg.newton_atol,
                max_it=scfg.newton_max_it, cg_rtol=scfg.cg_rtol,
                cg_atol=scfg.cg_atol, cg_max_it=scfg.cg_max_it, dot=dot)

            def ev(name, arr):
                src = arr.reshape(L, nloc)[A["sg_src"]]     # (Ls, nloc)
                return jnp.einsum("tl,tl->t", A["sg_tab"], src)

            st2 = engine.material_step_with(st, res.x, ev)
            out = jax.tree_util.tree_map(lambda x: x[None], st2)
            return out, res.converged[None], res.iters[None], res.krylov_iters[None]

        specs_arrs = tuple(P() if k in replicated else P(AXIS) for k in keys)
        state_spec = jax.tree_util.tree_map(lambda _: P(AXIS), self._state_struct())
        self._step_sm = jax.jit(shard_map(
            body, mesh=self.dev_mesh,
            in_specs=(state_spec,) + specs_arrs,
            out_specs=(state_spec, P(AXIS), P(AXIS), P(AXIS)),
            check_vma=False,
        ))
        self._arr_list = [arrs[k] for k in keys]

    # ------------------------------------------------------------------
    def _state_struct(self):
        return self.init_state()

    def init_state(self) -> ViscoState:
        p = self.params
        Pn = self.n_parts
        L = self.layout.n_local_cells * self.layout.nloc
        Ls = self.n_local_sigma
        d = self.mesh.tdim
        f = lambda shape, v=0.0: jnp.full(shape, v, dtype=self.dtype)
        return ViscoState(
            t=f((Pn,)),
            T=f((Pn, L), p.T_0), T_prev=f((Pn, L), p.T_0),
            Tf=f((Pn, L), p.T_0), Tf_prev=f((Pn, L), p.T_0),
            Tf_partial=f((Pn, L, TABLEAU_SIZE), p.T_0),
            phi=f((Pn, L)), xi=f((Pn, L)),
            thermal_strain=f((Pn, Ls, d, d)),
            total_strain=f((Pn, Ls, d, d)),
            deviatoric_strain=f((Pn, Ls, d, d)),
            s_tilde=f((Pn, Ls, TABLEAU_SIZE, d, d)),
            sigma_tilde=f((Pn, Ls, TABLEAU_SIZE, d, d)),
            s_partial=f((Pn, Ls, TABLEAU_SIZE, d, d)),
            sigma_partial=f((Pn, Ls, TABLEAU_SIZE, d, d)),
            sigma=f((Pn, Ls, d, d)),
        )

    def step(self, state: ViscoState):
        state, conv, iters, kiters = self._step_sm(state, *self._arr_list)
        return state, bool(np.all(np.asarray(conv))), int(np.asarray(iters)[0]), int(np.asarray(kiters)[0])

    # ------------------------------------------------------------------
    def gather_T(self, state: ViscoState) -> np.ndarray:
        """Distributed T -> global dof vector."""
        from fem_glass_tempering_tpu.parallel.partition import gather_local_to_global
        return gather_local_to_global(self.layout, np.asarray(state.T))

    def gather_state(self, state: ViscoState) -> ViscoState:
        """Distributed state -> a global-layout ViscoState (host), so the
        single-device writers and checkpointing (io/) work unchanged on DD
        runs — the reference's 'gather for I/O' pattern (SURVEY.md §5
        communication inventory item 4)."""
        import jax.numpy as jnp

        from fem_glass_tempering_tpu.parallel.partition import (
            gather_local_to_global,
        )

        def g_T(arr):
            arr = np.asarray(arr)
            if arr.ndim == 2:       # (P, Ldofs)
                return gather_local_to_global(self.layout, arr)
            # (P, Ldofs, extra...): apply per trailing component
            extra = arr.shape[2:]
            flat = arr.reshape(arr.shape[0], arr.shape[1], -1)
            cols = [gather_local_to_global(self.layout, flat[:, :, k])
                    for k in range(flat.shape[-1])]
            return np.stack(cols, axis=-1).reshape((-1,) + extra)

        def g_S(arr):
            arr = np.asarray(arr)
            out = np.zeros((self.fs_sigma.n_scalar_dofs,) + arr.shape[2:],
                           dtype=arr.dtype)
            valid = self.sg_dof >= 0
            out[self.sg_dof[valid]] = arr[valid]
            return out

        return ViscoState(
            t=jnp.asarray(np.asarray(state.t)[0]),
            T=jnp.asarray(g_T(state.T)), T_prev=jnp.asarray(g_T(state.T_prev)),
            Tf=jnp.asarray(g_T(state.Tf)), Tf_prev=jnp.asarray(g_T(state.Tf_prev)),
            Tf_partial=jnp.asarray(g_T(state.Tf_partial)),
            phi=jnp.asarray(g_T(state.phi)), xi=jnp.asarray(g_T(state.xi)),
            thermal_strain=jnp.asarray(g_S(state.thermal_strain)),
            total_strain=jnp.asarray(g_S(state.total_strain)),
            deviatoric_strain=jnp.asarray(g_S(state.deviatoric_strain)),
            s_tilde=jnp.asarray(g_S(state.s_tilde)),
            sigma_tilde=jnp.asarray(g_S(state.sigma_tilde)),
            s_partial=jnp.asarray(g_S(state.s_partial)),
            sigma_partial=jnp.asarray(g_S(state.sigma_partial)),
            sigma=jnp.asarray(g_S(state.sigma)),
        )

    def gather_sigma(self, state: ViscoState) -> np.ndarray:
        """Distributed sigma -> global (n_sigma_dofs, d, d)."""
        d = self.mesh.tdim
        out = np.zeros((self.fs_sigma.n_scalar_dofs, d, d))
        loc = np.asarray(state.sigma)
        valid = self.sg_dof >= 0
        out[self.sg_dof[valid]] = loc[valid]
        return out
