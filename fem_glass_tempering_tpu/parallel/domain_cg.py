"""Explicit domain decomposition for CG temperature spaces.

Complements parallel/domain.py (DG): with continuous elements there are no
interior-facet terms, but partition-interface dofs are SHARED — the exact
situation the reference handles with ghost IndexMaps + `scatter_forward`
(ThermoViscoProblem.py:349-354). Here:

- each device stores a local dof vector (owned + shared copies, padded);
  values of shared dofs are kept replicated-consistent on every device,
- assembly produces partial sums; an all_gather of the interface partials
  followed by a segment-sum SET (not add) restores consistency — this IS
  scatter_forward's ghost accumulation, expressed as one collective,
- Newton/CG inner products weight shared dofs by an ownership mask and
  psum across devices (PETSc's VecDot semantics over ghosted vectors).

The viscoelastic chain runs fully local (sigma dofs by owner-cell device,
whose temperature dofs are present locally by construction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

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
)
from fem_glass_tempering_tpu.ops.interpolation import build_cross_eval
from fem_glass_tempering_tpu.parallel.partition import partition_cells
from fem_glass_tempering_tpu.solver.newton import newton_solve

AXIS = "p"


class CGDDProblem:
    """Domain-decomposed coupled tempering problem (CG temperature)."""

    def __init__(self, mesh: FEMesh, config: RunConfig, n_parts: int,
                 devices=None, dtype=jnp.float64):
        fe = config.fe
        if fe.T_family != "CG":
            raise ValueError("CGDDProblem requires a CG temperature space; "
                             "use parallel.domain.DDProblem for DG")
        self.config = config
        self.mesh = mesh
        self.dtype = dtype
        self.n_parts = n_parts
        self.fs_T = FunctionSpace(mesh, "CG", fe.T_degree)
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
        Pn = self.n_parts
        nloc = fs.element.nloc
        part = partition_cells(mesh, Pn)
        self.part = part
        cells_by_dev = [np.nonzero(part == p)[0].astype(np.int32)
                        for p in range(Pn)]
        L = max(len(c) for c in cells_by_dev)

        # local dof numbering per device
        local_gids = []
        gid_to_lid = []
        for p in range(Pn):
            g = np.unique(fs.dofmap[cells_by_dev[p]])
            local_gids.append(g)
            gid_to_lid.append({int(v): k for k, v in enumerate(g)})
        Lg = max(len(g) for g in local_gids)

        # dof ownership: device of the dof's owner cell
        own_dev = part[fs.owner_cell]                      # (n_gdofs,)
        touch = np.zeros(fs.n_scalar_dofs, dtype=np.int32)
        for p in range(Pn):
            touch[local_gids[p]] += 1

        cg = build_cell_geometry(mesh, fs)
        bg = build_boundary_geometry(mesh, fs, 5 * fs.degree)
        q = cg.qweights.shape[1]
        g = mesh.gdim

        qw = np.zeros((Pn, L, q))
        gphi = np.zeros((Pn, L, q, nloc, g))
        ldof = np.zeros((Pn, L, nloc), dtype=np.int32)
        for p, cl in enumerate(cells_by_dev):
            qw[p, : len(cl)] = cg.qweights[cl]
            gphi[p, : len(cl)] = cg.grad_phys[cl]
            lut = gid_to_lid[p]
            ldof[p, : len(cl)] = np.vectorize(lut.get)(fs.dofmap[cl])
            # padded cells reference slot 0 with zero weights

        bdev = part[bg.cell]
        B = max(int((bdev == p).sum()) for p in range(Pn)) or 1
        qfb = bg.qweights.shape[1]
        b_ldof = np.zeros((Pn, B, nloc), dtype=np.int32)
        b_qw = np.zeros((Pn, B, qfb))
        b_phi = np.zeros((Pn, B, qfb, nloc))
        for p in range(Pn):
            idx = np.nonzero(bdev == p)[0]
            b_qw[p, : len(idx)] = bg.qweights[idx]
            b_phi[p, : len(idx)] = bg.phi[idx]
            lut = gid_to_lid[p]
            b_ldof[p, : len(idx)] = np.vectorize(lut.get)(fs.dofmap[bg.cell[idx]])

        # ownership + interface publication
        own_mask = np.zeros((Pn, Lg))
        valid = np.zeros((Pn, Lg))
        for p in range(Pn):
            n = len(local_gids[p])
            valid[p, :n] = 1.0
            own_mask[p, :n] = (own_dev[local_gids[p]] == p).astype(float)

        iface_lists = [
            np.nonzero(touch[local_gids[p]] > 1)[0].astype(np.int32)
            for p in range(Pn)
        ]
        S = max((len(v) for v in iface_lists), default=1) or 1
        pub_lidx = np.zeros((Pn, S), dtype=np.int32)
        pub_gid = np.full((Pn, S), -1, dtype=np.int64)
        for p, lst in enumerate(iface_lists):
            pub_lidx[p, : len(lst)] = lst
            pub_gid[p, : len(lst)] = local_gids[p][lst]
        # per-device accumulation map over the flattened (P*S) publication:
        # row r contributes to local dof map_acc[p, r] (or Lg = dump slot)
        map_acc = np.full((Pn, Pn * S), Lg, dtype=np.int32)
        for p in range(Pn):
            lut = gid_to_lid[p]
            flat = pub_gid.reshape(-1)
            for r, gg in enumerate(flat):
                if gg >= 0 and int(gg) in lut:
                    map_acc[p, r] = lut[int(gg)]
        is_iface = np.zeros((Pn, Lg))
        for p, lst in enumerate(iface_lists):
            is_iface[p, lst] = 1.0

        # sigma-space decomposition by owner cell (local evaluation tables)
        fs_s = self.fs_sigma
        sdev = part[fs_s.owner_cell]
        Ls = max(int((sdev == p).sum()) for p in range(Pn)) or 1
        ce = build_cross_eval(fs_s, {"T": fs})
        if ce.same_space("T"):
            tab_rows = np.eye(nloc)[fs_s.owner_lpoint]
        else:
            tab_rows = np.asarray(ce._tab["T"])
        slot_of_cell = np.full(mesh.n_cells, -1, dtype=np.int32)
        for p, cl in enumerate(cells_by_dev):
            slot_of_cell[cl] = np.arange(len(cl), dtype=np.int32)
        sg_tab = np.zeros((Pn, Ls, nloc))
        sg_src = np.zeros((Pn, Ls), dtype=np.int32)   # local CELL slot
        sg_dof = np.full((Pn, Ls), -1, dtype=np.int64)
        for p in range(Pn):
            idx = np.nonzero(sdev == p)[0]
            n = len(idx)
            sg_tab[p, :n] = tab_rows[idx]
            sg_src[p, :n] = slot_of_cell[fs_s.owner_cell[idx]]
            sg_dof[p, :n] = idx
        self.sg_dof = sg_dof
        self.n_local_sigma = Ls
        self.local_gids = local_gids
        self.Lg = Lg
        self.n_local_cells = L

        f = lambda a: jnp.asarray(a, dtype=self.dtype)
        i = lambda a: jnp.asarray(a, dtype=jnp.int32)
        self.arrs = dict(
            qw=f(qw), gphi=f(gphi), phi=f(cg.phi), ldof=i(ldof),
            b_ldof=i(b_ldof), b_qw=f(b_qw), b_phi=f(b_phi),
            own=f(own_mask), valid=f(valid), is_iface=f(is_iface),
            pub_lidx=i(pub_lidx), map_acc=i(map_acc),
            sg_tab=f(sg_tab), sg_src=i(sg_src),
        )

    # ------------------------------------------------------------------
    def _build_step(self) -> None:
        pcfg = self.params
        scfg = self.config.solver
        dt = self.dt
        Lg = self.Lg
        L = self.n_local_cells
        nloc = self.fs_T.element.nloc
        engine = self.engine
        arrs = self.arrs
        keys = sorted(arrs)
        replicated = {"phi"}

        def dot(a, b, A):
            # count shared dofs once: weight by the ownership mask
            return jax.lax.psum(jnp.vdot(a * A["own"], b), AXIS)

        def halo_sum(r, A):
            """Ghost accumulation: publish interface partials, all_gather,
            SET each interface dof to the global sum (scatter_forward)."""
            pub = r[A["pub_lidx"]]                         # (S,)
            allv = jax.lax.all_gather(pub, AXIS).reshape(-1)   # (P*S,)
            acc = jax.ops.segment_sum(allv, A["map_acc"], num_segments=Lg + 1)
            return jnp.where(A["is_iface"] > 0, acc[:Lg], r)

        def local_residual(T, T_prev, A):
            Tc = T[A["ldof"]]                              # (L, nloc)
            Tpc = T_prev[A["ldof"]]
            Tq = Tc @ A["phi"].T
            Tpq = Tpc @ A["phi"].T
            gTq = jnp.einsum("cl,cqlg->cqg", Tc, A["gphi"])
            mass_src = A["qw"] * ((Tq - Tpq) - dt * pcfg.f)
            r_cell = jnp.einsum("cq,ql->cl", mass_src, A["phi"])
            r_cell += dt * pcfg.alpha * jnp.einsum(
                "cqg,cqlg->cl", A["qw"][..., None] * gTq, A["gphi"])
            r = jax.ops.segment_sum(
                r_cell.reshape(-1), A["ldof"].reshape(-1), num_segments=Lg)
            Tb = jnp.einsum("fql,fl->fq", A["b_phi"], T[A["b_ldof"]])
            gflux = pcfg.boundary_scale * (
                (pcfg.sigma * pcfg.epsilon) * (Tb**4 - pcfg.T_ambient**4)
                + pcfg.htc * (Tb - pcfg.T_ambient))
            r_b = jnp.einsum("fq,fql->fl", A["b_qw"] * dt * gflux, A["b_phi"])
            r = r + jax.ops.segment_sum(
                r_b.reshape(-1), A["b_ldof"].reshape(-1), num_segments=Lg)
            return halo_sum(r, A)

        def local_diag(T, A):
            d = jnp.einsum("cq,ql,ql->cl", A["qw"], A["phi"], A["phi"])
            d += dt * pcfg.alpha * jnp.einsum(
                "cq,cqlg,cqlg->cl", A["qw"], A["gphi"], A["gphi"])
            dd = jax.ops.segment_sum(
                d.reshape(-1), A["ldof"].reshape(-1), num_segments=Lg)
            Tb = jnp.einsum("fql,fl->fq", A["b_phi"], T[A["b_ldof"]])
            dflux = pcfg.boundary_scale * (
                4.0 * pcfg.sigma * pcfg.epsilon * Tb**3 + pcfg.htc)
            d_b = jnp.einsum("fq,fql,fql->fl", A["b_qw"] * dt * dflux,
                             A["b_phi"], A["b_phi"])
            dd = dd + jax.ops.segment_sum(
                d_b.reshape(-1), A["b_ldof"].reshape(-1), num_segments=Lg)
            dd = halo_sum(dd, A)
            # padded slots: identity rows
            return dd * A["valid"] + (1.0 - A["valid"])

        def body(state, *flat_arrs):
            A = {k: (v if k in replicated else v[0])
                 for k, v in zip(keys, flat_arrs)}
            st = jax.tree_util.tree_map(lambda x: x[0], state)
            res = newton_solve(
                lambda T: local_residual(T, st.T, A), st.T,
                jac_diag_fn=lambda T: local_diag(T, A),
                rtol=scfg.newton_rtol, atol=scfg.newton_atol,
                max_it=scfg.newton_max_it, cg_rtol=scfg.cg_rtol,
                cg_atol=scfg.cg_atol, cg_max_it=scfg.cg_max_it,
                dot=lambda a, b: dot(a, b, A))

            def ev(name, arr):
                src = arr[A["ldof"]][A["sg_src"]]          # (Ls, nloc)
                return jnp.einsum("tl,tl->t", A["sg_tab"], src)

            st2 = engine.material_step_with(st, res.x, ev)
            out = jax.tree_util.tree_map(lambda x: x[None], st2)
            return out, res.converged[None], res.iters[None], res.krylov_iters[None]

        state_spec = jax.tree_util.tree_map(lambda _: P(AXIS),
                                            self._state_struct())
        specs_arrs = tuple(P() if k in replicated else P(AXIS) for k in keys)
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
        Lg = self.Lg
        Ls = self.n_local_sigma
        d = self.mesh.tdim
        f = lambda shape, v=0.0: jnp.full(shape, v, dtype=self.dtype)
        return ViscoState(
            t=f((Pn,)),
            T=f((Pn, Lg), p.T_0), T_prev=f((Pn, Lg), p.T_0),
            Tf=f((Pn, Lg), p.T_0), Tf_prev=f((Pn, Lg), p.T_0),
            Tf_partial=f((Pn, Lg, TABLEAU_SIZE), p.T_0),
            phi=f((Pn, Lg)), xi=f((Pn, Lg)),
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
        return (state, bool(np.all(np.asarray(conv))),
                int(np.asarray(iters)[0]), int(np.asarray(kiters)[0]))

    # ------------------------------------------------------------------
    def gather_T(self, state: ViscoState) -> np.ndarray:
        out = np.zeros(self.fs_T.n_scalar_dofs)
        loc = np.asarray(state.T)
        own = np.asarray(self.arrs["own"])
        for p in range(self.n_parts):
            gids = self.local_gids[p]
            mask = own[p, : len(gids)] > 0
            out[gids[mask]] = loc[p, : len(gids)][mask]
        return out

    def gather_sigma(self, state: ViscoState) -> np.ndarray:
        d = self.mesh.tdim
        out = np.zeros((self.fs_sigma.n_scalar_dofs, d, d))
        loc = np.asarray(state.sigma)
        valid = self.sg_dof >= 0
        out[self.sg_dof[valid]] = loc[valid]
        return out

    def gather_state(self, state: ViscoState) -> ViscoState:
        """Distributed state -> global-layout ViscoState (host) for the
        shared writers/checkpointing (SURVEY.md §5 'gather for I/O')."""
        import jax.numpy as jnp

        own = np.asarray(self.arrs["own"])

        def g_T(arr):
            arr = np.asarray(arr)
            extra = arr.shape[2:]
            out = np.zeros((self.fs_T.n_scalar_dofs,) + extra, dtype=arr.dtype)
            for p in range(self.n_parts):
                gids = self.local_gids[p]
                mask = own[p, : len(gids)] > 0
                out[gids[mask]] = arr[p, : len(gids)][mask]
            return out

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
