"""Operator tables as jit ARGUMENTS instead of baked HLO constants.

Closure-captured jnp arrays become literal constants inside a jitted
program. For the operator tables of a production-size mesh (stencil value
grids ~100 MB at 1M dofs, DG block tables, line-smoother factors) that is
wrong twice over on TPU:

1. the serialized HLO carries the constants — the axon remote-compile
   tunnel rejects programs past ~30 MB (HTTP 413, measured), and even a
   direct runtime re-uploads them per program;
2. XLA may try to constant-fold through them at compile time.

`TableBundle` fixes this generically: it registers the large array-valued
attributes of every live operator object, `collect()`s their current
values to pass as explicit jit arguments, and `bound(values)` swaps the
traced values in during tracing (restoring the concrete arrays after).
The arrays then flow into the compiled program as ordinary device-resident
parameters — zero copies per call, tiny HLO.
"""

from __future__ import annotations

from contextlib import contextmanager


class TableBundle:
    def __init__(self):
        self._entries: list[tuple[object, str]] = []
        self._seen: set = set()

    # ------------------------------------------------------------------
    def register(self, obj, attrs) -> None:
        """Register array-valued (or pytree-valued) attributes of obj."""
        for a in attrs:
            if getattr(obj, a, None) is None:
                continue
            key = (id(obj), a)
            if key in self._seen:
                continue
            self._seen.add(key)
            self._entries.append((obj, a))

    def register_operator(self, op) -> None:
        """Dispatch on the operator type; recurses into sub-operators."""
        if op is None:
            return
        name = type(op).__name__
        if name == "HeatOperator":
            self.register(op, (
                "dofmap", "qw", "phi", "gphi", "b_dofmap", "b_qw", "b_phi",
                "bc_mask", "bc_values", "source_q", "_const_diag",
                "i_dofmap_p", "i_dofmap_m", "i_qw", "i_phi_p", "i_phi_m",
                "i_dnphi_p", "i_dnphi_m", "i_h_p"))
        elif name == "StencilMatrix":
            self.register(op, ("st_mass", "st_stiff", "b_st_idx"))
            self.register_operator(op.op)
        elif name == "DGStencilMatrix":
            self.register(op, ("self_mass", "self_stiff", "Bp", "Bm",
                               "A_mass", "A_stiff", "corr_pp", "corr_mm",
                               "Bp_cells", "Bm_cells", "b_cell", "f1",
                               "f1_row"))
            self.register_operator(op.op)
        elif name == "GridDGOperator":
            self.register_operator(op.st)
            for face in op.faces:
                self.register(face, ("qw", "phi"))
        elif name == "EllMatrix":
            self.register(op, ("vals_mass", "vals_stiff", "cols",
                               "b_flat_idx"))
            self.register_operator(op.op)
        elif name == "GridHeatOperator2":
            self.register(op, ("bands_m", "bands_k", "M1g",
                               "bc_mask", "bc_values", "bc_mask_g",
                               "bc_values_g", "_face_phiphi"))
            for face in op.faces:
                self.register(face, ("qw", "phi"))
            self.register_operator(op.op)
        elif name == "Q2MG":
            self.register_operator(op.fine)
            self.register_operator(op.g1)
            self.register_operator(op.gmg)
        elif name == "GridHeatOperator":
            self.register(op, ("vals_mass", "vals_stiff", "M1g",
                               "crow_mass", "crow_stiff",
                               "crow_dmass", "crow_dstiff",
                               "bc_mask", "bc_values", "bc_mask_g",
                               "bc_values_g"))
            self.register_operator(op.op)
        elif name == "GridElasticityOperator":
            self.register(op, ("pin_mask_g", "qw1", "phi1", "gphi1"))
        elif name == "DGNodeMechAdapter":
            self.register_operator(op.inner)
        elif name == "GridMechanicsCoupling":
            self.register_operator(op.el)
            if op.mg is not None:
                self.register_operator(op.mg)
        elif name == "GridElastMG":
            for lop in op.ops:
                self.register_operator(lop)
            self.register(op, ("_tables", "coarse_inv"))
        elif name == "GridMG":
            self.register(op, ("coarse_inv",))
            for lop in op.ops:
                self.register_operator(lop)
        elif name == "GeometricMG":
            # lattice transfers are strided-slice ops with no tables;
            # only the per-level operators (and the optional frozen dense
            # coarse inverse) carry arrays
            self.register(op, ("coarse_inv",))
            for lvl in op.levels:
                g = op._grid_for(lvl)
                if g is not None:
                    self.register_operator(g)
                st = op._stencil_for(lvl)
                if st is not None:
                    self.register_operator(st)
                self.register_operator(lvl.op)
        elif name == "DGMultigrid":
            self.register(op, ("cells_flat", "inv_counts",
                               "_frozen_smoother_data"))
            self.register_operator(op.stencil)
            self.register_operator(op.dg_op)
            self.register_operator(op.cg_mg)
        elif name == "SmoothedAggregationMG":
            self.register(op, ("levels", "transfers"))
        elif name == "CrossEval":
            self.register(op, ("_tab", "_src_cells"))
        elif name == "ViscoelasticEngine":
            self.register_operator(op.to_sigma)

    # ------------------------------------------------------------------
    def collect(self) -> list:
        return [getattr(o, a) for o, a in self._entries]

    @contextmanager
    def bound(self, values):
        old = [getattr(o, a) for o, a in self._entries]
        for (o, a), v in zip(self._entries, values):
            object.__setattr__(o, a, v)
        try:
            yield
        finally:
            for (o, a), v in zip(self._entries, old):
                object.__setattr__(o, a, v)
