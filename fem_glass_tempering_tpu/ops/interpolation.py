"""Cross-space pointwise interpolation engine.

TPU-native replacement for dolfinx's `Function.interpolate(Expression)` used
~15x per step by the reference (ThermoViscoProblem.py:455-595, SURVEY.md
§3.5): evaluating a pointwise expression of source fields at the *target*
space's interpolation points and writing the target dofs.

Design: at setup we give every target scalar dof a unique owner
(cell, local interpolation point) — FunctionSpace.owner_cell/owner_lpoint —
so interpolation is a pure gather + small contraction with NO scatter and no
write conflicts. For CG targets fed by discontinuous expressions (e.g.
thermal strain of a DG temperature, reference ViscoelasticModel.py:128-133)
this reproduces dolfinx's last-cell-wins overwrite deterministically.

Fast path: when source and target share the same space, Lagrange nodal
interpolation is the identity on dof arrays, so the expression becomes a
plain pointwise jnp function — these all fuse into one XLA kernel.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from fem_glass_tempering_tpu.fem.functionspace import FunctionSpace


@dataclass
class CrossEval:
    """Evaluator of source-space fields at a target space's owned
    interpolation points."""

    target: FunctionSpace
    sources: dict                       # name -> FunctionSpace
    _tab: dict = field(default_factory=dict)      # name -> (n_t, nloc_s) jnp
    _src_cells: dict = field(default_factory=dict)  # name -> (n_t, nloc_s) int32 dof gather

    def same_space(self, name: str) -> bool:
        src = self.sources[name]
        t = self.target
        return (src.mesh is t.mesh and src.family == t.family
                and src.degree == t.degree)

    def eval(self, name: str, dofs: jnp.ndarray) -> jnp.ndarray:
        """Evaluate source field `dofs` ((n_src_sdofs, *vshape)) at the
        target's owned points -> (n_target_sdofs, *vshape)."""
        if self.same_space(name):
            return dofs
        src_vals = dofs[self._src_cells[name]]     # (n_t, nloc_s, *v)
        # cast the (f64-built) tabulation to the field dtype so f32 perf
        # mode stays f32 end to end (cast folds at compile time)
        tab = self._tab[name].astype(dofs.dtype)   # (n_t, nloc_s)
        return jnp.einsum("tl,tl...->t...", tab, src_vals)


def build_cross_eval(target: FunctionSpace, sources: dict) -> CrossEval:
    ce = CrossEval(target=target, sources=dict(sources))
    ipts = target.element.interpolation_points()   # (nloc_t, tdim)
    oc = target.owner_cell                         # (n_t,)
    olp = target.owner_lpoint
    for name, src in sources.items():
        if ce.same_space(name):
            continue
        tab_full = src.element.tabulate(ipts)      # (nloc_t, nloc_s)
        ce._tab[name] = jnp.asarray(tab_full[olp])           # (n_t, nloc_s)
        ce._src_cells[name] = jnp.asarray(src.dofmap[oc], dtype=jnp.int32)
    return ce
