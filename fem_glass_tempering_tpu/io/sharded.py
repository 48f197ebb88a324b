"""Per-shard streaming output + checkpointing for GSPMD-sharded states.

The reference writes per-rank ADIOS2 streams every step
(/root/reference/ThermoViscoProblem.py:246-263): each MPI rank streams
its own slab, nothing is gathered. This module is that pattern for the
GSPMD path (parallel/grid_shard.py): every snapshot writes ONE .npz
piece per addressable shard containing only that device's slab of each
field (a device->host copy of the local shard — no cross-device gather,
no full-array host buffer), plus a JSON index. In a multi-controller
run each process writes only its addressable shards, so the scheme is
multihost-correct by construction.

`read_sharded_series` reassembles (for analysis/tests);
`load_sharded_checkpoint` re-places pieces directly onto the target
mesh via jax.make_array_from_callback — resume never materializes the
global array on one host.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from fem_glass_tempering_tpu.models.viscoelastic import ViscoState


def _piece_name(field: str, step: int, off: int) -> str:
    return f"piece_{field}_{step:06d}_o{off:06d}.npz"


class ShardedSeriesWriter:
    """Streaming per-shard snapshot writer for grid-shaped ViscoStates.

    `cell_grid`/`cell_pad0`/`cell_fields` describe the DG layout: T-space
    fields of a sharded-DG state live CELL-grid-shaped (cx, cy, cz, nloc)
    with their own ghost-layer pad (parallel/grid_shard.py cell_pad0),
    while sigma-space fields stay node-grid-shaped — the reader trims and
    reshapes per field."""

    def __init__(self, out_dir: str, fields: tuple = ("T", "Tf", "sigma"),
                 grid: tuple | None = None, pad0: int = 0,
                 cell_grid: tuple | None = None, cell_pad0: int = 0,
                 cell_fields: tuple = (), cell_local_axis: bool = True):
        self.dir = out_dir
        self.fields = tuple(fields)
        self.grid = tuple(grid) if grid is not None else None
        self.pad0 = int(pad0)
        self.cell_grid = tuple(cell_grid) if cell_grid is not None else None
        self.cell_pad0 = int(cell_pad0)
        self.cell_fields = tuple(cell_fields)
        # DG cell grids carry a trailing local-dof axis; Q2 lattice
        # grids do not (the flat layout is just the C-order lattice)
        self.cell_local_axis = bool(cell_local_axis)
        self.times: list[float] = []
        os.makedirs(out_dir, exist_ok=True)

    def write(self, t: float, state: ViscoState) -> None:
        k = len(self.times)
        self.times.append(float(t))
        for f in self.fields:
            arr = getattr(state, f)
            for s in arr.addressable_shards:
                off = s.index[0].start or 0
                np.savez(os.path.join(self.dir, _piece_name(f, k, off)),
                         data=np.asarray(s.data), offset=off, t=float(t))

    def close(self) -> None:
        idx = {"fields": list(self.fields), "times": self.times,
               "n_steps": len(self.times), "grid": self.grid,
               "pad0": self.pad0,
               "cell_grid": self.cell_grid,
               "cell_pad0": self.cell_pad0,
               "cell_fields": list(self.cell_fields),
               "cell_local_axis": self.cell_local_axis,
               "process_count": jax.process_count()}
        # one index per process; process 0's is authoritative for times
        name = ("index.json" if jax.process_index() == 0
                else f"index_p{jax.process_index()}.json")
        with open(os.path.join(self.dir, name), "w") as fh:
            json.dump(idx, fh)


def read_sharded_series(out_dir: str, flat: bool = True) -> dict:
    """Reassemble a sharded series directory. Returns {'times': (k,),
    '<field>': (k, n, ...)}: pieces concatenated along grid axis 0,
    ghost padding trimmed, and (with flat=True) reshaped to the flat
    dof-vector layout of the single-device writers."""
    with open(os.path.join(out_dir, "index.json")) as fh:
        idx = json.load(fh)
    grid = tuple(idx["grid"]) if idx["grid"] else None
    pad0 = idx["pad0"]
    cell_grid = (tuple(idx["cell_grid"])
                 if idx.get("cell_grid") else None)
    cell_pad0 = idx.get("cell_pad0", 0)
    cell_fields = set(idx.get("cell_fields", ()))
    out = {"times": np.asarray(idx["times"])}
    for f in idx["fields"]:
        is_cell = f in cell_fields
        f_grid = cell_grid if is_cell else grid
        f_pad = cell_pad0 if is_cell else pad0
        # DG cell-grid fields carry a trailing local-dof axis before any
        # tensor axes — the flat layout is (cells*nloc, ...extra); Q2
        # lattice fields do not (cell_local_axis=False)
        loc = 1 if idx.get("cell_local_axis", True) else 0
        f_glen = (len(f_grid) + loc if (is_cell and f_grid is not None)
                  else (len(f_grid) if f_grid is not None else None))
        steps = []
        for k in range(idx["n_steps"]):
            names = sorted(n for n in os.listdir(out_dir)
                           if n.startswith(f"piece_{f}_{k:06d}_"))
            pieces = []
            for n in names:
                with np.load(os.path.join(out_dir, n)) as z:
                    pieces.append(z["data"])
            g = np.concatenate(pieces, axis=0)
            if f_pad:
                g = g[:-f_pad]
            if flat and f_glen is not None:
                extra = g.shape[f_glen:]
                g = g.reshape((-1,) + extra)
            steps.append(g)
        out[f] = np.stack(steps)
    return out


# ---------------------------------------------------------------------
def save_sharded_checkpoint(out_dir: str, state: ViscoState,
                            extra: dict | None = None) -> None:
    """One piece file per addressable shard per field + meta.json —
    checkpointing without a global gather."""
    os.makedirs(out_dir, exist_ok=True)
    shapes = {}
    for f in ViscoState._fields:
        arr = getattr(state, f)
        if arr is None:
            continue
        shapes[f] = list(np.shape(arr))
        if f == "t":
            if jax.process_index() == 0:
                np.savez(os.path.join(out_dir, _piece_name(f, 0, 0)),
                         data=np.asarray(arr), offset=0)
            continue
        for s in arr.addressable_shards:
            off = s.index[0].start or 0
            np.savez(os.path.join(out_dir, _piece_name(f, 0, off)),
                     data=np.asarray(s.data), offset=off)
    if jax.process_index() == 0:
        meta = {"fields": list(shapes), "shapes": shapes,
                "extra": extra or {}}
        with open(os.path.join(out_dir, "meta.json"), "w") as fh:
            json.dump(meta, fh)


def load_sharded_checkpoint(out_dir: str, shardings, dtype=None):
    """Restore a ViscoState directly onto the device mesh: each field is
    built with jax.make_array_from_callback reading only the piece files
    that cover the requested index — no host-global array.

    `shardings`: a ViscoState of jax.sharding.Sharding (e.g.
    GridShardedProblem._state_shardings)."""
    with open(os.path.join(out_dir, "meta.json")) as fh:
        meta = json.load(fh)

    def load_field(f, sharding):
        shape = tuple(meta["shapes"][f])
        names = sorted(n for n in os.listdir(out_dir)
                       if n.startswith(f"piece_{f}_000000_"))
        offs, arrs = [], {}
        for n in names:
            with np.load(os.path.join(out_dir, n)) as z:
                off = int(z["offset"])
                offs.append(off)
                arrs[off] = z["data"]
        offs.sort()

        def cb(index):
            if not shape:
                return arrs[0][()]
            sl0 = index[0] if index else slice(None)
            start = sl0.start or 0
            stop = sl0.stop if sl0.stop is not None else shape[0]
            # collect covering pieces
            parts = []
            for off in offs:
                a = arrs[off]
                end = off + a.shape[0]
                if end <= start or off >= stop:
                    continue
                parts.append(a[max(start - off, 0):stop - off])
            out = parts[0] if len(parts) == 1 else np.concatenate(parts, 0)
            rest = tuple(index[1:]) if index else ()
            out = out[(slice(None),) + rest] if rest else out
            return out.astype(dtype) if dtype else out

        return jax.make_array_from_callback(shape, sharding, cb)

    kwargs = {f: load_field(f, getattr(shardings, f))
              for f in ViscoState._fields
              if f in meta["shapes"] and getattr(shardings, f) is not None}
    return ViscoState(**kwargs), meta
