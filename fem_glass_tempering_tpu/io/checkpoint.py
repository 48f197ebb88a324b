"""Checkpoint / resume of the full simulation state.

The reference has NO checkpointing (SURVEY.md §5 — a run that dies loses
everything). Here: every §2d history field (the ViscoState pytree) + time +
config snapshot goes into one npz; `load_checkpoint` restores a ViscoState
ready to continue stepping. npz keeps it dependency-free and portable;
sharded arrays are gathered to host on save and re-sharded by the caller.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from fem_glass_tempering_tpu.models.viscoelastic import ViscoState


def save_checkpoint(path: str, state: ViscoState, config=None, extra: dict | None = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {f: np.asarray(getattr(state, f))
              for f in ViscoState._fields if getattr(state, f) is not None}
    meta = {"fields": list(arrays)}
    if config is not None:
        meta["config"] = json.loads(config.to_json())
    if extra:
        meta["extra"] = extra
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_checkpoint(path: str, dtype=None):
    """Returns (state, meta). Cast to `dtype` if given."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        kwargs = {}
        for f in ViscoState._fields:
            if f not in z.files:
                continue        # optional field absent (e.g. pre-du file)
            arr = z[f]
            kwargs[f] = jnp.asarray(arr, dtype=dtype) if dtype else jnp.asarray(arr)
    if "du" not in kwargs and "sigma" in kwargs:
        # checkpoints written before the warm-start field: cold-start du
        s = kwargs["sigma"]
        kwargs["du"] = jnp.zeros(s.shape[:-1], dtype=s.dtype)
    return ViscoState(**kwargs), meta
