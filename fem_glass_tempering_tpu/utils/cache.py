"""Persistent XLA compilation cache (AOT across processes).

Cold start at the 1M-dof production size costs minutes of XLA compile
through the remote-TPU tunnel (BENCH.md round 2: 182 s compile on top of
setup). The persistent cache serializes compiled executables keyed by
HLO hash, so every process after the first loads the binary instead of
recompiling — call `enable_persistent_cache()` before building problems
(bench.py, the CLI, and the examples do)."""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    import jax

    if path is None:
        path = os.environ.get(
            "FGT_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took meaningful compile time
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except AttributeError:
        pass
    return path
