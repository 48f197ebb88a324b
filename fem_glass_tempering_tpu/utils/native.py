"""ctypes bindings for the native runtime library (csrc/runtime.cpp).

The library provides native fast paths for setup-time runtime work the
reference delegates to the dolfinx C++ core (SURVEY.md §2b): facet
connectivity, gmsh parsing, BFS partitioning. Every entry point degrades
gracefully to the numpy implementation when the shared library has not been
built — build it with `make -C csrc` or
`python -m fem_glass_tempering_tpu.utils.build_native`.

Outputs are bit-identical to the numpy fallbacks (both normalize ordering),
so switching paths never perturbs downstream results.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_SRC_DIR, "libfgtruntime.so")


class _FacetResult(ctypes.Structure):
    _fields_ = [
        ("boundary", ctypes.POINTER(ctypes.c_int32)),
        ("n_boundary", ctypes.c_int64),
        ("interior", ctypes.POINTER(ctypes.c_int32)),
        ("n_interior", ctypes.c_int64),
        ("status", ctypes.c_int32),
    ]


class _MshResult(ctypes.Structure):
    _fields_ = [
        ("nodes", ctypes.POINTER(ctypes.c_double)),
        ("n_nodes", ctypes.c_int64),
        ("cells", ctypes.POINTER(ctypes.c_int32)),
        ("n_cells", ctypes.c_int64),
        ("etype", ctypes.c_int32),
        ("status", ctypes.c_int32),
    ]


class _MshResult2(ctypes.Structure):
    _fields_ = [
        ("nodes", ctypes.POINTER(ctypes.c_double)),
        ("n_nodes", ctypes.c_int64),
        ("cells", ctypes.POINTER(ctypes.c_int32)),
        ("n_cells", ctypes.c_int64),
        ("etype", ctypes.c_int32),
        ("cell_tags", ctypes.POINTER(ctypes.c_int32)),
        ("facet_verts", ctypes.POINTER(ctypes.c_int32)),
        ("facet_tags", ctypes.POINTER(ctypes.c_int32)),
        ("n_facet_elems", ctypes.c_int64),
        ("facet_nv", ctypes.c_int32),
        ("status", ctypes.c_int32),
    ]


def build_native_lib(verbose: bool = False, out_path: str | None = None) -> bool:
    """Compile csrc/runtime.cpp -> libfgtruntime.so (or `out_path`).
    Returns success."""
    try:
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-o", out_path or _LIB_PATH,
               os.path.join(_SRC_DIR, "runtime.cpp")]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if verbose and r.returncode != 0:
            print(r.stderr)
        return r.returncode == 0
    except Exception:
        return False


def _bind_base(lib) -> None:
    lib.build_facets.restype = ctypes.POINTER(_FacetResult)
    lib.build_facets.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
    ]
    lib.free_facet_result.argtypes = [ctypes.POINTER(_FacetResult)]
    lib.parse_msh.restype = ctypes.POINTER(_MshResult)
    lib.parse_msh.argtypes = [ctypes.c_char_p]
    lib.free_msh_result.argtypes = [ctypes.POINTER(_MshResult)]


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_LIB_PATH):
        # auto-build once if the toolchain is present (cheap, ~1 s)
        if not build_native_lib():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    _bind_base(lib)
    if not hasattr(lib, "parse_msh2"):
        # Stale library predating the physical-groups parser: rebuild to a
        # FRESH filename and dlopen that. Rebuilding in place and
        # re-dlopening the same path can return the already-mapped old
        # image (dlopen caches by path/inode when the compiler truncates
        # in place), which would silently disable every native fast path
        # for the session; a new path always maps the new image.
        fresh = _LIB_PATH + ".rebuilt"
        lib2 = None
        if build_native_lib(out_path=fresh):
            try:
                lib2 = ctypes.CDLL(fresh)
            except OSError:
                lib2 = None
        if lib2 is not None and hasattr(lib2, "parse_msh2"):
            _bind_base(lib2)
            lib = lib2
            # promote the rebuilt library so future processes load it
            try:
                os.replace(fresh, _LIB_PATH)
            except OSError:
                pass
        # else: keep the OLD handle for the symbols it does have (the
        # msh2/partition entry points are hasattr-guarded below and in
        # their wrappers) instead of disabling all native fast paths
    if hasattr(lib, "parse_msh2"):
        lib.parse_msh2.restype = ctypes.POINTER(_MshResult2)
        lib.parse_msh2.argtypes = [ctypes.c_char_p]
        lib.free_msh_result2.argtypes = [ctypes.POINTER(_MshResult2)]
    if hasattr(lib, "partition_bfs"):
        lib.partition_bfs.restype = ctypes.c_int32
        lib.partition_bfs.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def native_build_facets(cells: np.ndarray, ref_cell):
    """Native facet connectivity; returns the 6 arrays of
    Mesh._build_facets or None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    nfv = len(ref_cell.facets[0])
    if nfv > 4:
        return None
    cells = np.ascontiguousarray(cells, dtype=np.int32)
    fdef = np.ascontiguousarray(
        np.array(ref_cell.facets, dtype=np.int32))
    res = lib.build_facets(
        cells.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cells.shape[0], cells.shape[1],
        fdef.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        fdef.shape[0], fdef.shape[1])
    try:
        r = res.contents
        if r.status != 0:
            raise ValueError("facet with more than 2 incident cells")
        nb, ni = int(r.n_boundary), int(r.n_interior)
        b = np.ctypeslib.as_array(r.boundary, shape=(max(nb, 1), 2))[:nb].copy()
        i = np.ctypeslib.as_array(r.interior, shape=(max(ni, 1), 4))[:ni].copy()
    finally:
        lib.free_facet_result(res)
    return (b[:, 0], b[:, 1], i[:, 0], i[:, 1], i[:, 2], i[:, 3])


def native_parse_msh(path: str):
    """Native gmsh 4.1 parser; returns (nodes (n,3), cells, gmsh_etype) or
    None."""
    lib = _load()
    if lib is None:
        return None
    res = lib.parse_msh(path.encode())
    try:
        r = res.contents
        if r.status != 0:
            return None
        nn, nc = int(r.n_nodes), int(r.n_cells)
        nv = {1: 2, 2: 3, 3: 4, 4: 4, 5: 8}[int(r.etype)]
        nodes = np.ctypeslib.as_array(r.nodes, shape=(nn, 3)).copy()
        cells = np.ctypeslib.as_array(r.cells, shape=(nc, nv)).copy()
        etype = int(r.etype)
    finally:
        lib.free_msh_result(res)
    return nodes, cells, etype


def native_parse_msh2(path: str):
    """Native gmsh 4.1 parser with physical groups; returns
    (nodes (n,3), cells, gmsh_etype, cell_tags (n_cells,) or None,
    facet_verts (n_fel, fnv) or None, facet_tags (n_fel,) or None),
    or None if the library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "parse_msh2"):
        return None
    res = lib.parse_msh2(path.encode())
    try:
        r = res.contents
        if r.status != 0:
            return None
        nn, nc = int(r.n_nodes), int(r.n_cells)
        nv = {1: 2, 2: 3, 3: 4, 4: 4, 5: 8}[int(r.etype)]
        nodes = np.ctypeslib.as_array(r.nodes, shape=(nn, 3)).copy()
        cells = np.ctypeslib.as_array(r.cells, shape=(nc, nv)).copy()
        etype = int(r.etype)
        cell_tags = np.ctypeslib.as_array(
            r.cell_tags, shape=(nc,)).copy() if nc else None
        nfe, fnv = int(r.n_facet_elems), int(r.facet_nv)
        if nfe > 0:
            f_verts = np.ctypeslib.as_array(
                r.facet_verts, shape=(nfe, fnv)).copy()
            f_tags = np.ctypeslib.as_array(
                r.facet_tags, shape=(nfe,)).copy()
            keep = f_tags >= 0
            f_verts, f_tags = f_verts[keep], f_tags[keep]
        else:
            f_verts = f_tags = None
    finally:
        lib.free_msh_result2(res)
    return nodes, cells, etype, cell_tags, f_verts, f_tags


def native_partition_bfs(mesh, n_parts: int):
    """Greedy-BFS contiguous partition over facet adjacency; returns
    (n_cells,) part ids or None."""
    lib = _load()
    if lib is None or not hasattr(lib, "partition_bfs"):
        return None
    inter = np.ascontiguousarray(
        np.stack([mesh.interior_cell_p, mesh.interior_local_facet_p,
                  mesh.interior_cell_m, mesh.interior_local_facet_m],
                 axis=1).astype(np.int32))
    out = np.empty(mesh.n_cells, dtype=np.int32)
    rc = lib.partition_bfs(
        inter.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        inter.shape[0], mesh.n_cells, n_parts,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        return None
    return out


if __name__ == "__main__":
    ok = build_native_lib(verbose=True)
    print(f"native build: {'ok' if ok else 'FAILED'} -> {_LIB_PATH}")
