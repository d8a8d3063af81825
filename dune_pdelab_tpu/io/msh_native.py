"""ctypes binding for the native Gmsh MSH 2.x parser.

Builds io/native/msh_reader.cc on first use (g++, cached as a shared
library next to the source). `SimplexMesh.from_gmsh` uses this path
automatically when the toolchain is available; the pure-Python parser in
mesh/simplex.py remains the dependency-free fallback and both produce
identical arrays (node ids remapped to file row order, elements kept in
file order per type, first physical tag retained).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None


def _native_dir():
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    d = _native_dir()
    src = os.path.join(d, "msh_reader.cc")
    lib = os.path.join(d, "libmshreader.so")
    if (not os.path.exists(lib)
            or os.path.getmtime(lib) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", lib, src],
            check=True, capture_output=True)
    L = ctypes.CDLL(lib)
    i64p = ctypes.POINTER(ctypes.c_int64)
    L.msh_open.restype = ctypes.c_void_p
    L.msh_open.argtypes = [ctypes.c_char_p, i64p, i64p, i64p, i64p,
                           ctypes.POINTER(ctypes.c_int)]
    L.msh_fill.restype = None
    L.msh_fill.argtypes = [ctypes.c_void_p,
                           ctypes.POINTER(ctypes.c_double),
                           i64p, i64p, i64p, i64p, i64p, i64p]
    L.msh_close.restype = None
    L.msh_close.argtypes = [ctypes.c_void_p]
    _LIB = L
    return L


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def parse_msh(path: str):
    """Parse an MSH 2.x ASCII file natively.

    Returns (coords (nn,3) f64, tris (nt,3) i64, tritags (nt,) i64,
    tets (nq,4) i64, tettags (nq,) i64, lines (nl,2) i64, linetags (nl,)
    i64) — the same tuple as the pure-Python parser. Raises IOError with
    the native error code on malformed/unsupported input (callers fall
    back to the Python parser)."""
    L = _load()
    nn = ctypes.c_int64()
    nt = ctypes.c_int64()
    nq = ctypes.c_int64()
    nl = ctypes.c_int64()
    err = ctypes.c_int()
    h = L.msh_open(path.encode(), ctypes.byref(nn), ctypes.byref(nt),
                   ctypes.byref(nq), ctypes.byref(nl), ctypes.byref(err))
    if not h:
        raise IOError(f"native msh parser failed on {path} "
                      f"(code {err.value})")
    try:
        coords = np.empty((nn.value, 3), np.float64)
        tris = np.empty((nt.value, 3), np.int64)
        tritags = np.empty(nt.value, np.int64)
        tets = np.empty((nq.value, 4), np.int64)
        tettags = np.empty(nq.value, np.int64)
        lns = np.empty((nl.value, 2), np.int64)
        lntags = np.empty(nl.value, np.int64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        L.msh_fill(h,
                   coords.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                   tris.ctypes.data_as(i64p), tritags.ctypes.data_as(i64p),
                   tets.ctypes.data_as(i64p), tettags.ctypes.data_as(i64p),
                   lns.ctypes.data_as(i64p), lntags.ctypes.data_as(i64p))
    finally:
        L.msh_close(h)
    return coords, tris, tritags, tets, tettags, lns, lntags
