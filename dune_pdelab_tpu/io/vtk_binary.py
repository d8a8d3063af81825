"""ctypes binding for the native binary .vtu writer.

Builds io/native/vtu_writer.cc on first use (g++, cached as a shared
library next to the source) and exposes `write_vtu_binary`. The plain-ascii
`io.vtk.VTKWriter` remains the dependency-free fallback; `VTKWriter.write`
uses this path automatically when `binary=True` and the toolchain is
available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_VTK_CELL = {2: 9, 3: 12}


def _native_dir():
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    d = _native_dir()
    src = os.path.join(d, "vtu_writer.cc")
    lib = os.path.join(d, "libvtuwriter.so")
    if (not os.path.exists(lib)
            or os.path.getmtime(lib) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", lib, src],
            check=True, capture_output=True)
    L = ctypes.CDLL(lib)
    c_dp = ctypes.POINTER(ctypes.c_double)
    L.write_vtu_binary.restype = ctypes.c_int
    L.write_vtu_binary.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64, c_dp,
        ctypes.c_int64, ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_uint8,
        ctypes.c_int, ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(c_dp),
        ctypes.c_int, ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(c_dp),
    ]
    _LIB = L
    return L


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _field_args(fields: dict):
    names = []
    comps = []
    datas = []
    keep = []   # keep refs alive
    c_dp = ctypes.POINTER(ctypes.c_double)
    for name, a in fields.items():
        a = np.ascontiguousarray(np.asarray(a, np.float64))
        keep.append(a)
        names.append(name.encode())
        comps.append(a.shape[1] if a.ndim > 1 else 1)
        datas.append(a.ctypes.data_as(c_dp))
    n = len(names)
    return (n,
            (ctypes.c_char_p * max(n, 1))(*names),
            (ctypes.c_int * max(n, 1))(*comps),
            (c_dp * max(n, 1))(*datas),
            keep)


def write_vtu_binary(path: str, points: np.ndarray, conn: np.ndarray,
                     celltype: int, point_data: dict, cell_data: dict) -> str:
    """points (np, 3) float64; conn (nc, ncorners) int64; data dicts of
    (n,) or (n, ncomp) arrays."""
    L = _load()
    if not path.endswith(".vtu"):
        path = path + ".vtu"
    points = np.ascontiguousarray(np.asarray(points, np.float64))
    conn = np.ascontiguousarray(np.asarray(conn, np.int64))
    npf, pn, pc, pd, keep1 = _field_args(point_data)
    ncf, cn, cc, cd, keep2 = _field_args(cell_data)
    rc = L.write_vtu_binary(
        path.encode(),
        points.shape[0], points.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        conn.shape[0], conn.shape[1],
        conn.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        celltype,
        npf, pn, pc, pd, ncf, cn, cc, cd)
    if rc != 0:
        raise IOError(f"native vtu writer failed with code {rc}")
    return path
