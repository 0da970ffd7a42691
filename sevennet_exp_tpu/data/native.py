"""ctypes bindings for the native (C++) graph builder (runtime/).

Compiled on first use with g++ (no pybind11 in this environment; the
C ABI + ctypes replaces torch extension machinery). Falls back to the
scipy implementation when the toolchain or .so is unavailable; disable
via SEVENN_NO_NATIVE=1.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False

_RUNTIME_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    ))), 'runtime',
)
_SO_PATH = os.path.join(_RUNTIME_DIR, 'libsevenn_native.so')
_SRC_PATH = os.path.join(_RUNTIME_DIR, 'neighbor.cpp')


def _build_library() -> Optional[str]:
    if not os.path.exists(_SRC_PATH):
        return None
    try:
        subprocess.run(
            ['g++', '-O3', '-shared', '-fPIC', _SRC_PATH,
             '-o', _SO_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return _SO_PATH
    except Exception:
        return None


def get_library():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get('SEVENN_NO_NATIVE'):
        return None
    path = _SO_PATH if os.path.exists(_SO_PATH) else _build_library()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        fn = lib.sevenn_neighbor_list
        fn.restype = ctypes.c_int64
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_double, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_neighbor_list(
    pos: np.ndarray, cell: np.ndarray, pbc, cutoff: float,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    lib = get_library()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    cell = np.ascontiguousarray(cell, dtype=np.float64)
    pbc_arr = np.ascontiguousarray(
        np.asarray(pbc, dtype=bool).astype(np.uint8)
    )
    n = len(pos)
    # generous first guess; retry on overflow with the exact size
    vol = abs(np.linalg.det(cell))
    density = n / vol if vol > 1e-12 else 0.05
    cap = int(max(1024, n * (density * 4.2 * cutoff ** 3 * 1.5 + 20)))
    for _ in range(3):
        out_i = np.empty(cap, dtype=np.int32)
        out_j = np.empty(cap, dtype=np.int32)
        out_vec = np.empty((cap, 3), dtype=np.float64)
        out_shift = np.empty((cap, 3), dtype=np.int32)
        res = lib.sevenn_neighbor_list(
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(n),
            cell.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            pbc_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_double(cutoff), ctypes.c_int64(cap),
            out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_j.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_vec.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out_shift.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if res >= 0:
            e = int(res)
            return (out_i[:e].astype(np.int64),
                    out_j[:e].astype(np.int64),
                    out_vec[:e], out_shift[:e].astype(np.int64))
        cap = int(-res) + 16
    return None
