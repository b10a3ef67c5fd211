"""ctypes bindings to the native C++ tier (``native/ldpcnative.cpp``).

Provides fast PEG construction and alist parsing for code sizes where the
Python implementations are too slow (DVB-S2 class, n = 64800).  The shared
library is built on demand with the system toolchain; every entry point has
a pure-Python fallback, so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

from .codes.alist import Alist

__all__ = ["available", "build", "peg_native", "parse_alist_native"]

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libldpcnative.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def build(quiet: bool = True) -> bool:
    """Compile the shared library (idempotent).  Returns success."""
    src = os.path.join(_NATIVE_DIR, "ldpcnative.cpp")
    if not os.path.exists(src):
        return False
    if os.path.exists(_LIB_PATH) and os.path.getmtime(
        _LIB_PATH
    ) >= os.path.getmtime(src):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o",
             _LIB_PATH, src],
            check=True,
            capture_output=quiet,
            timeout=300,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        return False


def _get() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            return None
        _tried = True
        if not build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.peg_construct.argtypes = [
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_uint64, i32p,
        ]
        lib.peg_construct.restype = ctypes.c_int
        lib.alist_parse_fill.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, i32p, i32p, i32p, i32p, i32p, i32p,
        ]
        lib.alist_parse_fill.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _get() is not None


def peg_native(n: int, m: int, dv: int, seed: int = 0) -> Alist:
    """PEG construction in C++ (same algorithm family as codes.construct.peg;
    independent RNG, so outputs differ from the Python backend for the same
    seed — both satisfy the PEG invariants)."""
    lib = _get()
    if lib is None:
        raise RuntimeError("native library unavailable; run native.build()")
    out = np.zeros(n * dv, np.int32)
    rc = lib.peg_construct(
        n, m, dv, seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise RuntimeError(f"peg_construct failed rc={rc}")
    nlist: List[List[int]] = [
        sorted(int(c) for c in out[v * dv : (v + 1) * dv]) for v in range(n)
    ]
    mlist: List[List[int]] = [[] for _ in range(m)]
    for v in range(n):
        for c in nlist[v]:
            mlist[c].append(v)
    return Alist(n=n, m=m, nlist=nlist, mlist=mlist)


def parse_alist_native(text: str, nonbinary: bool = False) -> Alist:
    """Alist parse through the C++ tokenizer (≈20x the Python parser)."""
    lib = _get()
    if lib is None:
        raise RuntimeError("native library unavailable; run native.build()")
    raw = text.encode()
    head = text.split("\n", 2)
    h0 = [int(x) for x in head[0].split()]
    if nonbinary or len(h0) >= 3:
        nonbinary = True
        n, m, q = h0[:3]
    else:
        n, m = h0[:2]
        q = 0
    h1 = [int(x) for x in head[1].split()]
    dv_max, dc_max = h1[0], h1[1]
    i32 = ctypes.POINTER(ctypes.c_int32)
    n_deg = np.zeros(n, np.int32)
    m_deg = np.zeros(m, np.int32)
    n_idx = np.zeros(n * dv_max, np.int32)
    n_val = np.zeros(n * dv_max, np.int32)
    m_idx = np.zeros(m * dc_max, np.int32)
    m_val = np.zeros(m * dc_max, np.int32)
    rc = lib.alist_parse_fill(
        raw, len(raw), 1 if nonbinary else 0, n, m, dv_max, dc_max, q,
        n_deg.ctypes.data_as(i32), m_deg.ctypes.data_as(i32),
        n_idx.ctypes.data_as(i32), n_val.ctypes.data_as(i32),
        m_idx.ctypes.data_as(i32), m_val.ctypes.data_as(i32),
    )
    if rc != 0:
        raise ValueError(f"alist_parse_fill failed rc={rc}")
    n_idx = n_idx.reshape(n, dv_max)
    n_val = n_val.reshape(n, dv_max)
    m_idx = m_idx.reshape(m, dc_max)
    m_val = m_val.reshape(m, dc_max)
    nlist = [
        [int(x) for x in n_idx[v, : n_deg[v]]] for v in range(n)
    ]
    mlist = [
        [int(x) for x in m_idx[c, : m_deg[c]]] for c in range(m)
    ]
    nvals = mvals = None
    if nonbinary:
        nvals = [[int(x) for x in n_val[v, : n_deg[v]]] for v in range(n)]
        mvals = [[int(x) for x in m_val[c, : m_deg[c]]] for c in range(m)]
    return Alist(
        n=n, m=m, nlist=nlist, mlist=mlist, q=q, nvals=nvals, mvals=mvals
    )
