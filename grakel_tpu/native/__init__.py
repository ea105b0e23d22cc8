"""Native (C++) host components, compiled on demand with g++ and loaded
via ctypes.  These cover the combinatorial algorithms that are
anti-XLA-shaped (recursive backtracking): where the reference ships
Cython/C++ extensions, grakel_tpu builds equivalent native code here.

Falls back to pure-Python implementations when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile

import numpy as np

__all__ = ["clique_values", "have_native"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src")
_LIB_PATH = os.path.join(_HERE, "_libgrakel_native.so")
_lib = None
_tried = False


def _build():
    srcs = [os.path.join(_SRC, "clique_kernel.cpp")]
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB_PATH] + srcs
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < max(
                    os.path.getmtime(os.path.join(_SRC, f))
                    for f in os.listdir(_SRC))):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.clique_values.argtypes = [
            ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")]
        lib.clique_values.restype = None
        _lib = lib
    except Exception:  # pragma: no cover - no compiler / load failure
        _lib = None
    return _lib


def have_native():
    return _load() is not None


def _clique_values_py(nv, kmax, cv, ce, tv):
    """Pure-Python fallback with identical enumeration semantics."""
    def expand(value, clique, P, D):
        for pi, v in enumerate(P):
            ev = ce[v]
            val = value * cv[v]
            for m in clique:
                val *= abs(ev[m])
            tv[len(clique)] += val
            if len(clique) + 1 < kmax:
                newP = [w for w in P[pi + 1:] if ev[w] != 0.0]
                newD = []
                for w in D:
                    if ev[w] > 0.0:
                        newP.append(w)
                    elif ev[w] < 0.0:
                        newD.append(w)
                clique.append(v)
                expand(val, clique, newP, newD)
                clique.pop()

    for i in range(nv):
        tv[0] += cv[i]
        if kmax > 1:
            ei = ce[i]
            P = [j for j in range(i + 1, nv) if ei[j] > 0.0]
            D = [j for j in range(i + 1, nv) if ei[j] < 0.0]
            expand(cv[i], [i], P, D)


def clique_values(cv, ce, kmax):
    """tv[s] = sum over enumerated (s+1)-cliques of
    prod(cv) * prod(|ce|); returns array of length kmax + 1."""
    cv = np.ascontiguousarray(cv, np.float64)
    ce = np.ascontiguousarray(ce, np.float64)
    nv = cv.shape[0]
    tv = np.zeros(kmax + 1, np.float64)
    lib = _load()
    if lib is not None:
        lib.clique_values(nv, kmax, cv, ce.reshape(-1), tv)
    else:
        _clique_values_py(nv, kmax, cv, ce, tv)
    return tv
