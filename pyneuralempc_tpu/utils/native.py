"""ctypes binding for the native C++ KKT oracle (csrc/kkt_oracle.cpp).

Builds the shared library on first use (g++, cached next to the source);
exposes :func:`solve_kkt_oracle` for tests to validate the JAX/Pallas KKT
directions against an implementation that shares no code or libraries with
them (no JAX, no scipy, no BLAS).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _build_and_load() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    src = os.path.join(_repo_root(), "csrc", "kkt_oracle.cpp")
    lib_path = os.path.join(_repo_root(), "csrc", "libkkt_oracle.so")
    if (not os.path.exists(lib_path)
            or os.path.getmtime(lib_path) < os.path.getmtime(src)):
        subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-o", lib_path,
                        src], check=True)
    lib = ctypes.CDLL(lib_path)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.solve_kkt_batch.restype = ctypes.c_int
    lib.solve_kkt_batch.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, f32p, f32p, f32p,
        ctypes.c_double, ctypes.c_double, f64p, f64p]
    _LIB = lib
    return lib


def solve_kkt_oracle(W, Sigma, A, r_tilde, r_p, delta_w: float = 0.0,
                     delta_c: float = 0.0) -> Tuple[np.ndarray, np.ndarray]:
    """Solve the condensed KKT system(s) in f64 via the C++ oracle.

    Accepts single ((n,n), (n,), (m,n), (n,), (m,)) or batched
    (leading batch axis) inputs; returns (dw, dlam) as float64.
    """
    lib = _build_and_load()
    W = np.ascontiguousarray(np.asarray(W, np.float32))
    batched = W.ndim == 3
    if not batched:
        W = W[None]
        Sigma = np.asarray(Sigma, np.float32)[None]
        A = np.asarray(A, np.float32)[None]
        r_tilde = np.asarray(r_tilde, np.float32)[None]
        r_p = np.asarray(r_p, np.float32)[None]
    else:
        Sigma = np.ascontiguousarray(np.asarray(Sigma, np.float32))
        A = np.ascontiguousarray(np.asarray(A, np.float32))
        r_tilde = np.ascontiguousarray(np.asarray(r_tilde, np.float32))
        r_p = np.ascontiguousarray(np.asarray(r_p, np.float32))
    B, n, _ = W.shape
    m = A.shape[1]
    dw = np.zeros((B, n), np.float64)
    dlam = np.zeros((B, m), np.float64)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    rc = lib.solve_kkt_batch(
        B, n, m,
        ptr(np.ascontiguousarray(W), ctypes.c_float),
        ptr(Sigma, ctypes.c_float), ptr(A, ctypes.c_float),
        ptr(r_tilde, ctypes.c_float), ptr(r_p, ctypes.c_float),
        float(delta_w), float(delta_c),
        ptr(dw, ctypes.c_double), ptr(dlam, ctypes.c_double))
    if rc != 0:
        raise RuntimeError(f"KKT oracle reported singular system (rc={rc})")
    if not batched:
        return dw[0], dlam[0]
    return dw, dlam
