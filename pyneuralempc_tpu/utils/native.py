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

def refine_kkt_point(w0, grad_fn, cons_fn, jac_fn, lag_hess_fn, lb, ub,
                     iters: int = 3, act_tol: float = 1e-6,
                     delta_w: float = 1e-9, delta_c: float = 1e-12):
    """Polish an approximately-optimal point by f64 active-set Newton
    steps on the equality KKT system, using the C++ oracle for the linear
    solves (VERDICT r2 item 5: extend the oracle from direction-checking
    to GOLDEN POLISHING, so scipy SLSQP's line-search floor — its
    status-8 exits on flat arcs — stops limiting the accuracy audit).

    The active set is frozen from ``w0`` (bounds within ``act_tol``
    relative slack become equality rows), then ``iters`` Newton steps on

        [ W   A_extᵀ ] [Δw]    [ g + A_extᵀ λ ]
        [ A_ext   0  ] [Δλ] = −[ c_ext        ]

    with A_ext = [∂C; E_active], c_ext = [C(w); w_act − bound].  Residuals
    and blocks are evaluated in f32 (the SAME f32 NLP the audit compares
    on — an f64-evaluated model would move the optimum itself), the
    elimination in f64.  Near a solution with the correct active set this
    converges quadratically to the f32 NLP's stationary point.

    ``grad_fn(w32)->(n,)``, ``cons_fn(w32)->(m,)``, ``jac_fn(w32)->(m,n)``,
    ``lag_hess_fn(w32, lam32)->(n,n)`` (λ over the m constraint rows).
    Returns the refined float64 ``w``.
    """
    lb = np.asarray(lb, np.float64)
    ub = np.asarray(ub, np.float64)
    w = np.asarray(w0, np.float64).copy()
    n = w.shape[0]
    act_l = np.isfinite(lb) & (w - lb <= act_tol * (1.0 + np.abs(lb)))
    act_u = np.isfinite(ub) & (ub - w <= act_tol * (1.0 + np.abs(ub)))
    act_u &= ~act_l
    act_idx = np.nonzero(act_l | act_u)[0]
    bound_val = np.where(act_l, lb, ub)[act_idx]
    E = np.zeros((len(act_idx), n), np.float32)
    E[np.arange(len(act_idx)), act_idx] = 1.0

    w32 = lambda v: np.asarray(v, np.float32)
    m = np.asarray(cons_fn(w32(w))).shape[0]
    lam_ext = np.zeros(m + len(act_idx), np.float64)
    for _ in range(iters):
        g = np.asarray(grad_fn(w32(w)), np.float64)
        c = np.asarray(cons_fn(w32(w)), np.float64)
        A = np.asarray(jac_fn(w32(w)), np.float64)
        W = np.asarray(lag_hess_fn(w32(w), w32(lam_ext[:m])), np.float64)
        A_ext = np.concatenate([A, E.astype(np.float64)], axis=0)
        r_p = np.concatenate([c, w[act_idx] - bound_val])
        r_t = g + A_ext.T @ lam_ext
        try:
            dw, dlam = solve_kkt_oracle(
                W, np.zeros(n), A_ext, r_t, r_p,
                delta_w=delta_w, delta_c=delta_c)
        except RuntimeError:
            break    # singular (active-set guess degenerate): keep w
        if not (np.all(np.isfinite(dw)) and np.all(np.isfinite(dlam))):
            break
        # cap: refinement must stay a polish, not a restart
        step = float(np.max(np.abs(dw)))
        if step > 0.1 * (1.0 + float(np.max(np.abs(w)))):
            break
        w = np.clip(w + dw, lb, ub)
        w[act_idx] = bound_val           # active rows exactly on the bound
        lam_ext = lam_ext + dlam
    return w
