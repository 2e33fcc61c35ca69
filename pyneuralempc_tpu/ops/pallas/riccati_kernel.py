"""Fused batched Riccati sweep as a Pallas TPU kernel.

The structured KKT solve (solve/riccati.py) is a backward + forward scan of
tiny matrix ops — exactly the shape XLA handles worst on TPU: H sequential
steps of (B, n, n) matmuls with n ∈ {2..6}, each far below MXU tile size, so
the scan becomes launch/latency-bound.  This kernel fuses the *entire*
sweep (all H stages, both directions, the δ-regularised stage Cholesky and
the ok-mask) into one Pallas program with the batch laid out on the VPU
tile: 1024 problems per grid step as an (8, 128) tile per matrix element,
so every vector op runs at full VPU width and all stage state lives in
VMEM/registers.

Layout: ``(rows, G, 8, 128)`` where rows flattens (t, i, j) and G indexes
1024-problem groups; the grid runs over G.  The per-stage loop is a Python
unroll (H is static), so the whole sweep is straight-line vector code.

Bound to the solver via ``jax.custom_batching.custom_vmap``
(:func:`riccati_sweep_custom`): the unbatched call is the lax.scan
reference; under ``vmap`` the batch dispatches here when (a) running on
TPU, (b) nu == 1 (scalar stage Cholesky), and (c) the working set fits
VMEM — otherwise it falls back to the vmapped scan.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_TILE = 1024          # problems per grid step: one (8, 128) f32 tile each
_VMEM_BUDGET = 10 * 1024 * 1024


def _kernel_fits(H: int, nx: int, nu: int) -> bool:
    if nu != 1:
        return False
    ns = nx + nu
    rows = H * (2 * nx * nx + 2 * ns * ns + 2 * nx + 2 * nu + nx + 3)
    return rows * 4096 < _VMEM_BUDGET


def _sweep_kernel(H, nx, A_ref, B_ref, G_ref, M_ref, mx_ref, mu_ref, c_ref,
                  delta_ref, dX_ref, dU_ref, dLam_ref, ok_ref,
                  Kc, kc, Pbarc, pbarc, Mxuc):
    """One 1024-problem tile; every variable below is an (8, 128) tile.

    Ref row layouts (leading axis; trailing dims are (1, 8, 128)):
      A: (t, i, j) -> t*nx*nx + i*nx + j         G/M: t*ns*ns + i*ns + j
      mx/c: t*nx + i     mu: t      scratch K: t*nx + j, k: t,
      Pbar: t*nx*nx + i*nx + j, pbar: t*nx + i, Mxu: t*nx + i
    """
    ns = nx + 1

    def a(t, i, j):
        return A_ref[t * nx * nx + i * nx + j, 0]

    def b(t, i):
        return B_ref[t * nx + i, 0]

    def g(t, i, j):
        return G_ref[t * ns * ns + i * ns + j, 0]

    def m(t, i, j):
        return M_ref[t * ns * ns + i * ns + j, 0]

    delta = delta_ref[0, 0]
    zero = jnp.zeros_like(delta)

    # ---- backward sweep (unrolled, t = H-1 .. 0) ----
    P = [[zero for _ in range(nx)] for _ in range(nx)]
    p = [zero for _ in range(nx)]
    ok = jnp.ones_like(delta)

    for t in range(H - 1, -1, -1):
        Pbar = [[P[i][j] + m(t, i, j) + (delta if i == j else zero)
                 for j in range(nx)] for i in range(nx)]
        pbar = [p[i] + mx_ref[t * nx + i, 0] for i in range(nx)]
        Mxu = [m(t, i, nx) for i in range(nx)]

        PA = [[sum(Pbar[i][k] * a(t, k, j) for k in range(nx))
               for j in range(nx)] for i in range(nx)]
        PB = [sum(Pbar[i][k] * b(t, k) for k in range(nx))
              for i in range(nx)]
        Qxx = [[sum(a(t, k, i) * PA[k][j] for k in range(nx)) + g(t, i, j)
                for j in range(nx)] for i in range(nx)]
        BtMxu = sum(b(t, k) * Mxu[k] for k in range(nx))
        Quu = (sum(b(t, k) * PB[k] for k in range(nx))
               + m(t, nx, nx) + delta + 2.0 * BtMxu + g(t, nx, nx))
        Qux = [sum(b(t, k) * PA[k][j] for k in range(nx))
               + sum(Mxu[k] * a(t, k, j) for k in range(nx))
               + g(t, nx, j) for j in range(nx)]
        Pc_p = [sum(Pbar[i][k] * c_ref[t * nx + k, 0] for k in range(nx))
                + pbar[i] for i in range(nx)]
        qx = [sum(a(t, k, i) * Pc_p[k] for k in range(nx))
              for i in range(nx)]
        qu = (sum(b(t, k) * Pc_p[k] for k in range(nx))
              + sum(Mxu[k] * c_ref[t * nx + k, 0] for k in range(nx))
              + mu_ref[t, 0])

        ok = ok * jnp.where(Quu > 1e-12, 1.0, 0.0)
        inv = jnp.where(Quu > 1e-12, 1.0 / jnp.where(Quu > 1e-12, Quu, 1.0),
                        0.0)
        K = [-inv * Qux[j] for j in range(nx)]
        kk = -inv * qu

        # persist per-stage tensors for the forward pass
        for j in range(nx):
            Kc[t * nx + j, 0] = K[j]
        kc[t, 0] = kk
        for i in range(nx):
            pbarc[t * nx + i, 0] = pbar[i]
            Mxuc[t * nx + i, 0] = Mxu[i]
            for j in range(nx):
                Pbarc[t * nx * nx + i * nx + j, 0] = Pbar[i][j]

        P_new = [[Qxx[i][j] + Qux[i] * K[j] for j in range(nx)]
                 for i in range(nx)]
        P = [[0.5 * (P_new[i][j] + P_new[j][i]) for j in range(nx)]
             for i in range(nx)]
        p = [qx[i] + Qux[i] * kk for i in range(nx)]

    # ---- forward sweep ----
    dx = [zero for _ in range(nx)]
    for t in range(H):
        du = sum(Kc[t * nx + j, 0] * dx[j] for j in range(nx)) + kc[t, 0]
        dxn = [sum(a(t, i, j) * dx[j] for j in range(nx))
               + b(t, i) * du + c_ref[t * nx + i, 0] for i in range(nx)]
        dlam = [sum(Pbarc[t * nx * nx + i * nx + j, 0] * dxn[j]
                    for j in range(nx))
                + Mxuc[t * nx + i, 0] * du + pbarc[t * nx + i, 0]
                for i in range(nx)]
        dU_ref[t, 0] = du
        for i in range(nx):
            dX_ref[t * nx + i, 0] = dxn[i]
            dLam_ref[t * nx + i, 0] = dlam[i]
        dx = dxn

    ok_ref[0, 0] = ok


def _to_tiles(x, B):
    """(B, rows...) -> (prod(rows), G, 8, 128) tile-major layout."""
    rows = int(np.prod(x.shape[1:])) if x.ndim > 1 else 1
    Gt = B // _TILE
    x = x.reshape(B, rows).T.reshape(rows, Gt, 8, 128)
    return x


def _from_tiles(x, B, shape):
    rows = x.shape[0]
    return x.reshape(rows, B).T.reshape((B,) + shape)


@functools.partial(jax.jit, static_argnames=("H", "nx", "nu", "interpret"))
def _riccati_pallas_call(A, B_, G, M, mx, mu_, c, delta, H, nx, nu,
                         interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = A.shape[0]
    ns = nx + nu
    Gt = B // _TILE

    ins = [_to_tiles(A, B), _to_tiles(B_, B), _to_tiles(G, B),
           _to_tiles(M, B), _to_tiles(mx, B), _to_tiles(mu_, B),
           _to_tiles(c, B), _to_tiles(delta, B)]

    def spec(rows):
        return pl.BlockSpec((rows, 1, 8, 128), lambda g: (0, g, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [spec(H * nx * nx), spec(H * nx), spec(H * ns * ns),
                spec(H * ns * ns), spec(H * nx), spec(H), spec(H * nx),
                spec(1)]
    out_specs = [spec(H * nx), spec(H), spec(H * nx), spec(1)]
    out_shape = [
        jax.ShapeDtypeStruct((H * nx, Gt, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((H, Gt, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((H * nx, Gt, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((1, Gt, 8, 128), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((H * nx, 1, 8, 128), jnp.float32),   # K
        pltpu.VMEM((H, 1, 8, 128), jnp.float32),        # k
        pltpu.VMEM((H * nx * nx, 1, 8, 128), jnp.float32),  # Pbar
        pltpu.VMEM((H * nx, 1, 8, 128), jnp.float32),   # pbar
        pltpu.VMEM((H * nx, 1, 8, 128), jnp.float32),   # Mxu
    ]

    kernel = functools.partial(_sweep_kernel, H, nx)
    dX, dU, dLam, okm = pl.pallas_call(
        kernel,
        grid=(Gt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*ins)

    dX = _from_tiles(dX, B, (H, nx))
    dU = _from_tiles(dU, B, (H, nu))
    dLam = _from_tiles(dLam, B, (H, nx))
    ok = _from_tiles(okm, B, (1,))[:, 0] > 0.5
    return dX, dU, dLam, ok


def riccati_sweep_pallas(A, B_, G, M, mx, mu_, c, delta, interpret=False):
    """Batched sweep via the fused kernel.  Batch is padded to a multiple
    of 1024; pad problems get benign data (Quu = 1+delta > 0)."""
    B = A.shape[0]
    H, nx = c.shape[1], c.shape[2]
    nu = B_.shape[3]
    Bp = ((B + _TILE - 1) // _TILE) * _TILE
    pad = Bp - B

    def padded(x, fill=0.0):
        if pad == 0:
            return x
        cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    ns = nx + nu
    A_p, B_p, G_p = padded(A), padded(B_), padded(G)
    M_p = padded(M)
    if pad:
        # benign identity stage cost on pad problems
        eye = jnp.broadcast_to(jnp.eye(ns, dtype=M.dtype), (pad, H, ns, ns))
        M_p = M_p.at[B:].set(eye)
    mx_p, mu_p, c_p = padded(mx), padded(mu_), padded(c)
    delta_p = padded(delta.reshape(B, 1))

    out = _riccati_pallas_call(A_p, B_p, G_p, M_p, mx_p, mu_p, c_p, delta_p,
                               H=H, nx=nx, nu=nu, interpret=interpret)
    dX, dU, dLam, ok = out
    return dX[:B], dU[:B], dLam[:B], ok[:B]


# ---- custom_vmap binding ----

def _ref_sweep(A, B_, G, M, mx, mu_, c, delta):
    from ...solve.riccati import riccati_sweep_ref
    return riccati_sweep_ref(A, B_, G, M, mx, mu_, c, delta)


@jax.custom_batching.custom_vmap
def riccati_sweep_custom(A, B_, G, M, mx, mu_, c, delta):
    return _ref_sweep(A, B_, G, M, mx, mu_, c, delta)


@riccati_sweep_custom.def_vmap
def _riccati_vmap_rule(axis_size, in_batched, A, B_, G, M, mx, mu_, c,
                       delta):
    def bcast(x, batched):
        return x if batched else jnp.broadcast_to(
            x[None], (axis_size,) + x.shape)

    args = [bcast(x, b) for x, b in zip((A, B_, G, M, mx, mu_, c),
                                        in_batched[:7])]
    delta_b = (delta if in_batched[7]
               else jnp.broadcast_to(jnp.asarray(delta)[None], (axis_size,)))

    H, nx = args[6].shape[1], args[6].shape[2]
    nu = args[1].shape[3]
    use_pallas = (_kernel_fits(H, nx, nu)
                  and jax.default_backend() == "tpu"
                  and os.environ.get("NEMPC_DISABLE_PALLAS") != "1")
    if use_pallas:
        out = riccati_sweep_pallas(*args, delta_b)
    else:
        out = jax.vmap(_ref_sweep)(*args, delta_b)
    return out, (True, True, True, True)
