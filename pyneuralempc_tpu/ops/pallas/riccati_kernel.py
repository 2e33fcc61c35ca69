"""Fused batched Riccati sweep as a Pallas TPU kernel.

The structured KKT solve (solve/riccati.py) is a backward + forward scan of
tiny matrix ops — exactly the shape XLA handles worst on TPU: H sequential
steps of (B, n, n) matmuls with n ∈ {2..16}, each far below MXU tile size,
so the scan becomes launch/latency-bound.  This kernel fuses the *entire*
sweep (all H stages, both directions, the δ-regularised stage Cholesky and
the ok-mask) into one Pallas program with the batch laid out on the VPU
tile: 1024 problems per grid step as an (8, 128) tile per matrix element,
so every vector op runs at full VPU width and all stage state lives in
VMEM/registers.  The nu×nu stage Cholesky is fully unrolled tile-wise
(supports any small nu; ok-mask tracks pivot positivity per problem).

Layout: ``(rows, G, 8, 128)`` where rows flattens (t, i, j) and G indexes
1024-problem groups; the grid runs over G.  The per-stage loop is a Python
unroll (H is static), so the whole sweep is straight-line vector code.

Bound to the solver via ``jax.custom_batching.custom_vmap``
(:func:`riccati_sweep_custom`): the unbatched call is the lax.scan
reference; under ``vmap`` the batch dispatches here when (a) running on
TPU and (b) the working set fits VMEM — otherwise it falls back to the
vmapped scan.
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
    if nu > 4:
        return False
    ns = nx + nu
    # inputs + outputs + scratch rows resident in VMEM per grid step
    rows = H * (nx * nx + nx * nu + 2 * ns * ns     # A, B, G, M
                + 2 * nx + nu + nx                  # mx, c, mu, dX
                + nu + nx                           # dU, dLam
                + nu * nx + nu + nx * nx + 2 * nx)  # K, k, Pbar, pbar, Mxu
    return rows * 4096 < _VMEM_BUDGET


def _sweep_kernel(H, nx, nu, A_ref, B_ref, G_ref, M_ref, mx_ref, mu_ref,
                  c_ref, delta_ref, dX_ref, dU_ref, dLam_ref, ok_ref,
                  Kc, kc, Pbarc, pbarc, Mxuc):
    """One 1024-problem tile; every variable below is an (8, 128) tile.

    Ref row layouts (leading axis; trailing dims are (1, 8, 128)):
      A: t*nx*nx + i*nx + j      B: t*nx*nu + i*nu + a
      G/M: t*ns*ns + i*ns + j    mx/c: t*nx + i     mu: t*nu + a
      scratch  K: t*nu*nx + a*nx + j,  k: t*nu + a,
               Pbar: t*nx*nx + i*nx + j, pbar: t*nx + i,
               Mxu: t*nx*nu + i*nu + a
    """
    ns = nx + nu

    def a_(t, i, j):
        return A_ref[t * nx * nx + i * nx + j, 0]

    def b_(t, i, al):
        return B_ref[t * nx * nu + i * nu + al, 0]

    def g_(t, i, j):
        return G_ref[t * ns * ns + i * ns + j, 0]

    def m_(t, i, j):
        return M_ref[t * ns * ns + i * ns + j, 0]

    delta = delta_ref[0, 0]
    zero = jnp.zeros_like(delta)

    def chol_solve(Q, rhss):
        """Unrolled tile-wise Cholesky of the nu×nu matrix-of-tiles Q and
        forward/back substitution for each rhs (list of nu tiles).
        Returns (solutions, ok_mask)."""
        L = [[zero for _ in range(nu)] for _ in range(nu)]
        inv_d = [zero] * nu
        okm = jnp.ones_like(delta)
        for i in range(nu):
            s = Q[i][i] - sum(L[i][q] * L[i][q] for q in range(i))
            okm = okm * jnp.where(s > 1e-12, 1.0, 0.0)
            s_safe = jnp.where(s > 1e-12, s, 1.0)
            L[i][i] = jnp.sqrt(s_safe)
            inv_d[i] = 1.0 / L[i][i]
            for j in range(i + 1, nu):
                L[j][i] = (Q[j][i] - sum(L[j][q] * L[i][q]
                                         for q in range(i))) * inv_d[i]
        sols = []
        for rhs in rhss:
            y = [zero] * nu
            for i in range(nu):
                y[i] = (rhs[i] - sum(L[i][q] * y[q]
                                     for q in range(i))) * inv_d[i]
            x = [zero] * nu
            for i in range(nu - 1, -1, -1):
                x[i] = (y[i] - sum(L[q][i] * x[q]
                                   for q in range(i + 1, nu))) * inv_d[i]
            sols.append(x)
        return sols, okm

    # ---- backward sweep (unrolled, t = H-1 .. 0) ----
    P = [[zero for _ in range(nx)] for _ in range(nx)]
    p = [zero for _ in range(nx)]
    ok = jnp.ones_like(delta)

    for t in range(H - 1, -1, -1):
        Pbar = [[P[i][j] + m_(t, i, j) + (delta if i == j else zero)
                 for j in range(nx)] for i in range(nx)]
        pbar = [p[i] + mx_ref[t * nx + i, 0] for i in range(nx)]
        Mxu = [[m_(t, i, nx + al) for al in range(nu)] for i in range(nx)]

        PA = [[sum(Pbar[i][k] * a_(t, k, j) for k in range(nx))
               for j in range(nx)] for i in range(nx)]
        PB = [[sum(Pbar[i][k] * b_(t, k, al) for k in range(nx))
               for al in range(nu)] for i in range(nx)]
        Qxx = [[sum(a_(t, k, i) * PA[k][j] for k in range(nx)) + g_(t, i, j)
                for j in range(nx)] for i in range(nx)]
        BtMxu = [[sum(b_(t, k, al) * Mxu[k][be] for k in range(nx))
                  for be in range(nu)] for al in range(nu)]
        Quu = [[sum(b_(t, k, al) * PB[k][be] for k in range(nx))
                + m_(t, nx + al, nx + be)
                + (delta if al == be else zero)
                + BtMxu[al][be] + BtMxu[be][al]
                + g_(t, nx + al, nx + be)
                for be in range(nu)] for al in range(nu)]
        Qux = [[sum(b_(t, k, al) * PA[k][j] for k in range(nx))
                + sum(Mxu[k][al] * a_(t, k, j) for k in range(nx))
                + g_(t, nx + al, j) for j in range(nx)]
               for al in range(nu)]
        Pc_p = [sum(Pbar[i][k] * c_ref[t * nx + k, 0] for k in range(nx))
                + pbar[i] for i in range(nx)]
        qx = [sum(a_(t, k, i) * Pc_p[k] for k in range(nx))
              for i in range(nx)]
        qu = [sum(b_(t, k, al) * Pc_p[k] for k in range(nx))
              + sum(Mxu[k][al] * c_ref[t * nx + k, 0] for k in range(nx))
              + mu_ref[t * nu + al, 0] for al in range(nu)]

        # gains: solve Quu [K | k] = [Qux | qu]
        rhss = [[Qux[al][j] for al in range(nu)] for j in range(nx)]
        rhss.append([qu[al] for al in range(nu)])
        sols, okm = chol_solve(Quu, rhss)
        ok = ok * okm
        K = [[-sols[j][al] for j in range(nx)] for al in range(nu)]
        kk = [-sols[nx][al] for al in range(nu)]

        # persist per-stage tensors for the forward pass
        for al in range(nu):
            for j in range(nx):
                Kc[t * nu * nx + al * nx + j, 0] = K[al][j]
            kc[t * nu + al, 0] = kk[al]
        for i in range(nx):
            pbarc[t * nx + i, 0] = pbar[i]
            for al in range(nu):
                Mxuc[t * nx * nu + i * nu + al, 0] = Mxu[i][al]
            for j in range(nx):
                Pbarc[t * nx * nx + i * nx + j, 0] = Pbar[i][j]

        P_new = [[Qxx[i][j] + sum(Qux[al][i] * K[al][j] for al in range(nu))
                  for j in range(nx)] for i in range(nx)]
        P = [[0.5 * (P_new[i][j] + P_new[j][i]) for j in range(nx)]
             for i in range(nx)]
        p = [qx[i] + sum(Qux[al][i] * kk[al] for al in range(nu))
             for i in range(nx)]

    # ---- forward sweep ----
    dx = [zero for _ in range(nx)]
    for t in range(H):
        du = [sum(Kc[t * nu * nx + al * nx + j, 0] * dx[j]
                  for j in range(nx)) + kc[t * nu + al, 0]
              for al in range(nu)]
        dxn = [sum(a_(t, i, j) * dx[j] for j in range(nx))
               + sum(b_(t, i, al) * du[al] for al in range(nu))
               + c_ref[t * nx + i, 0] for i in range(nx)]
        dlam = [sum(Pbarc[t * nx * nx + i * nx + j, 0] * dxn[j]
                    for j in range(nx))
                + sum(Mxuc[t * nx * nu + i * nu + al, 0] * du[al]
                      for al in range(nu))
                + pbarc[t * nx + i, 0]
                for i in range(nx)]
        for al in range(nu):
            dU_ref[t * nu + al, 0] = du[al]
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

    in_specs = [spec(H * nx * nx), spec(H * nx * nu), spec(H * ns * ns),
                spec(H * ns * ns), spec(H * nx), spec(H * nu),
                spec(H * nx), spec(1)]
    out_specs = [spec(H * nx), spec(H * nu), spec(H * nx), spec(1)]
    out_shape = [
        jax.ShapeDtypeStruct((H * nx, Gt, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((H * nu, Gt, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((H * nx, Gt, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((1, Gt, 8, 128), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((H * nu * nx, 1, 8, 128), jnp.float32),   # K
        pltpu.VMEM((H * nu, 1, 8, 128), jnp.float32),        # k
        pltpu.VMEM((H * nx * nx, 1, 8, 128), jnp.float32),   # Pbar
        pltpu.VMEM((H * nx, 1, 8, 128), jnp.float32),        # pbar
        pltpu.VMEM((H * nx * nu, 1, 8, 128), jnp.float32),   # Mxu
    ]

    kernel = functools.partial(_sweep_kernel, H, nx, nu)
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
