"""Parallel-in-time Riccati: associative-scan formulation, O(log H) depth.

The sequential Riccati sweep (solve/riccati.py) has O(H) dependent steps —
fine for H≈20, but at H=100+ the latency chain dominates and it cannot be
sharded along the horizon.  This module reformulates both sweeps as
*associative scans* (the temporal-parallelisation idea of Särkkä &
García-Fernández, IEEE TAC 2021 — see PAPERS.md; formulas re-derived and
numerically verified here rather than copied):

Backward pass.  The one-stage value-function map

    T_e : (P, p) ->  ( J + Aᵀ P (I + C P)⁻¹ A,
                       η + Aᵀ (I + P C)⁻¹ (p + P b) )

is a linear-fractional transformation with element e = (A, b, C, η, J).
These maps are closed under composition:

    A₁₂ = A₂ Γ A₁                Γ  = (I + C₁ J₂)⁻¹
    b₁₂ = A₂ Γ (b₁ − C₁ η₂) + b₂
    C₁₂ = A₂ Γ C₁ A₂ᵀ + C₂
    η₁₂ = η₁ + A₁ᵀ Γ̃ (η₂ + J₂ b₁)   Γ̃ = (I + J₂ C₁)⁻¹
    J₁₂ = J₁ + A₁ᵀ Γ̃ J₂ A₁

(e₁ earlier in time; composition verified to machine precision and
associative).  A reverse ``lax.associative_scan`` of stage elements yields
every value function (P_t, p_t) in O(log H) depth.

Stage canonicalisation.  Our stage data (cost on (x_{t+1}, u_t) plus defect
curvature on (x_t, u_t)) is first rewritten as canonical LQT data with cost
on (x_t, u_t), then the control cross-term is eliminated by the substitution
u = v − Û⁻¹(Ŝx + û), giving per-stage elements

    e_t = (Ā, c̄, B Û⁻¹Bᵀ, x̄, X̄).

Forward pass.  With all (P_{t+1}, p_{t+1}) known, gains K_t, k_t are
computed stage-parallel, and the closed-loop rollout Δx_{t+1} =
(A+BK)Δx_t + (Bk + c) is a composition of affine maps — a second
associative scan.

The stronger stage-wise condition Û ≻ 0 (vs the sequential sweep's
Quu = Û + BᵀPB ≻ 0) is folded into the ok-mask, so the solver's δ-retry
regularises exactly as it does for the sequential backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Time-last relayout applies up to this stage size (VERDICT r3 #4): the
# unrolled small-matrix code grows O(n³) per composition level, and the
# padding win (8/nx on the second-minor tile dim) shrinks as nx grows.
_TL_MAX = 4


def _chol_inv_mul(Q, X):
    """Solve Q Y = X for PD Q via Cholesky; also returns the factor."""
    L = jnp.linalg.cholesky(Q)
    return jax.scipy.linalg.cho_solve((L, True), X), L


def _canonical_elems(A, B, G, M, m_x, m_u, c, delta):
    """Canonical LQT stage data + cross-eliminated value-map elements.

    Returns (elems, (Uh, Sh, uh), ok) where elems = (Ā, c̄, C, x̄, X̄)
    stacked over stages.  Shared by the single-device pscan sweep and the
    horizon-sharded sweep (parallel/horizon.py).
    """
    H, nx = c.shape
    nu = B.shape[2]
    ns = nx + nu
    ix = jnp.arange(nx)
    iu = jnp.arange(nu)

    Md = M.at[:, ix, ix].add(delta)
    Md = Md.at[:, nx + iu, nx + iu].add(delta)
    Mxx = Md[:, :nx, :nx]
    Mxu = Md[:, :nx, nx:]
    Muu = Md[:, nx:, nx:]
    Gxx = G[:, :nx, :nx]
    Gux = G[:, nx:, :nx]
    Guu = G[:, nx:, nx:]

    # ---- canonical LQT stage data (cost on (x_t, u_t)) ----
    AtM = jnp.einsum("tij,tik->tjk", A, Mxx)            # AᵀMxx
    Xh = Gxx + jnp.einsum("tjk,tkl->tjl", AtM, A)
    BtM = jnp.einsum("tij,tik->tjk", B, Mxx)            # BᵀMxx
    BtMxu = jnp.einsum("tij,tik->tjk", B, Mxu)          # BᵀMxu (nu,nu)
    Uh = (Muu + BtMxu + BtMxu.transpose(0, 2, 1) + Guu
          + jnp.einsum("tjk,tkl->tjl", BtM, B))
    Sh = (Gux + jnp.einsum("tji,tjk->tik", Mxu, A)      # Mxuᵀ A
          + jnp.einsum("tjk,tkl->tjl", BtM, A))
    Mc_mx = jnp.einsum("tij,tj->ti", Mxx, c) + m_x      # Mxx c + mx
    xh = jnp.einsum("tij,ti->tj", A, Mc_mx)
    uh = (jnp.einsum("tij,ti->tj", B, Mc_mx)
          + jnp.einsum("tji,tj->ti", Mxu, c) + m_u)

    # ---- eliminate the control cross term:  u = v − Û⁻¹(Ŝ x + û) ----
    def stage_elem(Uh_t, Sh_t, uh_t, A_t, B_t, c_t, Xh_t, xh_t):
        UinvS, L = _chol_inv_mul(Uh_t, Sh_t)            # Û⁻¹Ŝ
        Uinvu, _ = _chol_inv_mul(Uh_t, uh_t)
        UinvBt, _ = _chol_inv_mul(Uh_t, B_t.T)
        ok = jnp.all(jnp.isfinite(L))
        Abar = A_t - B_t @ UinvS
        cbar = c_t - B_t @ Uinvu
        Cmat = B_t @ UinvBt
        Xbar = Xh_t - Sh_t.T @ UinvS
        xbar = xh_t - Sh_t.T @ Uinvu
        return Abar, cbar, Cmat, xbar, Xbar, ok

    Abar, cbar, Cmat, xbar, Xbar, ok_stage = jax.vmap(stage_elem)(
        Uh, Sh, uh, A, B, c, Xh, xh)
    return ((Abar, cbar, Cmat, xbar, Xbar), (Uh, Sh, uh),
            jnp.all(ok_stage))


def _gains(Uh_t, Sh_t, uh_t, A_t, B_t, c_t, Pn, pn):
    """Stage gains given the next-state value (P_{t+1}, p_{t+1})."""
    Quu = Uh_t + B_t.T @ Pn @ B_t
    Qux = Sh_t + B_t.T @ Pn @ A_t
    qu = uh_t + B_t.T @ (Pn @ c_t + pn)
    L = jnp.linalg.cholesky(Quu)
    K = -jax.scipy.linalg.cho_solve((L, True), Qux)
    k = -jax.scipy.linalg.cho_solve((L, True), qu)
    return K, k, jnp.all(jnp.isfinite(L))


# ---- time-last relayout (VERDICT r3 #4) ----
#
# The matrix-last layout above keeps every O(H)-element intermediate of
# every log₂H composition level as (..., H, nx, nx) tensors whose tiny
# minor dims pad 32–64× under the TPU's T(8,128) tiling — measured
# 10–500× slower than the streamed Pallas kernel end-to-end, OOM at
# fleet×long-H (19.3 GB HBM at B=1024·H=1024·nx=4; docs/SCALING.md).
# The relayout below stores every stage tensor as nested Python lists of
# (H,) leaves — (B, H) under vmap, minor-dim-perfect tiles — with all
# small-matrix algebra unrolled (the Pallas kernels' style), including
# the nonsymmetric (I + C·J)⁻¹ composition solves as unrolled Gaussian
# elimination (benign: I + PSD·PSD products have spectrum ≥ 1).


def _tl_mat(X):
    """(H, a, b) -> list[a][b] of (H,) leaves."""
    return [[X[:, i, j] for j in range(X.shape[2])]
            for i in range(X.shape[1])]


def _tl_vec(x):
    return [x[:, i] for i in range(x.shape[1])]


def _mm(X, Y):
    return [[sum(X[i][q] * Y[q][j] for q in range(len(Y)))
             for j in range(len(Y[0]))] for i in range(len(X))]


def _mv(X, y):
    return [sum(X[i][q] * y[q] for q in range(len(y)))
            for i in range(len(X))]


def _mt(X):
    return [[X[j][i] for j in range(len(X))] for i in range(len(X[0]))]


def _madd(X, Y):
    return [[X[i][j] + Y[i][j] for j in range(len(X[0]))]
            for i in range(len(X))]


def _vadd(x, y):
    return [a + b for a, b in zip(x, y)]


def _vsub(x, y):
    return [a - b for a, b in zip(x, y)]


def _gauss_solve(Q, B_):
    """Unrolled Gaussian elimination (no pivoting) solving Q X = B for a
    small n×n list-matrix Q and n×m rhs list B.  A ~singular pivot yields
    inf/nan which the caller's finite-check ok-mask catches — the same
    failure semantics as a failed Cholesky in the sequential sweep."""
    n, m = len(Q), len(B_[0])
    Q = [row[:] for row in Q]
    B_ = [row[:] for row in B_]
    for k in range(n):
        inv = 1.0 / Q[k][k]
        for j in range(k + 1, n):
            Q[k][j] = Q[k][j] * inv
        for j in range(m):
            B_[k][j] = B_[k][j] * inv
        for i in range(k + 1, n):
            f = Q[i][k]
            for j in range(k + 1, n):
                Q[i][j] = Q[i][j] - f * Q[k][j]
            for j in range(m):
                B_[i][j] = B_[i][j] - f * B_[k][j]
    for k in range(n - 1, -1, -1):
        for i in range(k):
            f = Q[i][k]
            for j in range(m):
                B_[i][j] = B_[i][j] - f * B_[k][j]
    return B_


def _riccati_sweep_pscan_tl(A, B, G, M, m_x, m_u, c, delta):
    """Time-last pscan: identical math to :func:`riccati_sweep_pscan`,
    every tensor a nested list of (H,) leaves."""
    from ..ops.pallas.riccati_kernel import _chol_solve_tiles

    H, nx = c.shape
    nu = B.shape[2]
    dtype = A.dtype
    zero = jnp.zeros((H,), dtype)

    Al, Bl, cl = _tl_mat(A), _tl_mat(B), _tl_vec(c)
    mxl, mul = _tl_vec(m_x), _tl_vec(m_u)
    Ml = _tl_mat(M)
    Gl = _tl_mat(G)
    for i in range(nx + nu):
        Ml[i][i] = Ml[i][i] + delta
    Mxx = [[Ml[i][j] for j in range(nx)] for i in range(nx)]
    Mxu = [[Ml[i][nx + a] for a in range(nu)] for i in range(nx)]
    Muu = [[Ml[nx + a][nx + b] for b in range(nu)] for a in range(nu)]
    Gxx = [[Gl[i][j] for j in range(nx)] for i in range(nx)]
    Gux = [[Gl[nx + a][j] for j in range(nx)] for a in range(nu)]
    Guu = [[Gl[nx + a][nx + b] for b in range(nu)] for a in range(nu)]

    At, Bt = _mt(Al), _mt(Bl)

    # ---- canonical LQT stage data (cost on (x_t, u_t)) ----
    Xh = _madd(Gxx, _mm(_mm(At, Mxx), Al))
    BtMxu = _mm(Bt, Mxu)
    Uh = _madd(_madd(_madd(Muu, BtMxu), _mt(BtMxu)),
               _madd(Guu, _mm(_mm(Bt, Mxx), Bl)))
    Sh = _madd(Gux, _madd(_mm(_mt(Mxu), Al), _mm(_mm(Bt, Mxx), Al)))
    Mc_mx = _vadd(_mv(Mxx, cl), mxl)
    xh = _mv(At, Mc_mx)
    uh = _vadd(_vadd(_mv(Bt, Mc_mx), _mv(_mt(Mxu), cl)), mul)

    # ---- eliminate the control cross term (one chol, nx+1+nx rhs) ----
    rhss = [[Sh[a][j] for a in range(nu)] for j in range(nx)]       # Ŝ cols
    rhss.append([uh[a] for a in range(nu)])                         # û
    rhss += [[Bt[a][j] for a in range(nu)] for j in range(nx)]      # Bᵀ cols
    sols, ok_u = _chol_solve_tiles(Uh, rhss, zero)
    UinvS = [[sols[j][a] for j in range(nx)] for a in range(nu)]
    Uinvu = [sols[nx][a] for a in range(nu)]
    UinvBt = [[sols[nx + 1 + j][a] for j in range(nx)]
              for a in range(nu)]
    Abar = [[Al[i][j] - sum(Bl[i][a] * UinvS[a][j] for a in range(nu))
             for j in range(nx)] for i in range(nx)]
    cbar = [cl[i] - sum(Bl[i][a] * Uinvu[a] for a in range(nu))
            for i in range(nx)]
    Cmat = _mm(Bl, UinvBt)
    ShT = _mt(Sh)
    Xbar = [[Xh[i][j] - sum(ShT[i][a] * UinvS[a][j] for a in range(nu))
             for j in range(nx)] for i in range(nx)]
    xbar = [xh[i] - sum(ShT[i][a] * Uinvu[a] for a in range(nu))
            for i in range(nx)]

    # ---- backward associative scan over value-map elements ----
    # The element pytree is PACKED into one (rows, H) leaf: an
    # associative_scan over ~3nx²+2nx separate (H,) leaves compiles
    # pathologically on XLA (each level re-slices every leaf; measured:
    # the unpacked form blew past 16 GB of compile RSS at H=64), while
    # one packed leaf keeps the scan's data movement to a single
    # stack/slice per level AND keeps H minor-most for TPU tiling.
    def pack_e(Am, bv, Cm, nv, Jm):
        rows = ([Am[i][j] for i in range(nx) for j in range(nx)] + bv
                + [Cm[i][j] for i in range(nx) for j in range(nx)] + nv
                + [Jm[i][j] for i in range(nx) for j in range(nx)])
        return jnp.stack(rows, axis=0)

    def unpack_e(E):
        k = [0]

        def mat():
            m = [[E[k[0] + i * nx + j] for j in range(nx)]
                 for i in range(nx)]
            k[0] += nx * nx
            return m

        def vec():
            v = [E[k[0] + i] for i in range(nx)]
            k[0] += nx
            return v

        return mat(), vec(), mat(), vec(), mat()

    def compose(e1, e2):
        A1, b1, C1, n1, J1 = unpack_e(e1)
        A2, b2, C2, n2, J2 = unpack_e(e2)
        CJ = _mm(C1, J2)
        JC = _mm(J2, C1)
        for i in range(nx):
            CJ[i][i] = CJ[i][i] + 1.0
            JC[i][i] = JC[i][i] + 1.0
        GA1 = _gauss_solve(CJ, A1)
        Gb = _gauss_solve(CJ, [[v] for v in _vsub(b1, _mv(C1, n2))])
        GC1 = _gauss_solve(CJ, C1)
        Gn = _gauss_solve(JC, [[v] for v in _vadd(n2, _mv(J2, b1))])
        GJ2 = _gauss_solve(JC, J2)
        A1t = _mt(A1)
        A12 = _mm(A2, GA1)
        b12 = _vadd(_mv(A2, [r[0] for r in Gb]), b2)
        C12 = _madd(_mm(_mm(A2, GC1), _mt(A2)), C2)
        n12 = _vadd(n1, _mv(A1t, [r[0] for r in Gn]))
        J12 = _madd(J1, _mm(_mm(A1t, GJ2), A1))
        return pack_e(A12, b12, C12, n12, J12)

    E0 = pack_e(Abar, cbar, Cmat, xbar, Xbar)
    suffix = jax.lax.associative_scan(lambda a, b: compose(b, a), E0,
                                      reverse=True, axis=1)
    _, _, _, p_all, P_all = unpack_e(suffix)

    shift = lambda v: jnp.concatenate([v[1:], jnp.zeros((1,), dtype)])
    Pn = [[shift(P_all[i][j]) for j in range(nx)] for i in range(nx)]
    pn = [shift(p_all[i]) for i in range(nx)]

    # ---- stage-parallel gains from the original (with-cross) data ----
    PnB = _mm(Pn, Bl)
    Quu = _madd(Uh, _mm(Bt, PnB))
    Qux = _madd(Sh, _mm(Bt, _mm(Pn, Al)))
    qu = _vadd(uh, _mv(Bt, _vadd(_mv(Pn, cl), pn)))
    rhss = [[Qux[a][j] for a in range(nu)] for j in range(nx)]
    rhss.append([qu[a] for a in range(nu)])
    sols, ok_g = _chol_solve_tiles(Quu, rhss, zero)
    K = [[-sols[j][a] for j in range(nx)] for a in range(nu)]
    k = [-sols[nx][a] for a in range(nu)]

    # ---- forward associative scan of affine closed-loop maps ----
    F = [[Al[i][j] + sum(Bl[i][a] * K[a][j] for a in range(nu))
          for j in range(nx)] for i in range(nx)]
    v = [sum(Bl[i][a] * k[a] for a in range(nu)) + cl[i]
         for i in range(nx)]

    def pack_a(Fm, vv):
        return jnp.stack([Fm[i][j] for i in range(nx) for j in range(nx)]
                         + vv, axis=0)

    def unpack_a(E):
        Fm = [[E[i * nx + j] for j in range(nx)] for i in range(nx)]
        vv = [E[nx * nx + i] for i in range(nx)]
        return Fm, vv

    def aff_compose(e1, e2):
        F1, v1 = unpack_a(e1)
        F2, v2 = unpack_a(e2)
        return pack_a(_mm(F2, F1), _vadd(_mv(F2, v1), v2))

    scanned = jax.lax.associative_scan(aff_compose, pack_a(F, v), axis=1)
    _, vp = unpack_a(scanned)
    dXl = vp                                       # Δx_{t+1} (Δx_0 = 0)
    shiftr = lambda v_: jnp.concatenate([jnp.zeros((1,), dtype), v_[:-1]])
    dx_prev = [shiftr(dXl[i]) for i in range(nx)]
    dUl = _vadd(_mv(K, dx_prev), k)
    dLaml = _vadd(_vadd(_mv(_madd(Pn, Mxx), dXl), _mv(Mxu, dUl)),
                  _vadd(pn, mxl))

    dX = jnp.stack(dXl, axis=1)
    dU = jnp.stack(dUl, axis=1)
    dLam = jnp.stack(dLaml, axis=1)
    # ok: per-stage chol masks are (H,) (1.0/0.0); Gaussian-elim failures
    # surface as non-finite outputs
    ok = (jnp.all(ok_u > 0.5) & jnp.all(ok_g > 0.5)
          & jnp.all(jnp.isfinite(dX)) & jnp.all(jnp.isfinite(dU))
          & jnp.all(jnp.isfinite(dLam)))
    return dX, dU, dLam, ok


def riccati_sweep_pscan(A, B, G, M, m_x, m_u, c, delta):
    """Drop-in replacement for ``riccati_sweep_ref`` (same contract) with
    O(log H) sequential depth.  Single problem; vmap for batches.

    ON TPU, stage sizes nx <= _TL_MAX dispatch to the TIME-LAST
    implementation (:func:`_riccati_sweep_pscan_tl`): every tensor a
    packed (rows, H) leaf — (B, rows, H) under vmap — so TPU tiling pads
    nothing, vs the 32–64× minor-dim padding of the (…, H, nx, nx)
    layout that made the matrix-last pscan 10–500× slower than the
    streamed kernel and OOM at fleet×long-H (VERDICT r3 #4; measured
    round 4: TL is 5× FASTER than the streamed kernel at B=8 H=512 and
    compiles/runs the B=1024×H=1024 round-3 OOM shape —
    tools/bench_horizon_tpu.log).  On CPU the matrix-last form stays:
    there is no tiling to pad, and the TL form's huge unrolled
    associative-scan programs compile pathologically slowly on the XLA
    CPU backend (minutes per shape)."""
    nx = c.shape[1]
    dev = jax.config.jax_default_device
    plat = dev if isinstance(dev, str) else getattr(dev, "platform", None)
    on_tpu = (jax.default_backend() == "tpu" and plat in (None, "tpu"))
    if nx <= _TL_MAX and B.shape[2] <= _TL_MAX and on_tpu:
        return _riccati_sweep_pscan_tl(A, B, G, M, m_x, m_u, c, delta)
    return _riccati_sweep_pscan_ml(A, B, G, M, m_x, m_u, c, delta)


def _riccati_sweep_pscan_ml(A, B, G, M, m_x, m_u, c, delta):
    """Matrix-last (legacy layout) pscan — the nx > _TL_MAX path."""
    H, nx = c.shape
    nu = B.shape[2]
    dtype = A.dtype
    ix = jnp.arange(nx)
    iu = jnp.arange(nu)
    eye_x = jnp.eye(nx, dtype=dtype)

    Md = M.at[:, ix, ix].add(delta)
    Md = Md.at[:, nx + iu, nx + iu].add(delta)
    Mxx = Md[:, :nx, :nx]
    Mxu = Md[:, :nx, nx:]

    (Abar, cbar, Cmat, xbar, Xbar), (Uh, Sh, uh), ok = _canonical_elems(
        A, B, G, M, m_x, m_u, c, delta)

    # ---- backward associative scan over value-map elements ----
    def compose(e1, e2):
        """e1 earlier in time; returns the composed element."""
        A1, b1, C1, n1, J1 = e1
        A2, b2, C2, n2, J2 = e2
        I = eye_x
        # Γ = (I + C1 J2)⁻¹ applied from the left via LU solve
        CJ = I + jnp.einsum("...ij,...jk->...ik", C1, J2)
        JC = I + jnp.einsum("...ij,...jk->...ik", J2, C1)
        solve = jnp.linalg.solve
        GA1 = solve(CJ, A1)
        Gb = solve(CJ, b1[..., None] - jnp.einsum(
            "...ij,...j->...i", C1, n2)[..., None])[..., 0]
        GC1 = solve(CJ, C1)
        Gn = solve(JC, n2[..., None] + jnp.einsum(
            "...ij,...j->...i", J2, b1)[..., None])[..., 0]
        GJ2 = solve(JC, J2)
        A12 = jnp.einsum("...ij,...jk->...ik", A2, GA1)
        b12 = jnp.einsum("...ij,...j->...i", A2, Gb) + b2
        C12 = (jnp.einsum("...ij,...jk,...lk->...il", A2, GC1, A2) + C2)
        n12 = n1 + jnp.einsum("...ji,...j->...i", A1, Gn)
        J12 = J1 + jnp.einsum("...ji,...jk,...kl->...il", A1, GJ2, A1)
        return A12, b12, C12, n12, J12

    elems = (Abar, cbar, Cmat, xbar, Xbar)
    # associative_scan(reverse=True) calls fn(a, b) with a = HIGHER index
    # (verified empirically); compose expects (earlier, later) -> swap.
    suffix = jax.lax.associative_scan(lambda a, b: compose(b, a), elems,
                                      reverse=True)
    P_all = suffix[4]            # (H, nx, nx): P_t for t = 0..H-1
    p_all = suffix[3]

    # value at x_{t+1}: shift left, terminal (P_H, p_H) = 0
    P_next = jnp.concatenate([P_all[1:], jnp.zeros((1, nx, nx), dtype)], 0)
    p_next = jnp.concatenate([p_all[1:], jnp.zeros((1, nx), dtype)], 0)

    # ---- stage-parallel gains from the original (with-cross) data ----
    K, k, ok_g = jax.vmap(_gains)(Uh, Sh, uh, A, B, c, P_next, p_next)
    ok = ok & jnp.all(ok_g)

    # ---- forward associative scan of affine closed-loop maps ----
    F = A + jnp.einsum("tij,tjk->tik", B, K)
    v = jnp.einsum("tij,tj->ti", B, k) + c

    def aff_compose(m1, m2):
        F1, v1 = m1
        F2, v2 = m2
        return (jnp.einsum("...ij,...jk->...ik", F2, F1),
                jnp.einsum("...ij,...j->...i", F2, v1) + v2)

    Fp, vp = jax.lax.associative_scan(aff_compose, (F, v))
    dX = vp                                     # Δx_{t+1} (Δx_0 = 0)
    dx_prev = jnp.concatenate([jnp.zeros((1, nx), dtype), dX[:-1]], 0)
    dU = jnp.einsum("tij,tj->ti", K, dx_prev) + k

    # multipliers: λ̂_t = (P_{t+1}+Mxx)Δx_{t+1} + MxuΔu_t + p_{t+1} + mx_t
    dLam = (jnp.einsum("tij,tj->ti", P_next + Mxx, dX)
            + jnp.einsum("tij,tj->ti", Mxu, dU) + p_next + m_x)

    ok = ok & jnp.all(jnp.isfinite(dX)) & jnp.all(jnp.isfinite(dU))
    return dX, dU, dLam, ok
