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


def riccati_sweep_pscan(A, B, G, M, m_x, m_u, c, delta):
    """Drop-in replacement for ``riccati_sweep_ref`` (same contract) with
    O(log H) sequential depth.  Single problem; vmap for batches."""
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
