"""Structured KKT backend: block-tridiagonal Riccati recursion.

The multiple-shooting KKT system is block-tridiagonal — stage t couples only
(x_t, u_t, x_{t+1}) — a structure the reference throws away by assembling
dense (H·nx)×(H·(nx+nu)) matrices (``rk4.py:120``, SURVEY §5.7).  This
backend factorises the interior-point Newton system by a backward dynamic-
programming (Riccati) sweep in O(H · stage³) instead of the dense backend's
O((H·stage)³) LU, with per-stage derivative blocks obtained by ``vmap``'d
autodiff (never a dense NLP matrix).

Eligible problems: stage-separable cost (:class:`~pyneuralempc_tpu.core.
problem.StageCost`), box bounds, and stage-wise path constraints
(:class:`~pyneuralempc_tpu.core.problem.StageConstraint`, inequality /
interval rows) — their slack blocks eliminate per stage and fold into the
sweep (see :func:`make_riccati_direction`).  Opaque trajectory-level
constraints stay on the dense backend.

Derivation.  The condensed IP Newton step solves

    min_Δw  ½ Δwᵀ(W+Σ+δI)Δw + r̃ᵀΔw   s.t.  A_t Δx_t + B_t Δu_t − Δx_{t+1} = −c_t

with W = ∇²(J + λᵀC).  Per stage t (0-based; x_{t+1} is the decision state,
x_0 is the fixed parameter):

  * M_t  = ∇²ℓ_t over (x_{t+1}, u_t)  + diag(Σ, δ) on those variables;
  * G_t  = ∇²_{(x_t, u_t)} λ_tᵀΦ_t     (defect curvature; inputs of Φ);
  * m_t  = r̃ sliced to (x_{t+1}, u_t);
  * A_t, B_t = ∂Φ_t/∂(x_t, u_t).

Backward sweep (value function V_t(Δx_t) = ½ΔxᵀP_tΔx + p_tᵀΔx), with
P̄ = P_{t+1} + Mxx_t and p̄ = p_{t+1} + mx_t:

    Qxx = AᵀP̄A + Gxx
    Quu = BᵀP̄B + Muu + sym(BᵀMxu) + Guu + δ_u I
    Qux = BᵀP̄A + MxuᵀA + Gux
    qx  = Aᵀ(P̄c + p̄)
    qu  = Bᵀ(P̄c + p̄) + Mxuᵀc + mu_t

    K = −Quu⁻¹Qux,  k = −Quu⁻¹qu          (Cholesky; δ retry if not PD)
    P_t = Qxx + QuxᵀK,   p_t = qx + Quxᵀk

Forward sweep: Δx_0 = 0; Δu_t = KΔx_t + k; Δx_{t+1} = AΔx_t + BΔu_t + c_t;
defect multiplier step Δλ_t = P̄Δx_{t+1} + Mxu Δu_t + p̄ (the co-state).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..core.problem import EQ_TYPE, StageConstraint, StageCost
from ..core.structure import SeparableObjective
from ..core.transcription import NLP
from ..models.base import _call_user_fn
from ..ops.integrators import step_fn
from ..ops.rollout import shift_states

_DELTAS = (0.0, 1e-6, 1e-4, 1e-2, 1.0, 1e2)


def riccati_sweep(A, B, G, M, m_x, m_u, c, delta):
    """One backward+forward Riccati sweep (single problem).

    Inputs: per-stage blocks A (H,nx,nx), B (H,nx,nu), G (H,ns,ns),
    M (H,ns,ns) [already Σ-folded], linear terms m_x (H,nx), m_u (H,nu),
    defect residuals c (H,nx), scalar regularisation ``delta`` added to the
    decision-variable diagonal.  Returns (dX, dU, dLam, ok).

    Wrapped in ``jax.custom_batching.custom_vmap``: under ``vmap`` the
    whole batch is dispatched to the fused Pallas TPU kernel
    (:mod:`pyneuralempc_tpu.ops.pallas.riccati_kernel`) when the problem
    dims fit its limits, else to a plain vmapped scan.
    """
    from ..ops.pallas.riccati_kernel import riccati_sweep_custom
    return riccati_sweep_custom(A, B, G, M, m_x, m_u, c, delta)


def riccati_sweep_ref(A, B, G, M, m_x, m_u, c, delta):
    """Reference implementation: lax.scan backward + forward (one problem)."""
    H, nx = c.shape
    nu = B.shape[2]
    dtype = A.dtype
    ix = jnp.arange(nx)
    iu = jnp.arange(nu)
    Md = M.at[:, ix, ix].add(delta)
    Md = Md.at[:, nx + iu, nx + iu].add(delta)

    def backward(carry, blocks):
        P, p_vec, okc = carry
        A_t, B_t, G_t, M_t, mx_t, mu_t, c_t = blocks
        Mxx = M_t[:nx, :nx]
        Mxu = M_t[:nx, nx:]
        Muu = M_t[nx:, nx:]
        Pbar = P + Mxx
        pbar = p_vec + mx_t
        PA = Pbar @ A_t
        PB = Pbar @ B_t
        Qxx = A_t.T @ PA + G_t[:nx, :nx]
        BtMxu = B_t.T @ Mxu
        Quu = B_t.T @ PB + Muu + BtMxu + BtMxu.T + G_t[nx:, nx:]
        Qux = B_t.T @ PA + Mxu.T @ A_t + G_t[nx:, :nx]
        Pc_p = Pbar @ c_t + pbar
        qx = A_t.T @ Pc_p
        qu = B_t.T @ Pc_p + Mxu.T @ c_t + mu_t

        L = jnp.linalg.cholesky(Quu)
        K = -jax.scipy.linalg.cho_solve((L, True), Qux)
        k = -jax.scipy.linalg.cho_solve((L, True), qu)
        okc = okc & jnp.all(jnp.isfinite(L))
        P_new = Qxx + Qux.T @ K
        P_new = 0.5 * (P_new + P_new.T)
        p_new = qx + Qux.T @ k
        return (P_new, p_new, okc), (K, k, Pbar, pbar, Mxu)

    init = (jnp.zeros((nx, nx), dtype), jnp.zeros((nx,), dtype),
            jnp.asarray(True))
    (_, _, okc), (K, k, Pbar, pbar, Mxu) = jax.lax.scan(
        backward, init, (A, B, G, Md, m_x, m_u, c), reverse=True)

    def forward(dx, blocks):
        A_t, B_t, c_t, K_t, k_t, Pb, pb, Mxu_t = blocks
        du = K_t @ dx + k_t
        dx_next = A_t @ dx + B_t @ du + c_t
        dlam_t = Pb @ dx_next + Mxu_t @ du + pb
        return dx_next, (dx_next, du, dlam_t)

    dx0 = jnp.zeros((nx,), dtype)
    _, (dX, dU, dLam) = jax.lax.scan(
        forward, dx0, (A, B, c, K, k, Pbar, pbar, Mxu))
    return dX, dU, dLam, okc


def eligible(nlp: NLP) -> bool:
    """Riccati eligibility: a stage-separable cost — declared
    (:class:`StageCost`) or probe-certified
    (:class:`~pyneuralempc_tpu.core.structure.SeparableObjective`) — and
    every path constraint stage-wise (:class:`StageConstraint`) with no
    equality rows — EQ rows carry no slack to eliminate, so they would add
    genuine extra equality blocks to the stage KKT (dense backend handles
    those).  Inequality/interval stage rows fold into the sweep: their
    slack Σ and right-hand side condense into the per-stage Hessian blocks
    exactly like box bounds (see :func:`make_riccati_direction`)."""
    spec = nlp.spec
    return (spec is not None
            and isinstance(spec.objective, (StageCost, SeparableObjective))
            and all(isinstance(pc, StageConstraint)
                    and not (pc.row_types() == EQ_TYPE).any()
                    for pc in spec.path_constraints))


def make_riccati_direction(nlp: NLP, cfg, sweep_impl=None) -> Callable:
    """KKT backend factory for :func:`..interior_point.make_solver`.

    ``sweep_impl``: the sweep function (defaults to :func:`riccati_sweep`,
    i.e. scan reference + Pallas under vmap; pass
    :func:`~pyneuralempc_tpu.solve.pscan.riccati_sweep_pscan` for the
    O(log H) parallel-in-time variant).
    """
    if not eligible(nlp):
        raise ValueError(
            "Riccati KKT backend needs a StageCost objective and stage-wise "
            "path constraints (StageConstraint, no equality rows); opaque "
            "trajectory-level PathConstraints fall to the dense backend.")
    the_sweep = sweep_impl if sweep_impl is not None else riccati_sweep
    spec = nlp.spec
    H, nx, nu = spec.H, spec.dims.x, spec.dims.u
    n_primal = spec.n_primal
    phi = step_fn(spec.model, spec.integrator, spec.DT)
    stage_cost = spec.objective
    # Stage-wise path constraints: (pc, r, off) with ``off`` the shared
    # offset of this pc's H·r rows within BOTH the slack segment of w and
    # the post-defect rows of C/λ (identical because every row is non-EQ,
    # so rows and slacks are 1:1 — see transcription slack lifting).
    pcs = []
    _off = 0
    for pc in spec.path_constraints:
        pcs.append((pc, pc.dim, _off))
        _off += H * pc.dim

    def phi1(x, u, p, tvp_t, params):
        """Single-stage step: (nx,), (nu,) -> (nx,)."""
        tvp_b = None if tvp_t is None else tvp_t[None, :]
        return phi(x[None, :], u[None, :], p, tvp_b, params)[0]

    def stage_blocks(w, lam, rt):
        X, U, _ = nlp.unpack(w)
        xprev = shift_states(rt["x0"], X)
        lam_t = lam[: H * nx].reshape(H, nx)   # defect multipliers only
        tvp = rt["tvp"]
        p, params = rt["p"], rt.get("params")

        # remat (gated by NEMPC_NO_REMAT=1 for experiments): the
        # second-derivative passes through Φ (4 model calls for rk4)
        # dominate peak memory at fleet scales; recompute instead of
        # storing the per-stage forward intermediates.
        import os as _os
        _maybe_remat = (lambda f: f) if _os.environ.get(
            "NEMPC_NO_REMAT") == "1" else jax.checkpoint

        @_maybe_remat
        def per_stage(x_t, u_t, lam_row, tvp_t):
            f = lambda xu: phi1(xu[:nx], xu[nx:], p, tvp_t, params)
            xu = jnp.concatenate([x_t, u_t])

            # Fused forward-over-reverse: one jacfwd pass produces both the
            # defect curvature G = ∇²(λᵀΦ) and the Jacobian J = ∂Φ — the
            # tangent of the vjp's primal output IS the jvp of Φ, so J rides
            # along instead of costing a second full jacfwd(Φ) sweep (the
            # dominant per-iteration autodiff cost at fleet scales).
            def grad_and_val(z):
                v, vjp = jax.vjp(f, z)
                return vjp(lam_row)[0], v

            if cfg.hessian == "exact":
                G, J = jax.jacfwd(grad_and_val)(xu)    # (n,n), (nx,n)
            else:
                # Gauss-Newton / objective-only curvature drops the defect
                # second-order terms — no reverse pass needed at all.
                J = jax.jacfwd(f)(xu)
                G = jnp.zeros((nx + nu, nx + nu), J.dtype)
            return J[:, :nx], J[:, nx:], G             # A_t, B_t, G_t

        tvp_ax = None if tvp is None else 0
        A, B, G = jax.vmap(per_stage, in_axes=(0, 0, 0, tvp_ax))(
            xprev, U, lam_t, tvp)

        if isinstance(stage_cost, StageCost):
            def cost_stage(x_n, u_t, tvp_t):
                return _call_user_fn(stage_cost.stage, x_n, u_t, p, tvp_t)

            def cost_blocks(x_n, u_t, tvp_t):
                f = lambda z: cost_stage(z[:nx], z[nx:], tvp_t)
                z = jnp.concatenate([x_n, u_t])
                return jax.hessian(f)(z)               # over (x_{t+1}, u_t)

            M = jax.vmap(cost_blocks, in_axes=(0, 0, tvp_ax))(X, U, tvp)
            if stage_cost.terminal is not None:
                term_h = jax.hessian(
                    lambda xH: (stage_cost.terminal(xH, p) if p is not None
                                else stage_cost.terminal(xH)))(X[-1])
                M = M.at[-1, :nx, :nx].add(term_h)
        else:
            # Probe-certified SeparableObjective: there is no per-stage
            # l(x, u) to call, but separability means the full J's Hessian
            # is block-diagonal over stages — each diagonal block is the
            # Hessian of J restricted to that stage's variables (any
            # terminal term lands in the last block automatically).
            def restricted_block(t):
                def f(z):
                    X2 = X.at[t].set(z[:nx])
                    U2 = U.at[t].set(z[nx:])
                    return _call_user_fn(stage_cost, X2, U2, p, tvp)
                z = jnp.concatenate([X[t], U[t]])
                return jax.hessian(f)(z)

            M = jax.vmap(restricted_block)(jnp.arange(H))
        # objective auto-scaling (see interior_point.make_solver): the
        # cost curvature must match the scaled gradient in r_tilde.
        s_obj = rt.get("_s_obj")
        if s_obj is not None:
            M = M * s_obj

        # Stage-constraint blocks: per-stage Jacobian J_g = ∂g/∂(x_{t+1},
        # u_t) and (exact mode) curvature ν_tᵀ∇²g_t — same fused
        # jacfwd-over-vjp trick as the defect blocks.  Curvature joins M
        # AFTER s_obj scaling: it is Lagrangian curvature, not objective.
        Jgs = []
        for pc, r, off in pcs:
            nu_rows = lam[H * nx + off: H * nx + off + H * r].reshape(H, r)

            def pc_one(x_n, u_t, nu_t, tvp_t, _pc=pc, _r=r):
                gfun = lambda z: jnp.atleast_1d(
                    _call_user_fn(_pc.stage, z[:nx], z[nx:], p, tvp_t))
                z = jnp.concatenate([x_n, u_t])
                if cfg.hessian == "exact":
                    def grad_and_val(zz):
                        v, vjp = jax.vjp(gfun, zz)
                        return vjp(nu_t)[0], v
                    Cv, Jg = jax.jacfwd(grad_and_val)(z)
                    return Jg, Cv
                Jg = jax.jacfwd(gfun)(z)
                return Jg, jnp.zeros((nx + nu, nx + nu), Jg.dtype)

            Jg, Cv = jax.vmap(pc_one, in_axes=(0, 0, 0, tvp_ax))(
                X, U, nu_rows, tvp)
            M = M + Cv
            Jgs.append(Jg)
        return A, B, G, M, Jgs

    def direction(w, lam, rt, Sigma, r_tilde, c_full):
        """Returns ``(dw, dlam, ok, resolve)``; ``resolve(r_tilde2, c2)``
        re-solves with the SAME stage blocks (the expensive autodiff) and a
        new right-hand side — the second-order-correction / cheap-polish
        hook (pass ``Sigma2`` to also re-fold a fresh bound Σ)."""
        A, B, G, M0, Jgs = stage_blocks(w, lam, rt)
        G = jnp.nan_to_num(G, posinf=1e10, neginf=-1e10)
        M0 = jnp.nan_to_num(M0, posinf=1e10, neginf=-1e10)

        ix = jnp.arange(nx)
        iu = jnp.arange(nu)

        def fold_sigma(Sig):
            """Σ (bounds) + stage-constraint slack elimination into the
            per-stage Hessian blocks.  With slack rows  g_t(x_{t+1}, u_t)
            − s_t = −c_g and slack stationarity  Σ_s Δs − Δν = −r̃_s,
            eliminating (Δs, Δν) condenses into the stage blocks:
                M_t += J_gᵀ Σ_s J_g
                m_t += J_gᵀ (Σ_s ∘ c_g + r̃_s)
            and the eliminated steps are recovered after the sweep as
                Δs = J_g Δ(x,u) + c_g,   Δν = Σ_s ∘ Δs + r̃_s.
            (δ regularisation is applied to the (x,u) block only — Σ_s > 0
            keeps the slack elimination well-posed at δ=0.)"""
            Sig_x = Sig[: H * nx].reshape(H, nx)
            Sig_u = Sig[H * nx: H * (nx + nu)].reshape(H, nu)
            M = M0.at[:, ix, ix].add(
                jnp.clip(jnp.nan_to_num(Sig_x, posinf=1e10), 0.0, 1e10))
            M = M.at[:, nx + iu, nx + iu].add(
                jnp.clip(jnp.nan_to_num(Sig_u, posinf=1e10), 0.0, 1e10))
            Sig_ss = []
            for (pc, r, off), Jg in zip(pcs, Jgs):
                Sig_s = Sig[n_primal + off: n_primal + off + H * r
                            ].reshape(H, r)
                Sig_s = jnp.clip(jnp.nan_to_num(Sig_s, posinf=1e10), 0.0,
                                 1e10)
                M = M + jnp.einsum("trn,tr,trm->tnm", Jg, Sig_s, Jg)
                Sig_ss.append(Sig_s)
            M = jnp.nan_to_num(M, posinf=1e10, neginf=-1e10)
            return M, Sig_ss

        M_base, Sig_ss_base = fold_sigma(Sigma)
        deltas = jnp.asarray(_DELTAS, w.dtype)

        def resolve(r_tilde2, c2_full, retry=True, Sigma2=None):
            """``retry=False`` does a single δ=0 sweep with no while_loop —
            required where resolve is traced inside lax.cond inside the
            line-search loop (the SOC call): a δ-retry while nested there
            faults the TPU compiler at fleet batch sizes (observed at
            B>=1024, H=50, 12-state).  ``Sigma2`` re-folds a fresh bound Σ
            into the cached stage blocks (the polish hook)."""
            if Sigma2 is None:
                M, Sig_ss = M_base, Sig_ss_base
            else:
                M, Sig_ss = fold_sigma(Sigma2)
            c2 = c2_full[: H * nx].reshape(H, nx)
            m_x = r_tilde2[: H * nx].reshape(H, nx)
            m_u = r_tilde2[H * nx: H * (nx + nu)].reshape(H, nu)
            cgs, rss = [], []
            for (pc, r, off), Jg, Sig_s in zip(pcs, Jgs, Sig_ss):
                cg = c2_full[H * nx + off: H * nx + off + H * r
                             ].reshape(H, r)
                rs = r_tilde2[n_primal + off: n_primal + off + H * r
                              ].reshape(H, r)
                d = jnp.einsum("trn,tr->tn", Jg, Sig_s * cg + rs)
                m_x = m_x + d[:, :nx]
                m_u = m_u + d[:, nx:]
                cgs.append(cg)
                rss.append(rs)

            def sweep(delta):
                dX, dU, dLam, okc = the_sweep(A, B, G, M, m_x, m_u, c2,
                                              delta)
                if pcs:
                    dxu = jnp.concatenate([dX, dU], axis=1)
                    ds_parts, dnu_parts = [], []
                    for Jg, Sig_s, cg, rs in zip(Jgs, Sig_ss, cgs, rss):
                        ds = jnp.einsum("trn,tn->tr", Jg, dxu) + cg
                        ds_parts.append(ds.reshape(-1))
                        dnu_parts.append((Sig_s * ds + rs).reshape(-1))
                    dw = nlp.pack(dX, dU, jnp.concatenate(ds_parts))
                    dlam = jnp.concatenate([dLam.reshape(-1)] + dnu_parts)
                else:
                    dw = nlp.pack(dX, dU)
                    dlam = dLam.reshape(-1)
                ok = (okc & jnp.all(jnp.isfinite(dw))
                      & jnp.all(jnp.isfinite(dlam)))
                return dw, dlam, ok

            if not retry:
                return sweep(deltas[0])

            def cond(carry):
                i, _, _, ok = carry
                return (~ok) & (i < len(_DELTAS))

            def body(carry):
                i, _, _, _ = carry
                dw, dlam, ok = sweep(deltas[i])
                return (i + 1, dw, dlam, ok)

            init = (jnp.asarray(0, jnp.int32), jnp.zeros_like(w),
                    jnp.zeros_like(lam), jnp.asarray(False))
            _, dw, dlam, ok = jax.lax.while_loop(cond, body, init)
            return dw, dlam, ok

        dw, dlam, ok = resolve(r_tilde, c_full)
        return dw, dlam, ok, resolve

    return direction
