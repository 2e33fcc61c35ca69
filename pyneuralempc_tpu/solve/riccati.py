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

from ..core.problem import (EQ_TYPE, PathConstraint, StageConstraint,
                            StageCost)
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
    """Reference implementation: lax.scan backward + forward (one problem).

    Per-stage local δ retry: a stage whose Quu loses positive definiteness
    gets its gain recomputed with an escalating LOCAL bump from
    ``_LOCAL_DELTAS`` (Quu diagonal only) — the SAME semantics as the
    Pallas kernel's per-lane retry, so the scan and kernel backends follow
    identical iterate paths for the same problem (round-2 advisor finding:
    they used to diverge, scan failing where the kernel silently rescued).
    ``ok=False`` means even the largest local bump failed; the outer
    solver's global-δ ladder then re-sweeps.
    """
    from ..ops.pallas.riccati_kernel import _LOCAL_DELTAS
    H, nx = c.shape
    nu = B.shape[2]
    dtype = A.dtype
    ix = jnp.arange(nx)
    iu = jnp.arange(nu)
    eye_u = jnp.eye(nu, dtype=dtype)
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

        # local δ retry (first success wins); pivot criterion matches the
        # kernel's (pivot² > 1e-12 ⟺ diag(L) > 1e-6).  The bumps are
        # nudge-scale only — genuine indefiniteness reports ok=False so
        # the outer global-δ ladder convexifies the whole horizon (see
        # _LOCAL_DELTAS in ops/pallas/riccati_kernel.py)
        L_sel, ok_t = None, None
        for d in _LOCAL_DELTAS:
            L_d = jnp.linalg.cholesky(Quu + d * eye_u)
            ok_d = (jnp.all(jnp.isfinite(L_d))
                    & jnp.all(jnp.diagonal(L_d) > 1e-6))
            if L_sel is None:
                L_sel, ok_t = L_d, ok_d
            else:
                newly = ok_d & ~ok_t
                L_sel = jnp.where(newly, L_d, L_sel)
                ok_t = ok_t | ok_d
        L_safe = jnp.where(ok_t, L_sel, eye_u)
        K = -jax.scipy.linalg.cho_solve((L_safe, True), Qux)
        k = -jax.scipy.linalg.cho_solve((L_safe, True), qu)
        okc = okc & ok_t
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


def _chol_local_retry(Q, eye):
    """Cholesky with the shared per-stage local-δ escalation
    (``_LOCAL_DELTAS`` — same semantics as the Pallas kernel and the plain
    scan sweep).  Returns ``(L_safe, ok)``."""
    from ..ops.pallas.riccati_kernel import _LOCAL_DELTAS
    L_sel, ok_t = None, None
    for d in _LOCAL_DELTAS:
        L_d = jnp.linalg.cholesky(Q + d * eye)
        ok_d = (jnp.all(jnp.isfinite(L_d))
                & jnp.all(jnp.diagonal(L_d) > 1e-6))
        if L_sel is None:
            L_sel, ok_t = L_d, ok_d
        else:
            newly = ok_d & ~ok_t
            L_sel = jnp.where(newly, L_d, L_sel)
            ok_t = ok_t | ok_d
    return jnp.where(ok_t, L_sel, eye), ok_t


def riccati_sweep_general(A, B, G, M, m_x, m_u, c, delta, delta_c=1e-8,
                          E=None, F=None, h=None, Jx=None):
    """Dispatching wrapper around :func:`riccati_sweep_general_ref`.

    Like :func:`riccati_sweep`, this is bound through
    ``jax.custom_batching.custom_vmap``: the unbatched call runs the scan
    reference; under ``vmap`` on TPU the whole batch dispatches to the
    streamed general Pallas kernels
    (:func:`~pyneuralempc_tpu.ops.pallas.riccati_kernel.
    riccati_sweep_general_pallas`) when the (H, nx, nu, R, r) working set
    fits VMEM — closing the hole where EQ/border-constrained fleets had
    only the XLA scan, the shape that faults the TPU compiler at fleet
    batch sizes on the plain path (fleet_tpu6_noker.log).
    """
    from ..ops.pallas.riccati_kernel import riccati_sweep_general_custom
    R, H, nx = c.shape
    nu = B.shape[2]
    dtype = A.dtype
    if E is None or E.shape[1] == 0:
        E = jnp.zeros((H, 0, nu), dtype)
        F = jnp.zeros((H, 0, nx), dtype)
        h = jnp.zeros((R, H, 0), dtype)
        Jx = jnp.zeros((H, 0, nx), dtype)
    dc = jnp.asarray(delta_c, dtype)
    return riccati_sweep_general_custom(A, B, G, M, m_x, m_u, c,
                                        jnp.asarray(delta, dtype), dc,
                                        E, F, h, Jx)


def riccati_sweep_general_ref(A, B, G, M, m_x, m_u, c, delta, delta_c=1e-8,
                              E=None, F=None, h=None, Jx=None):
    """Multi-right-hand-side, optionally equality-constrained Riccati sweep
    (one problem; ``vmap`` for batches) — lax.scan reference.

    Extends :func:`riccati_sweep_ref` two ways (VERDICT r2 item 2):

    * **Multi-rhs**: the linear terms carry a leading rhs axis R —
      ``m_x (R,H,nx)``, ``m_u (R,H,nu)``, ``c (R,H,nx)`` — while the
      factorisation pass (Q blocks, gains ``K``, value Hessian ``P``) is
      rhs-independent and computed ONCE.  This is what makes the bordered
      Schur complement for trajectory-level constraints O(H·(q+1)) instead
      of O(H·q·stage³-refactorisations).
    * **Per-stage equality rows** ``g_t(x_{t+1}, u_t) = 0`` (``r`` rows per
      stage, r <= nu): with ``E = J_x B + J_u`` (H,r,nu), ``F = J_x A``
      (H,r,nx), ``h = −(c_g + J_x c)`` (R,H,r) the stage subproblem is the
      equality-constrained QP

          min ½ΔuᵀQuuΔu + (qu+QuxΔx)ᵀΔu   s.t.  E Δu = h − F Δx

      solved by a Schur complement on chol(Quu) (S = E Quu⁻¹ Eᵀ + δ_c I),
      giving Δu = KΔx + k, multiplier Δν = K_ν Δx + k_ν, and the
      value-function update P ← Qxx + QuxᵀK + FᵀK_ν,
      p ← qx + Quxᵀk + Fᵀk_ν (the equality-constrained LQR recursion).
      ``Jx = ∂g/∂x_{t+1}`` (H,r,nx) feeds the co-state correction
      Δλ_t += Jxᵀ Δν_t.

    Returns ``(dX, dU, dLam, dNu, ok)`` with leading R axis (``dNu`` is
    zeros-shaped (R,H,0) when no equality rows).  The reference handles
    these rows through Ipopt's sparse solver
    (``/root/reference/pyNeuralEMPC/optimizer/ipopt.py:44-52,88-96``); here
    they ride the O(H) sweep.
    """
    R, H, nx = c.shape
    nu = B.shape[2]
    dtype = A.dtype
    has_eq = E is not None and E.shape[1] > 0
    r_eq = E.shape[1] if has_eq else 0
    ix = jnp.arange(nx)
    iu = jnp.arange(nu)
    eye_u = jnp.eye(nu, dtype=dtype)
    Md = M.at[:, ix, ix].add(delta)
    Md = Md.at[:, nx + iu, nx + iu].add(delta)
    if not has_eq:
        E = jnp.zeros((H, 0, nu), dtype)
        F = jnp.zeros((H, 0, nx), dtype)
        h = jnp.zeros((R, H, 0), dtype)
        Jx = jnp.zeros((H, 0, nx), dtype)
    eye_r = jnp.eye(r_eq, dtype=dtype)

    def backward(carry, blocks):
        P, pv, okc = carry                       # pv: (R, nx)
        A_t, B_t, G_t, M_t, mx_t, mu_t, c_t, E_t, F_t, h_t = blocks
        Mxx = M_t[:nx, :nx]
        Mxu = M_t[:nx, nx:]
        Muu = M_t[nx:, nx:]
        Pbar = P + Mxx
        pbar = pv + mx_t                         # (R, nx)
        PA = Pbar @ A_t
        PB = Pbar @ B_t
        Qxx = A_t.T @ PA + G_t[:nx, :nx]
        BtMxu = B_t.T @ Mxu
        Quu = B_t.T @ PB + Muu + BtMxu + BtMxu.T + G_t[nx:, nx:]
        Qux = B_t.T @ PA + Mxu.T @ A_t + G_t[nx:, :nx]
        Pc_p = c_t @ Pbar.T + pbar               # (R, nx)
        qx = Pc_p @ A_t                          # (R, nx)
        qu = Pc_p @ B_t + c_t @ Mxu + mu_t       # (R, nu)

        L, ok_t = _chol_local_retry(Quu, eye_u)
        solve_u = lambda rhs: jax.scipy.linalg.cho_solve((L, True), rhs)
        du0K = -solve_u(Qux)                     # (nu, nx)
        du0k = -solve_u(qu.T)                    # (nu, R)
        if has_eq:
            Y = solve_u(E_t.T)                   # (nu, r)
            S = E_t @ Y + delta_c * eye_r
            Ls, ok_s = _chol_local_retry(0.5 * (S + S.T), eye_r)
            solve_s = lambda rhs: jax.scipy.linalg.cho_solve((Ls, True),
                                                             rhs)
            Knu = solve_s(E_t @ du0K + F_t)      # (r, nx)
            knu = solve_s(E_t @ du0k - h_t.T)    # (r, R)
            K = du0K - Y @ Knu
            k = du0k - Y @ knu
            P_new = Qxx + Qux.T @ K + F_t.T @ Knu
            p_new = qx + k.T @ Qux + knu.T @ F_t
            ok_t = ok_t & ok_s
        else:
            Knu = jnp.zeros((0, nx), dtype)
            knu = jnp.zeros((0, R), dtype)
            K, k = du0K, du0k
            P_new = Qxx + Qux.T @ K
            p_new = qx + k.T @ Qux
        P_new = 0.5 * (P_new + P_new.T)
        okc = okc & ok_t
        return (P_new, p_new, okc), (K, k.T, Pbar, pbar, Mxu, Knu, knu.T)

    init = (jnp.zeros((nx, nx), dtype), jnp.zeros((R, nx), dtype),
            jnp.asarray(True))
    (_, _, okc), (K, k, Pbar, pbar, Mxu, Knu, knu) = jax.lax.scan(
        backward, init,
        (A, B, G, Md, jnp.swapaxes(m_x, 0, 1), jnp.swapaxes(m_u, 0, 1),
         jnp.swapaxes(c, 0, 1), E, F, jnp.swapaxes(h, 0, 1)),
        reverse=True)

    def forward(dx, blocks):                     # dx: (R, nx)
        A_t, B_t, c_t, K_t, k_t, Pb, pb, Mxu_t, Knu_t, knu_t, Jx_t = blocks
        du = dx @ K_t.T + k_t                    # (R, nu)
        dnu = dx @ Knu_t.T + knu_t               # (R, r)
        dx_next = dx @ A_t.T + du @ B_t.T + c_t
        dlam_t = dx_next @ Pb.T + du @ Mxu_t.T + pb + dnu @ Jx_t
        return dx_next, (dx_next, du, dlam_t, dnu)

    dx0 = jnp.zeros((R, nx), dtype)
    _, (dX, dU, dLam, dNu) = jax.lax.scan(
        forward, dx0,
        (A, B, jnp.swapaxes(c, 0, 1), K, k, Pbar, pbar, Mxu, Knu, knu, Jx))
    to_r = lambda z: jnp.swapaxes(z, 0, 1)       # (H,R,·) -> (R,H,·)
    return to_r(dX), to_r(dU), to_r(dLam), to_r(dNu), okc


def eligible(nlp: NLP) -> bool:
    """Riccati eligibility: a stage-separable cost — declared
    (:class:`StageCost`) or probe-certified
    (:class:`~pyneuralempc_tpu.core.structure.SeparableObjective`).

    Constraints (round 3 — VERDICT r2 item 2 closed both exclusions):

    * :class:`StageConstraint` with any row mix: inequality/interval rows
      fold into the sweep by slack elimination; equality rows ride the
      equality-constrained stage QP inside
      :func:`riccati_sweep_general` (needs total EQ rows per stage <= nu
      for a full-row-rank stage system — beyond that the stage control is
      over-determined and the dense backend applies).
    * trajectory-level :class:`PathConstraint` rows become a low-rank
      BORDER: the banded part is factorised by the sweep and the q border
      rows by a Schur complement (q+1 shared-factorisation sweeps + one
      dense q×q solve).  Capped at q <= 64 rows — past that the border
      algebra stops being "low-rank" and dense wins.
    """
    spec = nlp.spec
    if spec is None or not isinstance(spec.objective,
                                      (StageCost, SeparableObjective)):
        return False
    nu = spec.dims.u
    eq_rows_per_stage = 0
    border_rows = 0
    for pc in spec.path_constraints:
        if isinstance(pc, StageConstraint):
            eq_rows_per_stage += int((pc.row_types() == EQ_TYPE).sum())
        elif isinstance(pc, PathConstraint):
            border_rows += pc.dim
        else:
            return False
    return eq_rows_per_stage <= nu and border_rows <= 64


def make_riccati_direction(nlp: NLP, cfg, sweep_impl=None) -> Callable:
    """KKT backend factory for :func:`..interior_point.make_solver`.

    ``sweep_impl``: the sweep function (defaults to :func:`riccati_sweep`,
    i.e. scan reference + Pallas under vmap; pass
    :func:`~pyneuralempc_tpu.solve.pscan.riccati_sweep_pscan` for the
    O(log H) parallel-in-time variant).  Only the plain fast path (no stage
    EQ rows, no trajectory border) accepts a custom sweep — the
    EQ/bordered paths use :func:`riccati_sweep_general`.

    Three constraint regimes, all O(H) (VERDICT r2 item 2):

    * stage inequality/interval rows — slack Σ condensed into the stage
      Hessian blocks (the fast path; Pallas kernel under vmap);
    * stage EQUALITY rows — equality-constrained stage QPs inside
      :func:`riccati_sweep_general`'s backward recursion;
    * trajectory-level :class:`PathConstraint` rows — a low-rank BORDER:
      the banded KKT is factorised once by a multi-rhs sweep (base rhs +
      one per border row, shared factorisation), then a dense q×q Schur
      system couples the border multipliers.  Border-row curvature
      ν᷉ᵀ∇²g is dense across stages and is deliberately dropped from the
      step model (Gauss-Newton treatment of the border): the KKT
      residuals still carry the rows exactly, so the CONVERGED point is
      the true stationary point — only the step model is inexact, which
      the merit line search absorbs.
    """
    if not eligible(nlp):
        raise ValueError(
            "Riccati KKT backend needs a stage-separable objective "
            "(StageCost / probe-certified), stage EQ rows totalling <= nu "
            "per stage, and at most 64 trajectory-level border rows; "
            "anything else falls to the dense backend.")
    the_sweep = sweep_impl if sweep_impl is not None else riccati_sweep
    spec = nlp.spec
    H, nx, nu = spec.H, spec.dims.x, spec.dims.u
    n_primal = spec.n_primal
    phi = step_fn(spec.model, spec.integrator, spec.DT)
    stage_cost = spec.objective

    # ---- static constraint-layout metadata (numpy, build time) ----
    # Rows of C after the defects follow spec order; the slack segment of w
    # likewise.  Stage rows are stage-major: rows [t·r, (t+1)·r) belong to
    # stage t, and a stage pc's slacks are its non-EQ rows in row order.
    import numpy as _np
    stage_pcs, traj_pcs = [], []
    _row, _sl = 0, 0
    for pc in spec.path_constraints:
        if isinstance(pc, StageConstraint):
            types = pc.row_types()
            eq_idx = _np.nonzero(types == EQ_TYPE)[0]
            in_idx = _np.nonzero(types != EQ_TYPE)[0]
            stage_pcs.append(dict(pc=pc, r=pc.dim, row_off=_row,
                                  slack_off=_sl, eq_idx=eq_idx,
                                  in_idx=in_idx))
            _row += H * pc.dim
            _sl += H * len(in_idx)
        else:
            eq_mask = pc.row_types() == EQ_TYPE
            traj_pcs.append(dict(pc=pc, q=pc.dim, row_off=_row,
                                 slack_off=_sl, eq_mask=eq_mask,
                                 n_sl=int((~eq_mask).sum())))
            _row += pc.dim
            _sl += int((~eq_mask).sum())
    r_eq_total = sum(len(s["eq_idx"]) for s in stage_pcs)
    q_total = sum(t["q"] for t in traj_pcs)
    fast = (r_eq_total == 0 and q_total == 0)
    if not fast and sweep_impl is not None:
        raise ValueError(
            "custom sweep implementations (horizon sharding / pscan) "
            "support only the plain Riccati path; stage EQ rows and "
            "trajectory-level border constraints use the general sweep "
            "(scan on CPU, streamed Pallas kernels on TPU) on this "
            "release")

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
        # ν_t covers ALL rows (EQ rows' multipliers live in λ directly;
        # slack rows' multipliers likewise — the rows are 1:1 with λ).
        Jgs = []
        for s in stage_pcs:
            pc, r = s["pc"], s["r"]
            nu_rows = lam[H * nx + s["row_off"]:
                          H * nx + s["row_off"] + H * r].reshape(H, r)

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

        # Trajectory-level border Jacobians (dense q × n_primal — q is
        # small by eligibility).  Border-row curvature is NOT added to the
        # stage blocks (it is dense across stages): Gauss-Newton treatment
        # of the border — see the factory docstring.
        Jqs = []
        xu_flat = w[:n_primal]
        for tp in traj_pcs:
            def gfun_q(z, _pc=tp["pc"]):
                Xz = z[: H * nx].reshape(H, nx)
                Uz = z[H * nx:].reshape(H, nu)
                return jnp.atleast_1d(_call_user_fn(
                    _pc.fn, Xz, Uz, p, tvp)).reshape(-1)
            Jqs.append(jax.jacrev(gfun_q)(xu_flat))
        return A, B, G, M, Jgs, Jqs

    ix = jnp.arange(nx)
    iu = jnp.arange(nu)
    n_w = nlp.n
    n_cons = nlp.m

    def prepare(w, lam, rt):
        """The expensive part of a KKT solve: per-stage derivative blocks
        by vmapped autodiff (+ border Jacobians).  Returns a plain array
        pytree, so the solver can carry the factorisation data through its
        iteration loop and reuse it for the cheap-polish phase (split
        direction protocol)."""
        A, B, G, M0, Jgs, Jqs = stage_blocks(w, lam, rt)
        G = jnp.nan_to_num(G, posinf=1e10, neginf=-1e10)
        M0 = jnp.nan_to_num(M0, posinf=1e10, neginf=-1e10)
        return (A, B, G, M0, tuple(Jgs), tuple(Jqs))

    def fold_sigma(M0, Jgs, Sig):
        """Σ (bounds) + stage-constraint slack elimination into the
        per-stage Hessian blocks.  With slack rows  g_t(x_{t+1}, u_t)
        − s_t = −c_g and slack stationarity  Σ_s Δs − Δν = −r̃_s,
        eliminating (Δs, Δν) condenses into the stage blocks:
            M_t += J_gᵀ Σ_s J_g      (non-EQ rows of J_g only)
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
        for s, Jg in zip(stage_pcs, Jgs):
            n_in = len(s["in_idx"])
            if n_in == 0:
                Sig_ss.append(None)
                continue
            Jg_in = Jg[:, jnp.asarray(s["in_idx"]), :]
            Sig_s = Sig[n_primal + s["slack_off"]:
                        n_primal + s["slack_off"] + H * n_in
                        ].reshape(H, n_in)
            Sig_s = jnp.clip(jnp.nan_to_num(Sig_s, posinf=1e10), 0.0,
                             1e10)
            M = M + jnp.einsum("trn,tr,trm->tnm", Jg_in, Sig_s, Jg_in)
            Sig_ss.append(Sig_s)
        M = jnp.nan_to_num(M, posinf=1e10, neginf=-1e10)
        return M, Sig_ss

    deltas = jnp.asarray(_DELTAS, jnp.float32)

    def _stage_rhs(Jgs, Sig_ss, r_tilde2, c2_full):
        """Base right-hand side: r̃ sliced to (x, u) plus the condensed
        stage-slack terms; also returns the per-pc (cg_in, rs) for step
        recovery and the per-pc EQ-row residuals."""
        c2 = c2_full[: H * nx].reshape(H, nx)
        m_x = r_tilde2[: H * nx].reshape(H, nx)
        m_u = r_tilde2[H * nx: H * (nx + nu)].reshape(H, nu)
        cg_ins, rss, cg_eqs = [], [], []
        for s, Jg, Sig_s in zip(stage_pcs, Jgs, Sig_ss):
            rows = c2_full[H * nx + s["row_off"]:
                           H * nx + s["row_off"] + H * s["r"]
                           ].reshape(H, s["r"])
            if len(s["eq_idx"]):
                cg_eqs.append(rows[:, jnp.asarray(s["eq_idx"])])
            else:
                cg_eqs.append(None)
            n_in = len(s["in_idx"])
            if n_in == 0:
                cg_ins.append(None)
                rss.append(None)
                continue
            cg_in = rows[:, jnp.asarray(s["in_idx"])]
            rs = r_tilde2[n_primal + s["slack_off"]:
                          n_primal + s["slack_off"] + H * n_in
                          ].reshape(H, n_in)
            Jg_in = Jg[:, jnp.asarray(s["in_idx"]), :]
            d = jnp.einsum("trn,tr->tn", Jg_in, Sig_s * cg_in + rs)
            m_x = m_x + d[:, :nx]
            m_u = m_u + d[:, nx:]
            cg_ins.append(cg_in)
            rss.append(rs)
        return c2, m_x, m_u, cg_ins, rss, cg_eqs

    def _recover(dX, dU, dLam_def, dNu_eq, Jgs, Sig_ss, cg_ins, rss,
                 traj_parts):
        """Assemble (dw, dlam) in the transcription's layout: recover the
        eliminated stage slacks/multipliers, scatter EQ-row multipliers
        into their row positions, append border slacks/multipliers."""
        dxu = jnp.concatenate([dX, dU], axis=1)
        slack_parts, lam_parts = [], [jnp.asarray(dLam_def).reshape(-1)]
        eq_col = 0
        for s, Jg, Sig_s, cg_in, rs in zip(stage_pcs, Jgs, Sig_ss,
                                           cg_ins, rss):
            lam_rows = jnp.zeros((H, s["r"]), dX.dtype)
            n_in = len(s["in_idx"])
            if n_in:
                Jg_in = Jg[:, jnp.asarray(s["in_idx"]), :]
                ds = jnp.einsum("trn,tn->tr", Jg_in, dxu) + cg_in
                slack_parts.append(ds.reshape(-1))
                lam_rows = lam_rows.at[:, jnp.asarray(s["in_idx"])].set(
                    Sig_s * ds + rs)
            n_eq = len(s["eq_idx"])
            if n_eq:
                lam_rows = lam_rows.at[:, jnp.asarray(s["eq_idx"])].set(
                    dNu_eq[:, eq_col: eq_col + n_eq])
                eq_col += n_eq
            lam_parts.append(lam_rows.reshape(-1))
        for tp, (ds_q, dnu_q) in zip(traj_pcs, traj_parts):
            if tp["n_sl"]:
                slack_parts.append(ds_q)
            lam_parts.append(dnu_q)
        s_all = (jnp.concatenate(slack_parts) if slack_parts
                 else jnp.zeros((0,), dX.dtype))
        dw = nlp.pack(dX, dU, s_all)
        dlam = jnp.concatenate(lam_parts)
        ok = jnp.all(jnp.isfinite(dw)) & jnp.all(jnp.isfinite(dlam))
        return dw, dlam, ok

    # ---- fast path: no EQ rows, no border — Pallas-dispatched sweep ----
    def solve_blocks_fast(blocks, Sigma, r_tilde2, c2_full, retry=True):
        """Solve the condensed KKT system from prepared blocks.

        ``retry=False`` does a single δ=0 sweep with no while_loop —
        required where this is traced inside lax.cond inside the
        line-search loop (the SOC call): a δ-retry while nested there
        faults the TPU compiler at fleet batch sizes (observed at
        B>=1024, H=50, 12-state).  Σ is folded per call, so fresh bound
        Σ's (the polish phase) need no re-preparation."""
        A, B, G, M0, Jgs, _ = blocks
        M, Sig_ss = fold_sigma(M0, Jgs, Sigma)
        c2, m_x, m_u, cg_ins, rss, _ = _stage_rhs(Jgs, Sig_ss, r_tilde2,
                                                  c2_full)
        dtype = c2.dtype

        def sweep(delta):
            dX, dU, dLam, okc = the_sweep(A, B, G, M, m_x, m_u, c2,
                                          delta)
            dw, dlam, okp = _recover(dX, dU, dLam,
                                     jnp.zeros((H, 0), dtype), Jgs,
                                     Sig_ss, cg_ins, rss, [])
            return dw, dlam, okc & okp

        if not retry:
            return sweep(deltas[0].astype(dtype))

        def cond(carry):
            i, _, _, ok = carry
            return (~ok) & (i < len(_DELTAS))

        def body(carry):
            i, _, _, _ = carry
            dw, dlam, ok = sweep(deltas[i].astype(dtype))
            return (i + 1, dw, dlam, ok)

        init = (jnp.asarray(0, jnp.int32), jnp.zeros((n_w,), dtype),
                jnp.zeros((n_cons,), dtype), jnp.asarray(False))
        _, dw, dlam, ok = jax.lax.while_loop(cond, body, init)
        return dw, dlam, ok

    # ---- general path: stage EQ rows and/or trajectory border ----
    def solve_blocks_general(blocks, Sigma, r_tilde2, c2_full, retry=True):
        A, B, G, M0, Jgs, Jqs = blocks
        M, Sig_ss = fold_sigma(M0, Jgs, Sigma)
        c2, m_x, m_u, cg_ins, rss, cg_eqs = _stage_rhs(
            Jgs, Sig_ss, r_tilde2, c2_full)
        dtype = c2.dtype

        # stage EQ data: E = JxB + Ju, F = JxA, h = −(c_g + Jx c)
        if r_eq_total:
            Jx_eq = jnp.concatenate(
                [Jg[:, jnp.asarray(s["eq_idx"]), :nx]
                 for s, Jg in zip(stage_pcs, Jgs) if len(s["eq_idx"])],
                axis=1)                                  # (H, r_eq, nx)
            Ju_eq = jnp.concatenate(
                [Jg[:, jnp.asarray(s["eq_idx"]), nx:]
                 for s, Jg in zip(stage_pcs, Jgs) if len(s["eq_idx"])],
                axis=1)
            cg_eq = jnp.concatenate(
                [ce for ce in cg_eqs if ce is not None], axis=1)
            E = jnp.einsum("trk,tku->tru", Jx_eq, B) + Ju_eq
            F = jnp.einsum("trk,tkn->trn", Jx_eq, A)
            h0 = -(cg_eq + jnp.einsum("trk,tk->tr", Jx_eq, c2))
        else:
            Jx_eq = E = F = None
            h0 = jnp.zeros((H, 0), dtype)

        # border data: rows, per-row dual regularisation D, condensed rhs
        if q_total:
            Jq_all = jnp.concatenate(Jqs, axis=0)        # (q, n_primal)
            D_rows, cq_hats, Sq_fulls, rq_fulls = [], [], [], []
            for tp, Jq in zip(traj_pcs, Jqs):
                q = tp["q"]
                cq = c2_full[H * nx + tp["row_off"]:
                             H * nx + tp["row_off"] + q]
                eq_m = jnp.asarray(tp["eq_mask"])
                Sq_full = jnp.ones((q,), dtype)
                rq_full = jnp.zeros((q,), dtype)
                if tp["n_sl"]:
                    idx = jnp.asarray(_np.nonzero(~tp["eq_mask"])[0])
                    Sq = jnp.clip(jnp.nan_to_num(
                        Sigma[n_primal + tp["slack_off"]:
                              n_primal + tp["slack_off"] + tp["n_sl"]],
                        posinf=1e10), 1e-10, 1e10)
                    rq = r_tilde2[n_primal + tp["slack_off"]:
                                  n_primal + tp["slack_off"] + tp["n_sl"]]
                    Sq_full = Sq_full.at[idx].set(Sq)
                    rq_full = rq_full.at[idx].set(rq)
                D_rows.append(jnp.where(eq_m, cfg.delta_c, 1.0 / Sq_full))
                cq_hats.append(cq + jnp.where(eq_m, 0.0,
                                              rq_full / Sq_full))
                Sq_fulls.append(Sq_full)
                rq_fulls.append(rq_full)
            D_all = jnp.concatenate(D_rows)
            cq_hat_all = jnp.concatenate(cq_hats)
            # rhs stack: base + one per border row (Jq row as the linear
            # term, zero defect/EQ residuals)
            Jq_x = Jq_all[:, : H * nx].reshape(q_total, H, nx)
            Jq_u = Jq_all[:, H * nx:].reshape(q_total, H, nu)
            m_x_all = jnp.concatenate([m_x[None], Jq_x], axis=0)
            m_u_all = jnp.concatenate([m_u[None], Jq_u], axis=0)
            c_all = jnp.concatenate(
                [c2[None], jnp.zeros((q_total, H, nx), dtype)], axis=0)
            h_all = jnp.concatenate(
                [h0[None], jnp.zeros((q_total,) + h0.shape, dtype)],
                axis=0)
        else:
            m_x_all, m_u_all = m_x[None], m_u[None]
            c_all, h_all = c2[None], h0[None]

        def sweep(delta):
            dX, dU, dLam, dNu, okc = riccati_sweep_general(
                A, B, G, M, m_x_all, m_u_all, c_all, delta,
                delta_c=cfg.delta_c, E=E, F=F, h=h_all, Jx=Jx_eq)
            if q_total:
                # bordered Schur: (Jq Y − D) Δν_q = −(ĉ_q + Jq Δxu₀)
                Ymat = jnp.concatenate(
                    [dX[1:].reshape(q_total, -1),
                     dU[1:].reshape(q_total, -1)], axis=1)  # rows = Y_i
                dxu0 = jnp.concatenate([dX[0].reshape(-1),
                                        dU[0].reshape(-1)])
                S_b = Jq_all @ Ymat.T - jnp.diag(D_all)
                rhs_b = -(cq_hat_all + Jq_all @ dxu0)
                dnu_b = jnp.linalg.solve(S_b, rhs_b)
                okc = okc & jnp.all(jnp.isfinite(dnu_b))
                dX_f = dX[0] + jnp.einsum(
                    "qhn,q->hn", dX[1:], dnu_b)
                dU_f = dU[0] + jnp.einsum(
                    "qhn,q->hn", dU[1:], dnu_b)
                dLam_f = dLam[0] + jnp.einsum(
                    "qhn,q->hn", dLam[1:], dnu_b)
                dNu_f = dNu[0] + jnp.einsum(
                    "qhr,q->hr", dNu[1:], dnu_b)
                # border slack/multiplier recovery per pc
                traj_parts, col = [], 0
                for tp, Sq_full, rq_full in zip(traj_pcs, Sq_fulls,
                                                rq_fulls):
                    dnu_q = dnu_b[col: col + tp["q"]]
                    if tp["n_sl"]:
                        idx = jnp.asarray(_np.nonzero(~tp["eq_mask"])[0])
                        ds_q = ((dnu_q - rq_full) / Sq_full)[idx]
                    else:
                        ds_q = jnp.zeros((0,), dtype)
                    traj_parts.append((ds_q, dnu_q))
                    col += tp["q"]
            else:
                dX_f, dU_f, dLam_f, dNu_f = dX[0], dU[0], dLam[0], dNu[0]
                traj_parts = []
            dw, dlam, okp = _recover(dX_f, dU_f, dLam_f, dNu_f, Jgs,
                                     Sig_ss, cg_ins, rss, traj_parts)
            return dw, dlam, okc & okp

        if not retry:
            return sweep(deltas[0].astype(dtype))

        def cond(carry):
            i, _, _, ok = carry
            return (~ok) & (i < len(_DELTAS))

        def body(carry):
            i, _, _, _ = carry
            dw, dlam, ok = sweep(deltas[i].astype(dtype))
            return (i + 1, dw, dlam, ok)

        init = (jnp.asarray(0, jnp.int32), jnp.zeros((n_w,), dtype),
                jnp.zeros((n_cons,), dtype), jnp.asarray(False))
        _, dw, dlam, ok = jax.lax.while_loop(cond, body, init)
        return dw, dlam, ok

    solve_blocks = solve_blocks_fast if fast else solve_blocks_general

    def direction(w, lam, rt, Sigma, r_tilde, c_full):
        """Returns ``(dw, dlam, ok, resolve)``; ``resolve(r_tilde2, c2)``
        re-solves with the SAME stage blocks (the expensive autodiff) and a
        new right-hand side — the second-order-correction / cheap-polish
        hook (pass ``Sigma2`` to also re-fold a fresh bound Σ)."""
        blocks = prepare(w, lam, rt)

        def resolve(r_tilde2, c2_full, retry=True, Sigma2=None):
            return solve_blocks(blocks,
                                Sigma if Sigma2 is None else Sigma2,
                                r_tilde2, c2_full, retry=retry)

        dw, dlam, ok = solve_blocks(blocks, Sigma, r_tilde, c_full)
        return dw, dlam, ok, resolve

    direction.prepare = prepare
    direction.solve_blocks = solve_blocks
    return direction
