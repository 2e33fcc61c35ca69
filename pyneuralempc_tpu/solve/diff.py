"""Differentiable MPC: gradients through the solve via the implicit
function theorem.

The solution map θ → (w*, λ*) of the (barrier-smoothed) NLP satisfies the
stationarity system G(w, λ; θ) = 0 with

    G = ( ∇_w J(w; θ) + A(w; θ)ᵀ λ − μ/(w−lb) + μ/(ub−w),   C(w; θ) ).

Its Jacobian wrt (w, λ) is the symmetric condensed KKT matrix
[[W + Σ_μ, Aᵀ], [A, 0]] with the *primal* barrier curvature
Σ_μ = μ/sl² + μ/su², so reverse-mode sensitivities come from one extra
linear solve with the same matrix (self-transpose):

    q = K⁻¹ [w̄; λ̄],        θ̄ = −(∂G/∂θ)ᵀ q            (one vjp of G).

This wraps any solver built by :func:`..interior_point.make_solver` in a
``jax.custom_vjp``: forward = the ordinary solve; backward = one KKT solve
(reusing the same direction backend — dense LU or Riccati) plus one vjp of
the residuals wrt the runtime pytree (x0, p, tvp, NN params).  Training a
dynamics model or cost *through* the controller becomes an ordinary
``jax.grad``.  μ is the solver's final barrier parameter, so the gradient
is of the barrier-smoothed solution — smooth across active-set changes
(the standard differentiable-MPC treatment).

Caveats: gradients are meaningful only where the solve converged
(non-converged problems get zero gradients), and w0/dual warm starts are
treated as non-differentiable (the converged solution does not depend on
them).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..core.transcription import NLP
from .interior_point import IPConfig, IPResult, make_solver


def make_differentiable_solver(nlp: NLP, config: IPConfig = IPConfig(),
                               direction=None) -> Callable:
    """Like :func:`make_solver`, but the returned ``solve(rt, w0, ...)``
    is differentiable wrt the ``rt`` pytree."""
    import dataclasses

    # objective auto-scaling would make λ* correspond to a scaled J and
    # break the stationarity identity below — solve unscaled here.
    config = dataclasses.replace(config, auto_scale=False)
    base = make_solver(nlp, config, direction=direction)
    lb, ub = nlp.lower, nlp.upper
    has_lb = jnp.isfinite(lb)
    has_ub = jnp.isfinite(ub)

    if direction is not None:
        kkt_solve_fn = direction(nlp, config)
    else:
        # dense: reuse the full-space solve from a throwaway solver build
        kkt_solve_fn = None

    def _kkt_solve(w, lam, rt, Sigma, r_tilde, r_p):
        if kkt_solve_fn is not None:
            # direction backends return (dw, dlam, ok, resolve); the
            # resolve hook is only for the solver's SOC, drop it here
            return kkt_solve_fn(w, lam, rt, Sigma, r_tilde, r_p)[:3]
        # dense fallback: symmetric KKT LU (f32, equilibrated + refined)
        n, m = nlp.n, nlp.m
        W = jax.hessian(lambda ww: nlp.lagrangian(ww, lam, rt))(w)
        A = jax.jacrev(lambda ww: nlp.constraints(ww, rt))(w)
        K = jnp.block([[W + jnp.diag(Sigma), A.T],
                       [A, jnp.zeros((m, m), w.dtype)]])
        d = jax.lax.rsqrt(jnp.clip(jnp.max(jnp.abs(K), axis=1), 1e-8, None))
        Ks = K * d[:, None] * d[None, :]
        lu, piv = jax.scipy.linalg.lu_factor(Ks)
        rhs = jnp.concatenate([-r_tilde, -r_p])
        sol = d * jax.scipy.linalg.lu_solve((lu, piv), d * rhs)
        sol = sol + d * jax.scipy.linalg.lu_solve(
            (lu, piv), d * (rhs - K @ sol))
        return sol[:n], sol[n:], jnp.all(jnp.isfinite(sol))

    @jax.custom_vjp
    def _core(rt, w0):
        res = base(rt, w0)
        return res.w, res.lam, res

    def _core_fwd(rt, w0):
        res = base(rt, w0)
        return (res.w, res.lam, res), (rt, res)

    def _core_bwd(saved, cotangents):
        rt, res = saved
        w_bar, lam_bar, _ = cotangents
        w, lam, mu = res.w, res.lam, res.mu
        sl = jnp.where(has_lb, w - lb, 1.0)
        su = jnp.where(has_ub, ub - w, 1.0)
        Sigma = (jnp.where(has_lb, mu / sl ** 2, 0.0)
                 + jnp.where(has_ub, mu / su ** 2, 0.0))

        with jax.default_matmul_precision("float32"):
            q_w, q_lam, ok = _kkt_solve(w, lam, rt, Sigma, -w_bar, -lam_bar)

            def G(rtv):
                g = jax.grad(nlp.objective)(w, rtv)
                c, vjp = jax.vjp(lambda ww: nlp.constraints(ww, rtv), w)
                r_d = (g + vjp(lam)[0]
                       - jnp.where(has_lb, mu / sl, 0.0)
                       + jnp.where(has_ub, mu / su, 0.0))
                return r_d, c

            _, vjpG = jax.vjp(G, rt)
            rt_bar = vjpG((q_w, q_lam))[0]

        # zero everything when the solve failed; gradients would be garbage
        scale = jnp.where(res.converged & ok, -1.0, 0.0)
        rt_bar = jax.tree_util.tree_map(
            lambda x: None if x is None else scale * x, rt_bar,
            is_leaf=lambda x: x is None)
        w0_bar = jnp.zeros_like(res.w)
        return rt_bar, w0_bar

    _core.defvjp(_core_fwd, _core_bwd)

    def solve(rt, w0, lam0=None, zl0=None, zu0=None, mu0=None) -> IPResult:
        del lam0, zl0, zu0, mu0  # warm duals don't affect the fixed point
        w_star, lam_star, res = _core(rt, w0)
        # rebuild the result around the differentiable (w*, λ*) so user
        # functions of res.w / res.objective get IFT gradients
        return IPResult(w=w_star, lam=lam_star,
                        zl=res.zl, zu=res.zu, mu=res.mu,
                        converged=res.converged, iterations=res.iterations,
                        kkt_error=res.kkt_error,
                        objective=nlp.objective(w_star, rt),
                        theta=res.theta, feasible=res.feasible,
                        zl_warm=res.zl_warm, zu_warm=res.zu_warm)

    return solve
