"""Native C++ KKT oracle vs the JAX solvers (independent validation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyneuralempc_tpu as nempc
from pyneuralempc_tpu.core.problem import StageCost
from pyneuralempc_tpu.solve.riccati import make_riccati_direction
from pyneuralempc_tpu.utils.native import solve_kkt_oracle


def test_oracle_solves_random_kkt():
    rng = np.random.default_rng(0)
    n, m = 12, 7
    Wr = rng.normal(size=(n, n)).astype(np.float32)
    W = (Wr + Wr.T) / 2
    Sigma = rng.uniform(0.1, 2.0, n).astype(np.float32)
    A = rng.normal(size=(m, n)).astype(np.float32)
    rt = rng.normal(size=n).astype(np.float32)
    rp = rng.normal(size=m).astype(np.float32)
    dw, dlam = solve_kkt_oracle(W, Sigma, A, rt, rp, delta_w=1.0)
    # residual check in f64
    Hk = W.astype(np.float64) + np.diag(Sigma.astype(np.float64)) + np.eye(n)
    r1 = Hk @ dw + A.astype(np.float64).T @ dlam + rt
    r2 = A.astype(np.float64) @ dw + rp
    assert np.abs(r1).max() < 1e-10
    assert np.abs(r2).max() < 1e-10


def test_oracle_batched():
    rng = np.random.default_rng(1)
    B, n, m = 4, 6, 3
    W = rng.normal(size=(B, n, n)).astype(np.float32)
    W = (W + W.transpose(0, 2, 1)) / 2
    Sigma = rng.uniform(0.1, 1.0, (B, n)).astype(np.float32)
    A = rng.normal(size=(B, m, n)).astype(np.float32)
    rt = rng.normal(size=(B, n)).astype(np.float32)
    rp = rng.normal(size=(B, m)).astype(np.float32)
    dw, dlam = solve_kkt_oracle(W, Sigma, A, rt, rp, delta_w=2.0)
    for b in range(B):
        dw1, dl1 = solve_kkt_oracle(W[b], Sigma[b], A[b], rt[b], rp[b],
                                    delta_w=2.0)
        np.testing.assert_allclose(dw[b], dw1, rtol=1e-12)


def lv_f(x, u):
    return jnp.concatenate(
        [0.5 * x[:, :1] - 0.025 * x[:, :1] * x[:, 1:],
         -0.5 * x[:, 1:] + u + 0.005 * x[:, :1] * x[:, 1:]], axis=1)


def test_riccati_direction_matches_oracle():
    """The structured (Riccati) direction must solve the same system the
    oracle solves — cross-language, cross-algorithm agreement."""
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = StageCost(stage=lambda x, u: 1.1 * jnp.sum(u)
                     + 0.05 * jnp.sum(x ** 2))
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    mpc = nempc.NMPC(model, cost, [box], H=6, DT=0.1, integrator="rk4")
    nlp = mpc.nlp
    rt = nempc.runtime(jnp.array([0.3, 0.2]))
    w = jnp.clip(mpc.cold_start(jnp.array([0.3, 0.2])).w,
                 nlp.lower + 0.05, nlp.upper - 0.05)
    lam = 0.1 * jnp.ones((nlp.m,))
    mu = 0.01
    sl, su = w - nlp.lower, nlp.upper - w
    Sigma = (mu / sl) / sl + (mu / su) / su
    g = jax.grad(nlp.objective)(w, rt)
    _, vjp = jax.vjp(lambda ww: nlp.constraints(ww, rt), w)
    r_tilde = g + vjp(lam)[0] - mu / sl + mu / su
    c = nlp.constraints(w, rt)

    direction = make_riccati_direction(nlp, mpc.config)
    dw_j, dlam_j, ok = jax.jit(
        lambda *a: direction(*a)[:3])(w, lam, rt, Sigma, r_tilde, c)
    assert bool(ok)

    W = jax.hessian(lambda ww: nlp.lagrangian(ww, lam, rt))(w)
    A = jax.jacrev(lambda ww: nlp.constraints(ww, rt))(w)
    dw_o, dlam_o = solve_kkt_oracle(np.asarray(W), np.asarray(Sigma),
                                    np.asarray(A), np.asarray(r_tilde),
                                    np.asarray(c))
    np.testing.assert_allclose(np.asarray(dw_j), dw_o, atol=5e-4)
    np.testing.assert_allclose(np.asarray(dlam_j), dlam_o, atol=5e-3)


def test_refine_kkt_point_polishes_qp():
    """f64 active-set Newton refinement (the golden-polishing role —
    VERDICT r2 item 5): on a box-constrained equality QP whose solution
    is known in closed form, a deliberately perturbed near-solution must
    refine back to the optimum despite f32 residual evaluation."""
    import numpy as np

    from pyneuralempc_tpu.utils.native import refine_kkt_point

    # min ½||w - t||² s.t. Σw = 1, w >= 0, with t = [-0.5, 0.3, 0.8]:
    # unconstrained-of-eq solution w = t + λ/3·1 projected; active set
    # {w0 = 0}; solving on {w0=0, w1+w2=1}: w* = [0, 0.25, 0.75]
    t = np.array([-0.5, 0.3, 0.8])
    w_star = np.array([0.0, 0.25, 0.75])
    lb = np.zeros(3)
    ub = np.full(3, np.inf)

    grad = lambda w: np.asarray(w, np.float64) - t
    cons = lambda w: np.array([np.sum(np.asarray(w, np.float64)) - 1.0])
    jac = lambda w: np.ones((1, 3))
    hess = lambda w, lam: np.eye(3)

    w0 = w_star + np.array([0.0, 3e-3, -2e-3])   # perturbed, active w0=0
    w_ref = refine_kkt_point(w0, grad, cons, jac, hess, lb, ub, iters=3)
    np.testing.assert_allclose(w_ref, w_star, atol=1e-6)
    # a wildly-off start must NOT be "refined" (polish, not restart):
    # the step cap freezes it
    w_bad = np.array([5.0, 5.0, 5.0])
    w_out = refine_kkt_point(w_bad, grad, cons, jac, hess, lb, ub)
    assert np.max(np.abs(w_out - w_bad)) < 1.0
