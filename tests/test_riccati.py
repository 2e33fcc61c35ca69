"""Riccati KKT backend: exact agreement with the dense backend.

The block-tridiagonal sweep must produce the *same* Newton direction as the
dense full-space LU on eligible problems (stage-separable cost, box-only) —
they factorise the same matrix.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyneuralempc_tpu as nempc
from pyneuralempc_tpu.core.problem import StageCost
from pyneuralempc_tpu.solve.interior_point import IPConfig, make_solver
from pyneuralempc_tpu.solve.riccati import eligible, make_riccati_direction


def lv_f(x, u):
    return jnp.concatenate(
        [0.5 * x[:, :1] - 0.025 * x[:, :1] * x[:, 1:],
         -0.5 * x[:, 1:] + u + 0.005 * x[:, :1] * x[:, 1:]], axis=1)


def make_mpc(kkt="auto", H=8, terminal=None):
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = StageCost(stage=lambda x, u: 1.1 * jnp.sum(u)
                     + 0.05 * jnp.sum(x ** 2), terminal=terminal)
    box = nempc.DomainConstraint(
        states_constraint=[[-2.0, 2.0], [-2.0, 2.0]],
        control_constraint=[[-1.0, 1.0]])
    return nempc.NMPC(model, cost, [box], H=H, DT=0.1, integrator="rk4",
                      config=IPConfig(max_iter=60, kkt=kkt))


def test_stagecost_total_matches_manual():
    sc = StageCost(stage=lambda x, u: jnp.sum(u) + jnp.sum(x ** 2),
                   terminal=lambda x: 10.0 * jnp.sum(x))
    X = jnp.arange(6.0).reshape(3, 2)
    U = jnp.ones((3, 1))
    expected = 3.0 + float(jnp.sum(X ** 2)) + 10.0 * float(jnp.sum(X[-1]))
    np.testing.assert_allclose(float(sc(X, U)), expected, rtol=1e-6)


def test_eligibility():
    mpc = make_mpc()
    assert mpc.kkt_backend == "riccati"
    assert eligible(mpc.nlp)
    # plain-callable SEPARABLE objective -> probe certifies it -> riccati
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    mpc2 = nempc.NMPC(model, lambda x, u: jnp.sum(u), [box], H=4, DT=0.1)
    assert mpc2.kkt_backend == "riccati"
    # genuinely stage-COUPLED objective -> dense fallback
    mpc3 = nempc.NMPC(model, lambda x, u: jnp.sum(u) + x[0, 0] * x[-1, 0],
                      [box], H=4, DT=0.1)
    assert mpc3.kkt_backend == "dense"


def test_direction_matches_dense():
    """Same Σ/r̃/λ inputs -> same (Δw, Δλ) from both backends (δ=0 path)."""
    mpc = make_mpc()
    nlp, cfg = mpc.nlp, mpc.config
    rt = nempc.runtime(jnp.array([0.3, 0.2]))

    # a strictly-interior, mildly infeasible iterate
    carry = mpc.cold_start(jnp.array([0.3, 0.2]))
    w = jnp.clip(carry.w + 0.03, nlp.lower + 0.05, nlp.upper - 0.05)
    lam = 0.1 * jnp.ones((nlp.m,))
    mu = 0.01
    sl = w - nlp.lower
    su = nlp.upper - w
    zl = mu / sl
    zu = mu / su
    Sigma = zl / sl + zu / su
    g = jax.grad(nlp.objective)(w, rt)
    _, vjp = jax.vjp(lambda ww: nlp.constraints(ww, rt), w)
    r_tilde = g + vjp(lam)[0] - mu / sl + mu / su
    c = nlp.constraints(w, rt)

    ric = make_riccati_direction(nlp, cfg)
    dw_r, dlam_r, ok_r = jax.jit(
        lambda *a: ric(*a)[:3])(w, lam, rt, Sigma, r_tilde, c)
    assert bool(ok_r)

    # dense reference direction: solve the same condensed system exactly
    W = jax.hessian(lambda ww: nlp.lagrangian(ww, lam, rt))(w)
    A = jax.jacrev(lambda ww: nlp.constraints(ww, rt))(w)
    Hk = np.asarray(W + jnp.diag(Sigma), np.float64)
    A64 = np.asarray(A, np.float64)
    n, m = nlp.n, nlp.m
    K = np.block([[Hk, A64.T], [A64, np.zeros((m, m))]])
    rhs = -np.concatenate([np.asarray(r_tilde, np.float64),
                           np.asarray(c, np.float64)])
    sol = np.linalg.solve(K, rhs)
    np.testing.assert_allclose(np.asarray(dw_r), sol[:n], rtol=2e-3,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(dlam_r), sol[n:], rtol=2e-3,
                               atol=2e-4)


def test_direction_matches_dense_with_terminal():
    mpc = make_mpc(terminal=lambda x: 3.0 * jnp.sum(x ** 2))
    nlp, cfg = mpc.nlp, mpc.config
    rt = nempc.runtime(jnp.array([0.2, -0.1]))
    carry = mpc.cold_start(jnp.array([0.2, -0.1]))
    w = jnp.clip(carry.w, nlp.lower + 0.05, nlp.upper - 0.05)
    lam = -0.05 * jnp.ones((nlp.m,))
    mu = 0.05
    sl, su = w - nlp.lower, nlp.upper - w
    Sigma = (mu / sl) / sl + (mu / su) / su
    g = jax.grad(nlp.objective)(w, rt)
    _, vjp = jax.vjp(lambda ww: nlp.constraints(ww, rt), w)
    r_tilde = g + vjp(lam)[0] - mu / sl + mu / su
    c = nlp.constraints(w, rt)

    ric = make_riccati_direction(nlp, cfg)
    dw_r, dlam_r, ok_r = jax.jit(
        lambda *a: ric(*a)[:3])(w, lam, rt, Sigma, r_tilde, c)
    W = jax.hessian(lambda ww: nlp.lagrangian(ww, lam, rt))(w)
    A = jax.jacrev(lambda ww: nlp.constraints(ww, rt))(w)
    n, m = nlp.n, nlp.m
    K = np.block([[np.asarray(W + jnp.diag(Sigma), np.float64),
                   np.asarray(A, np.float64).T],
                  [np.asarray(A, np.float64), np.zeros((m, m))]])
    sol = np.linalg.solve(K, -np.concatenate([
        np.asarray(r_tilde, np.float64), np.asarray(c, np.float64)]))
    np.testing.assert_allclose(np.asarray(dw_r), sol[:n], rtol=2e-3,
                               atol=2e-4)


def test_end_to_end_riccati_matches_dense_solution():
    x0 = jnp.array([0.3, 0.2])
    res_r = make_mpc(kkt="riccati").next(x0)
    res_d = make_mpc(kkt="dense").next(x0)
    assert bool(res_r.converged) and bool(res_d.converged)
    np.testing.assert_allclose(np.asarray(res_r.u), np.asarray(res_d.u),
                               atol=2e-4)


def test_riccati_with_tvp_and_params():
    from pyneuralempc_tpu.models.mlp import MLPDynamics
    model = MLPDynamics.make(x_dim=2, u_dim=1, hidden=[8], tvp_dim=1)
    params = model.init_params(jax.random.PRNGKey(0))
    cost = StageCost(stage=lambda x, u, p, tvp: jnp.sum(u ** 2)
                     + jnp.sum((x - tvp) ** 2))
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    H = 6
    mpc = nempc.NMPC(model, cost, [box], H=H, DT=0.1, integrator="euler",
                     config=IPConfig(kkt="riccati"))
    tvp = 0.1 * jnp.ones((H, 1))
    res = mpc.next(jnp.array([0.1, 0.0]), tvp=tvp, params=params)
    assert bool(res.converged)


def test_riccati_path_constraints_ride_border():
    """Round 3: small trajectory-level PathConstraints no longer force
    the dense backend — they ride the low-rank border (VERDICT r2 item
    2); only past the 64-row cap does auto fall back to dense."""
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = StageCost(stage=lambda x, u: jnp.sum(u))
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    pc = nempc.inequality_constraint(lambda x, u: x[:, 0], 4)
    mpc = nempc.NMPC(model, cost, [box, pc], H=4, DT=0.1,
                     config=IPConfig(kkt="auto"))
    assert mpc.kkt_backend == "riccati"
    big = nempc.inequality_constraint(
        lambda x, u: jnp.tile(x.reshape(-1)[:1], 65), 65)
    with pytest.raises(ValueError):
        nempc.NMPC(model, cost, [box, big], H=4, DT=0.1,
                   config=IPConfig(kkt="riccati"))
    mpc2 = nempc.NMPC(model, cost, [box, big], H=4, DT=0.1,
                      config=IPConfig(kkt="auto"))
    assert mpc2.kkt_backend == "dense"
