"""Stage-wise path constraints on the Riccati backend.

The slack-eliminated stage-constraint folding must produce the SAME Newton
direction as the dense full-space LU (they solve the same condensed KKT
system), and end-to-end solves must agree with the dense backend while
actually enforcing the nonlinear constraint.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyneuralempc_tpu as nempc
from pyneuralempc_tpu.core.problem import StageConstraint, StageCost
from pyneuralempc_tpu.solve.interior_point import IPConfig
from pyneuralempc_tpu.solve.riccati import eligible, make_riccati_direction


def lv_f(x, u):
    return jnp.concatenate(
        [0.5 * x[:, :1] - 0.025 * x[:, :1] * x[:, 1:],
         -0.5 * x[:, 1:] + u + 0.005 * x[:, :1] * x[:, 1:]], axis=1)


# nonlinear stage constraint: x0² + x1² <= 1.2 (an ellipse the LV orbit
# would otherwise cross), plus a linear one-sided row on u.
def make_pc():
    return nempc.stage_interval(
        lambda x, u: jnp.array([x[0] ** 2 + x[1] ** 2]),
        dim=1, lb=-np.inf, ub=1.2)


def make_mpc(kkt="auto", H=8, with_pc=True, hessian="exact"):
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = StageCost(stage=lambda x, u: 1.1 * jnp.sum(u)
                     + 0.05 * jnp.sum(x ** 2))
    box = nempc.DomainConstraint(
        states_constraint=[[-2.0, 2.0], [-2.0, 2.0]],
        control_constraint=[[-1.0, 1.0]])
    cons = [box, make_pc()] if with_pc else [box]
    return nempc.NMPC(model, cost, cons, H=H, DT=0.1, integrator="rk4",
                      config=IPConfig(max_iter=60, kkt=kkt,
                                      hessian=hessian))


def test_stage_constraint_trajectory_call():
    pc = make_pc()
    X = jnp.arange(6.0).reshape(3, 2)
    U = jnp.zeros((3, 1))
    g = pc(X, U)
    assert g.shape == (3, 1)
    np.testing.assert_allclose(np.asarray(g[:, 0]),
                               np.sum(np.arange(6.0).reshape(3, 2) ** 2, 1))


def test_eligibility_with_stage_constraints():
    mpc = make_mpc()
    assert mpc.kkt_backend == "riccati"
    assert eligible(mpc.nlp)
    # round 3: stage EQ rows ride the equality-constrained stage QP
    # inside the sweep (VERDICT r2 item 2) — still riccati
    eq_pc = StageConstraint(stage=lambda x, u: jnp.array([x[0]]),
                            dim=1, lb=(0.0,), ub=(0.0,))
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = StageCost(stage=lambda x, u: jnp.sum(u))
    mpc2 = nempc.NMPC(model, cost, [eq_pc], H=4, DT=0.1,
                      config=IPConfig(kkt="auto"))
    assert mpc2.kkt_backend == "riccati"
    # ...but > nu EQ rows per stage over-determine the stage control:
    # those genuinely need the dense backend
    eq2 = StageConstraint(stage=lambda x, u: jnp.array([x[0], x[1]]),
                          dim=2, lb=(0.0, 0.0), ub=(0.0, 0.0))
    mpc3 = nempc.NMPC(model, cost, [eq2], H=4, DT=0.1,
                      config=IPConfig(kkt="auto"))
    assert mpc3.kkt_backend == "dense"


def test_direction_matches_dense_with_active_constraint():
    """Same Σ/r̃/λ inputs -> same (Δw, Δλ) including the slack and path-dual
    components, at an iterate where the nonlinear constraint is ACTIVE."""
    mpc = make_mpc()
    nlp, cfg = mpc.nlp, mpc.config
    x0 = jnp.array([0.9, 0.6])     # ||x0||² = 1.17, near the 1.2 boundary
    rt = nempc.runtime(x0)

    carry = mpc.cold_start(x0)
    w = jnp.clip(carry.w + 0.02, nlp.lower + 0.03, nlp.upper - 0.03)
    lam = 0.1 * jnp.ones((nlp.m,))
    mu = 0.01
    sl = w - nlp.lower
    su = nlp.upper - w
    has_lb = jnp.isfinite(nlp.lower)
    has_ub = jnp.isfinite(nlp.upper)
    zl = jnp.where(has_lb, mu / sl, 0.0)
    zu = jnp.where(has_ub, mu / su, 0.0)
    Sigma = jnp.where(has_lb, zl / sl, 0.0) + jnp.where(has_ub, zu / su, 0.0)
    g = jax.grad(nlp.objective)(w, rt)
    _, vjp = jax.vjp(lambda ww: nlp.constraints(ww, rt), w)
    r_tilde = (g + vjp(lam)[0]
               - jnp.where(has_lb, mu / sl, 0.0)
               + jnp.where(has_ub, mu / su, 0.0))
    c = nlp.constraints(w, rt)

    ric = make_riccati_direction(nlp, cfg)
    dw_r, dlam_r, ok_r = jax.jit(
        lambda *a: ric(*a)[:3])(w, lam, rt, Sigma, r_tilde, c)
    assert bool(ok_r)

    W = jax.hessian(lambda ww: nlp.lagrangian(ww, lam, rt))(w)
    A = jax.jacrev(lambda ww: nlp.constraints(ww, rt))(w)
    n, m = nlp.n, nlp.m
    K = np.block([[np.asarray(W + jnp.diag(Sigma), np.float64),
                   np.asarray(A, np.float64).T],
                  [np.asarray(A, np.float64), np.zeros((m, m))]])
    sol = np.linalg.solve(K, -np.concatenate([
        np.asarray(r_tilde, np.float64), np.asarray(c, np.float64)]))
    np.testing.assert_allclose(np.asarray(dw_r), sol[:n], rtol=2e-3,
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(dlam_r), sol[n:], rtol=2e-3,
                               atol=3e-4)


def test_direction_matches_dense_gauss_newton():
    """Non-exact Hessian mode drops constraint curvature on both backends —
    directions must still agree (same modified system)."""
    mpc = make_mpc(hessian="objective")
    nlp, cfg = mpc.nlp, mpc.config
    x0 = jnp.array([0.9, 0.6])
    rt = nempc.runtime(x0)
    carry = mpc.cold_start(x0)
    w = jnp.clip(carry.w + 0.02, nlp.lower + 0.03, nlp.upper - 0.03)
    lam = 0.1 * jnp.ones((nlp.m,))
    mu = 0.01
    has_lb = jnp.isfinite(nlp.lower)
    has_ub = jnp.isfinite(nlp.upper)
    sl, su = w - nlp.lower, nlp.upper - w
    Sigma = (jnp.where(has_lb, (mu / sl) / sl, 0.0)
             + jnp.where(has_ub, (mu / su) / su, 0.0))
    g = jax.grad(nlp.objective)(w, rt)
    _, vjp = jax.vjp(lambda ww: nlp.constraints(ww, rt), w)
    r_tilde = (g + vjp(lam)[0]
               - jnp.where(has_lb, mu / sl, 0.0)
               + jnp.where(has_ub, mu / su, 0.0))
    c = nlp.constraints(w, rt)
    ric = make_riccati_direction(nlp, cfg)
    dw_r, dlam_r, ok_r = jax.jit(
        lambda *a: ric(*a)[:3])(w, lam, rt, Sigma, r_tilde, c)
    assert bool(ok_r)
    # dense reference with objective-only Hessian
    W = jax.hessian(lambda ww: nlp.objective(ww, rt))(w)
    A = jax.jacrev(lambda ww: nlp.constraints(ww, rt))(w)
    n, m = nlp.n, nlp.m
    K = np.block([[np.asarray(W + jnp.diag(Sigma), np.float64),
                   np.asarray(A, np.float64).T],
                  [np.asarray(A, np.float64), np.zeros((m, m))]])
    sol = np.linalg.solve(K, -np.concatenate([
        np.asarray(r_tilde, np.float64), np.asarray(c, np.float64)]))
    np.testing.assert_allclose(np.asarray(dw_r), sol[:n], rtol=2e-3,
                               atol=3e-4)


# controllable end-to-end workload: double integrator pushed rightward by an
# economic cost, with a nonlinear position constraint pos² <= 0.25 it would
# otherwise cross (binding but feasible: braking distance v²/6 << 0.5).
def di_f(x, u):
    return jnp.concatenate([x[:, 1:2], u], axis=1)


def make_di_mpc(kkt="riccati", with_pc=True, H=10):
    model = nempc.jax_dynamics(di_f, x_dim=2, u_dim=1)
    cost = StageCost(stage=lambda x, u: -x[0] + 0.1 * jnp.sum(u ** 2))
    box = nempc.DomainConstraint(
        states_constraint=[[-2.0, 2.0], [-3.0, 3.0]],
        control_constraint=[[-3.0, 3.0]])
    cons = [box, nempc.stage_interval(lambda x, u: jnp.array([x[0] ** 2]),
                                      dim=1, lb=-np.inf, ub=0.25)]
    if not with_pc:
        cons = [box]
    return nempc.NMPC(model, cost, cons, H=H, DT=0.1, integrator="rk4",
                      config=IPConfig(max_iter=80, kkt=kkt))


def test_end_to_end_riccati_matches_dense_with_constraint():
    x0 = jnp.array([0.0, 1.0])
    res_r = make_di_mpc(kkt="riccati").next(x0)
    res_d = make_di_mpc(kkt="dense").next(x0)
    assert bool(res_r.converged) and bool(res_d.converged)
    np.testing.assert_allclose(np.asarray(res_r.u), np.asarray(res_d.u),
                               atol=5e-4)
    # the constraint is actually enforced along the plan
    g = np.asarray(res_r.x[:, 0] ** 2)
    assert g.max() <= 0.25 + 1e-3
    # ... and actually active (the unconstrained plan would cross it)
    res_u = make_di_mpc(kkt="riccati", with_pc=False).next(x0)
    assert np.asarray(res_u.x[:, 0] ** 2).max() > 0.25 + 1e-2, \
        "constraint not binding - weak test"


def test_batched_stage_constraint_solve():
    mpc = make_di_mpc(kkt="riccati")
    x0s = jnp.stack([jnp.array([0.0, 1.0]), jnp.array([-0.3, 0.5]),
                     jnp.array([0.2, -0.4]), jnp.array([0.3, 0.8])])
    _, res = mpc.next_batch(x0s)
    assert bool(jnp.all(res.converged))
    g = np.asarray(res.x[..., 0] ** 2)
    assert g.max() <= 0.25 + 1e-3


def test_receding_horizon_with_stage_constraint():
    """Warm re-solves (shifted slacks) keep converging closed-loop."""
    mpc = make_di_mpc(kkt="riccati")
    x = jnp.array([0.0, 1.0])
    from pyneuralempc_tpu.ops.integrators import step_fn
    phi = step_fn(mpc.spec.model, "rk4", mpc.DT)
    for t in range(6):
        res = mpc.next(x)
        assert bool(res.converged), f"step {t} failed"
        x = phi(x[None, :], res.u[0][None, :])[0]
        assert float(x[0] ** 2) <= 0.25 + 1e-2


def test_stage_constraint_with_tvp():
    """tvp-dependent stage constraint rows (time-varying bound)."""
    model = nempc.jax_dynamics(lambda x, u, p, tvp: di_f(x, u),
                               x_dim=2, u_dim=1, tvp_dim=1)
    cost = StageCost(stage=lambda x, u, p, tvp: -x[0]
                     + 0.1 * jnp.sum(u ** 2))
    pc = nempc.stage_interval(
        lambda x, u, p, tvp: jnp.array([x[0] ** 2 - tvp[0]]),
        dim=1, lb=-np.inf, ub=0.0)
    box = nempc.DomainConstraint(
        states_constraint=[[-2.0, 2.0], [-3.0, 3.0]],
        control_constraint=[[-3.0, 3.0]])
    H = 10
    mpc = nempc.NMPC(model, cost, [box, pc], H=H, DT=0.1, integrator="rk4",
                     config=IPConfig(kkt="riccati", max_iter=80))
    tvp = jnp.linspace(0.36, 0.2, H)[:, None]
    res = mpc.next(jnp.array([0.0, 1.0]), tvp=tvp)
    assert bool(res.converged)
    g = np.asarray(res.x[:, 0] ** 2)
    assert (g <= np.asarray(tvp[:, 0]) + 1e-3).all()
