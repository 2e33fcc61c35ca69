"""Differentiable MPC: IFT gradients through the solve vs finite
differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyneuralempc_tpu as nempc
from pyneuralempc_tpu.core.problem import StageCost
from pyneuralempc_tpu.solve.diff import make_differentiable_solver
from pyneuralempc_tpu.solve.interior_point import IPConfig
from pyneuralempc_tpu.solve.riccati import make_riccati_direction


def lv_f(x, u):
    return jnp.concatenate(
        [0.5 * x[:, :1] - 0.025 * x[:, :1] * x[:, 1:],
         -0.5 * x[:, 1:] + u + 0.005 * x[:, :1] * x[:, 1:]], axis=1)


def build_mpc(riccati=True):
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = StageCost(stage=lambda x, u: 1.1 * jnp.sum(u)
                     + 0.2 * jnp.sum(x ** 2))
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    cfg = IPConfig(max_iter=80, tol=1e-6)
    mpc = nempc.NMPC(model, cost, [box], H=8, DT=0.1, integrator="rk4",
                     config=cfg)
    direction = make_riccati_direction if riccati else None
    solve = make_differentiable_solver(mpc.nlp, cfg, direction=direction)
    return mpc, solve


@pytest.mark.parametrize("riccati", [True, False])
def test_grad_wrt_x0_matches_fd(riccati):
    mpc, solve = build_mpc(riccati)

    def loss(x0):
        rt = nempc.runtime(x0)
        w0 = mpc.cold_start(jax.lax.stop_gradient(x0)).w
        res = solve(rt, w0)
        _, U, _ = mpc.nlp.unpack(res.w)
        return jnp.sum(U ** 2) + res.objective

    x0 = jnp.array([0.3, 0.2])
    g = jax.grad(loss)(x0)
    eps = 1e-3
    fd = np.zeros(2)
    for i in range(2):
        d = np.zeros(2)
        d[i] = eps
        fd[i] = (float(loss(x0 + d)) - float(loss(x0 - d))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), fd, rtol=0.05, atol=5e-3)


def test_grad_wrt_params_trains_through_mpc():
    """One gradient step on MLP dynamics params through the controller
    reduces a closed-plan loss — MPC as a differentiable layer."""
    from pyneuralempc_tpu.models.mlp import MLPDynamics

    model = MLPDynamics.make(x_dim=2, u_dim=1, hidden=[8])
    params = model.init_params(jax.random.PRNGKey(0))
    cost = StageCost(stage=lambda x, u: jnp.sum((x - 0.2) ** 2)
                     + 0.1 * jnp.sum(u ** 2))
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    cfg = IPConfig(max_iter=60, tol=1e-6)
    mpc = nempc.NMPC(model, cost, [box], H=6, DT=0.2, integrator="euler",
                     config=cfg)
    solve = make_differentiable_solver(mpc.nlp, cfg,
                                       direction=make_riccati_direction)
    x0 = jnp.array([0.1, -0.1])
    target_u = 0.15 * jnp.ones((6, 1))

    def loss(p):
        rt = nempc.runtime(x0, params=p)
        w0 = mpc.cold_start(x0, params=jax.lax.stop_gradient(p)).w
        res = solve(rt, jax.lax.stop_gradient(w0))
        _, U, _ = mpc.nlp.unpack(res.w)
        return jnp.sum((U - target_u) ** 2)

    l0, g = jax.value_and_grad(loss)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(l0) and gnorm > 0
    stepped = jax.tree_util.tree_map(lambda a, b: a - 0.05 * b, params, g)
    l1 = float(loss(stepped))
    assert l1 < float(l0)


def test_controller_differentiable_flag():
    """NMPC(differentiable=True): grad of a plan functional wrt x0 via the
    pure step() API."""
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = StageCost(stage=lambda x, u: 1.1 * jnp.sum(u)
                     + 0.2 * jnp.sum(x ** 2))
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    mpc = nempc.NMPC(model, cost, [box], H=6, DT=0.1, integrator="rk4",
                     config=IPConfig(max_iter=60, tol=1e-6),
                     differentiable=True)

    def loss(x0):
        carry = mpc.cold_start(jax.lax.stop_gradient(x0))
        _, res = mpc._step(carry, nempc.runtime(x0))
        return jnp.sum(res.u ** 2)

    g = jax.grad(loss)(jnp.array([0.3, 0.2]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_grad_with_polish_matches_fd():
    """Polish changes the returned point (μ = polish_mu stationary) and
    res.mu rides with it — the IFT gradient must stay FD-consistent."""
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = StageCost(stage=lambda x, u: 1.1 * jnp.sum(u)
                     + 0.2 * jnp.sum(x ** 2))
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    cfg = IPConfig(max_iter=80, tol=1e-6, polish_iters=3, polish_mu=1e-8)
    mpc = nempc.NMPC(model, cost, [box], H=8, DT=0.1, integrator="rk4",
                     config=cfg)
    solve = make_differentiable_solver(mpc.nlp, cfg,
                                       direction=make_riccati_direction)

    def loss(x0):
        rt = nempc.runtime(x0)
        w0 = mpc.cold_start(jax.lax.stop_gradient(x0)).w
        res = solve(rt, w0)
        _, U, _ = mpc.nlp.unpack(res.w)
        return jnp.sum(U ** 2) + res.objective

    x0 = jnp.array([0.3, 0.2])
    g = jax.grad(loss)(x0)
    eps = 1e-3
    fd = np.zeros(2)
    for i in range(2):
        d = np.zeros(2)
        d[i] = eps
        fd[i] = (float(loss(x0 + d)) - float(loss(x0 - d))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), fd, rtol=0.05, atol=5e-3)
