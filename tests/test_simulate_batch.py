"""Batched on-device closed loop (api/simulate.closed_loop_batch).

Config-5-shaped evaluation: a fleet re-planning in lockstep inside one
``lax.scan`` program.  Must agree with the host-loop single-plant harness
member-for-member.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyneuralempc_tpu as nempc
from pyneuralempc_tpu.api.simulate import (closed_loop, closed_loop_batch,
                                           plant_from_model)
from pyneuralempc_tpu.core.problem import StageCost
from pyneuralempc_tpu.solve.interior_point import IPConfig


def lv_f(x, u):
    return jnp.concatenate(
        [0.5 * x[:, :1] - 0.025 * x[:, :1] * x[:, 1:],
         -0.5 * x[:, 1:] + u + 0.005 * x[:, :1] * x[:, 1:]], axis=1)


def make_mpc(H=8):
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = StageCost(stage=lambda x, u: 1.1 * jnp.sum(u)
                     + 0.05 * jnp.sum(x ** 2))
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    return nempc.NMPC(model, cost, [box], H=H, DT=0.1, integrator="rk4",
                      config=IPConfig(tol=1e-6))


X0S = jnp.asarray([[0.4, -0.5], [0.6, -0.7], [0.25, -0.4]])


def test_shapes_and_convergence():
    mpc = make_mpc()
    plant = plant_from_model(mpc.model, "rk4", 0.1)
    out = closed_loop_batch(mpc, plant, X0S, steps=4)
    B = X0S.shape[0]
    assert out.x.shape == (5, B, 2)
    assert out.u.shape == (4, B, 1)
    assert out.converged.shape == (5, B)     # 1 cold + 4 warm solves
    assert bool(jnp.all(out.converged))
    assert np.all(np.isfinite(np.asarray(out.x)))


@pytest.mark.slow
def test_matches_host_loop_per_member():
    """Member i of the batched loop must equal the single-plant host loop
    run from x0s[i] (same cadence, same warm-carry policy)."""
    mpc = make_mpc()
    plant = plant_from_model(mpc.model, "rk4", 0.1)
    out = closed_loop_batch(mpc, plant, X0S, steps=4, replan_every=2)
    for i in range(X0S.shape[0]):
        mpc_i = make_mpc()
        ref = closed_loop(mpc_i, plant, X0S[i], steps=4, replan_every=2)
        np.testing.assert_allclose(np.asarray(out.x[:, i]),
                                   np.asarray(ref.x), atol=5e-4)
        np.testing.assert_allclose(np.asarray(out.u[:, i]),
                                   np.asarray(ref.u), atol=5e-4)


def test_replan_cadence_validation():
    mpc = make_mpc()
    plant = plant_from_model(mpc.model, "rk4", 0.1)
    with pytest.raises(ValueError):
        closed_loop_batch(mpc, plant, X0S, steps=5, replan_every=2)
    with pytest.raises(ValueError):
        closed_loop_batch(mpc, plant, X0S, steps=16, replan_every=16)


def test_failure_policy_keeps_previous_plan():
    """A member whose re-plan fails keeps playing its (shifted) old plan:
    force failure by an absurd 1-iteration cap after a loose cold solve."""
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = StageCost(stage=lambda x, u: 1.1 * jnp.sum(u)
                     + 0.05 * jnp.sum(x ** 2))
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    mpc = nempc.NMPC(model, cost, [box], H=8, DT=0.1, integrator="rk4",
                     config=IPConfig(max_iter=1, tol=1e-10))
    plant = plant_from_model(mpc.model, "rk4", 0.1)
    out = closed_loop_batch(mpc, plant, X0S, steps=4)
    # nothing converges at 1 iteration / 1e-10; the loop must still
    # produce finite trajectories (playing the shifted cold plan)
    assert not bool(jnp.any(out.converged[1:]))
    assert np.all(np.isfinite(np.asarray(out.x)))


def test_tvp_seq_windows_reach_each_solve():
    """tvp_seq supplies a fresh look-ahead window per re-plan: a
    price-signal tvp flips sign between windows, so the planned controls
    must flip with it (proves each solve saw ITS window)."""
    model = nempc.jax_dynamics(lambda x, u, p=None, tvp=None: lv_f(x, u),
                               x_dim=2, u_dim=1, tvp_dim=1)
    cost = StageCost(stage=lambda x, u, p, tvp: jnp.sum(tvp[0] * u)
                     + 0.05 * jnp.sum(x ** 2))
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    H = 6
    mpc = nempc.NMPC(model, cost, [box], H=H, DT=0.1, integrator="rk4",
                     config=IPConfig(tol=1e-5))
    plant = plant_from_model(mpc.model, "rk4", 0.1)
    x0s = X0S[:2]
    # window 0,1: price +1 (push u to -1); window 2: price -1 (u to +1)
    tvp_seq = jnp.stack([jnp.full((H, 1), 1.0), jnp.full((H, 1), 1.0),
                         jnp.full((H, 1), -1.0)])
    out = closed_loop_batch(mpc, plant, x0s, steps=2, replan_every=1,
                            tvp_seq=tvp_seq)
    assert bool(jnp.all(out.converged))
    # applied u at step 0/1 come from price=+1 plans -> negative
    assert float(out.u[0].max()) < 0.0
    assert float(out.u[1].max()) < 0.0

    with pytest.raises(ValueError, match="n_replans"):
        closed_loop_batch(mpc, plant, x0s, steps=2, replan_every=1,
                          tvp_seq=tvp_seq[:2])


def test_per_member_params():
    """params with a leading batch axis = a different model per member."""
    from pyneuralempc_tpu.models.mlp import MLPDynamics
    sur = MLPDynamics.make(x_dim=2, u_dim=1, hidden=[8])
    p0 = sur.init_params(jax.random.PRNGKey(0))
    p1 = sur.init_params(jax.random.PRNGKey(1))
    params = jax.tree_util.tree_map(lambda a, b: jnp.stack([a, b]), p0, p1)
    cost = StageCost(stage=lambda x, u: jnp.sum(u ** 2)
                     + jnp.sum((x - 0.2) ** 2))
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    mpc = nempc.NMPC(sur, cost, [box], H=5, DT=0.1, integrator="rk4",
                     config=IPConfig(tol=1e-5))
    plant = plant_from_model(sur, "rk4", 0.1, params=p0)
    x0s = jnp.asarray([[0.1, 0.1], [0.1, 0.1]])   # same x0, different model
    out = closed_loop_batch(mpc, plant, x0s, steps=2, params=params)
    assert bool(jnp.all(out.converged))
    # different member models must produce different plans
    assert float(jnp.max(jnp.abs(out.u[:, 0] - out.u[:, 1]))) > 1e-4
