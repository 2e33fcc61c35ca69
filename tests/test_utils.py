"""Checkpointing, derivative checker, timing utils."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyneuralempc_tpu as nempc
from pyneuralempc_tpu.models.mlp import MLPDynamics
from pyneuralempc_tpu.utils.check import check_model, check_problem
from pyneuralempc_tpu.utils.checkpoint import load_pytree, save_pytree
from pyneuralempc_tpu.utils.timing import time_fn


def lv_f(x, u):
    return jnp.concatenate(
        [0.5 * x[:, :1] - 0.025 * x[:, :1] * x[:, 1:],
         -0.5 * x[:, 1:] + u + 0.005 * x[:, :1] * x[:, 1:]], axis=1)


def test_checkpoint_roundtrip_params(tmp_path):
    model = MLPDynamics.make(x_dim=2, u_dim=1, hidden=[8, 8])
    params = model.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "params.npz")
    save_pytree(path, params)
    loaded = load_pytree(path, params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_warmstart_carry(tmp_path):
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = lambda x, u: jnp.sum(u * 1.1)
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    mpc = nempc.NMPC(model, cost, [box], H=8, DT=0.1)
    res = mpc.next(jnp.array([0.3, 0.2]))
    carry = mpc._carry
    path = str(tmp_path / "carry.npz")
    save_pytree(path, carry)
    restored = load_pytree(path, carry)
    np.testing.assert_array_equal(np.asarray(carry.w),
                                  np.asarray(restored.w))
    # resuming from the restored carry converges immediately
    mpc._carry = restored
    res2 = mpc.next(jnp.array([0.3, 0.2]))
    assert bool(res2.converged)
    assert int(res2.iterations) <= int(res.iterations)


def test_checkpoint_shape_validation(tmp_path):
    path = str(tmp_path / "bad.npz")
    save_pytree(path, {"a": jnp.zeros((3,))})
    with pytest.raises(ValueError):
        load_pytree(path, {"a": jnp.zeros((4,))})


def test_check_model_smooth():
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    rep = check_model(model)
    assert rep["ok"], rep


def test_check_model_catches_nondifferentiable():
    bad = nempc.jax_dynamics(lambda x, u: jnp.abs(x) * 1000.0 + u * 0,
                             x_dim=1, u_dim=1)
    # |x| at random points is differentiable a.e.; probe near the kink
    rep = check_model(bad, x=jnp.array([[1e-5], [-1e-5], [0.0]]),
                      u=jnp.zeros((3, 1)))
    assert not rep["ok"]


def test_check_problem():
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = lambda x, u: jnp.sum(u * 1.1) + jnp.sum(x ** 2)
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    mpc = nempc.NMPC(model, cost, [box], H=5, DT=0.1)
    rep = check_problem(mpc, jnp.array([0.3, 0.2]))
    assert rep["ok"], rep


def test_time_fn_reports():
    f = jax.jit(lambda x: x * 2)
    stats = time_fn(f, jnp.ones(16), warmup=1, iters=3)
    assert stats["p50"] > 0 and stats["min"] <= stats["p50"]
