"""Objective structure auto-detection (core/structure.py).

The reference probes objective Hessian sparsity empirically at random
points (``objective/jax.py:59-90``); here the probe decides KKT-backend
routing: separable plain callables must reach the O(H) Riccati sweep, and
coupled ones must fall to the dense backend (with a warning at long H).
"""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

import pyneuralempc_tpu as nempc
from pyneuralempc_tpu.core.problem import Dims, StageCost
from pyneuralempc_tpu.core.structure import (SeparableObjective,
                                             probe_stage_separable)
from pyneuralempc_tpu.solve.interior_point import IPConfig


def lv_f(x, u):
    return jnp.concatenate(
        [0.5 * x[:, :1] - 0.025 * x[:, :1] * x[:, 1:],
         -0.5 * x[:, 1:] + u + 0.005 * x[:, :1] * x[:, 1:]], axis=1)


DIMS = Dims(x=2, u=1)


def test_probe_accepts_separable():
    assert probe_stage_separable(lambda x, u: jnp.sum(u), DIMS, H=8)
    assert probe_stage_separable(
        lambda x, u: jnp.sum(x ** 2) + jnp.sum(jnp.sin(u)), DIMS, H=8)
    # terminal term touches only the last stage's block: still separable
    assert probe_stage_separable(
        lambda x, u: jnp.sum(u ** 2) + 10.0 * jnp.sum(x[-1] ** 2),
        DIMS, H=8)
    # per-stage x·u bilinear coupling stays within one stage block
    assert probe_stage_separable(
        lambda x, u: jnp.sum(x[:, :1] * u), DIMS, H=8)


def test_probe_rejects_coupled():
    # adjacent-stage smoothing penalty couples (u_t, u_{t+1})
    assert not probe_stage_separable(
        lambda x, u: jnp.sum(u ** 2) + jnp.sum((u[1:] - u[:-1]) ** 2),
        DIMS, H=8)
    # long-range product coupling
    assert not probe_stage_separable(
        lambda x, u: x[0, 0] * x[-1, 0], DIMS, H=8)


def test_probe_rejects_failing_callable():
    def bad(x, u):
        raise RuntimeError("boom")
    assert not probe_stage_separable(bad, DIMS, H=4)


def test_probe_with_p_and_tvp():
    dims = Dims(x=2, u=1, p=3, tvp=2)
    assert probe_stage_separable(
        lambda x, u, p, tvp: jnp.sum(p[0] * u) + jnp.sum(tvp * x),
        dims, H=6)
    assert not probe_stage_separable(
        lambda x, u, p, tvp: jnp.sum(p[0] * u)
        + jnp.sum(tvp[1:] * x[1:] * x[:-1]), dims, H=6)


def test_plain_lambda_routes_to_riccati_and_matches_dense():
    """A separable plain-callable cost must (a) run on the Riccati backend
    and (b) produce the same controls as forcing the dense backend."""
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    cost = lambda x, u: 1.1 * jnp.sum(u) + 0.05 * jnp.sum(x ** 2)  # noqa
    x0 = jnp.asarray([0.4, -0.5])

    mpc_auto = nempc.NMPC(model, cost, [box], H=8, DT=0.1,
                          config=IPConfig(tol=1e-6))
    assert mpc_auto.kkt_backend == "riccati"
    assert isinstance(mpc_auto.spec.objective, SeparableObjective)
    res_r = mpc_auto.next(x0)

    mpc_dense = nempc.NMPC(model, cost, [box], H=8, DT=0.1,
                           config=IPConfig(tol=1e-6, kkt="dense"))
    res_d = mpc_dense.next(x0)
    assert bool(res_r.converged) and bool(res_d.converged)
    np.testing.assert_allclose(np.asarray(res_r.u), np.asarray(res_d.u),
                               atol=2e-5)

    # and against the declared-StageCost riccati path (same M blocks,
    # different computation route)
    mpc_sc = nempc.NMPC(
        model, StageCost(stage=lambda x, u: 1.1 * jnp.sum(u)
                         + 0.05 * jnp.sum(x ** 2)),
        [box], H=8, DT=0.1, config=IPConfig(tol=1e-6))
    assert mpc_sc.kkt_backend == "riccati"
    res_sc = mpc_sc.next(x0)
    np.testing.assert_allclose(np.asarray(res_r.u), np.asarray(res_sc.u),
                               atol=2e-5)


def test_coupled_cost_falls_dense_with_warning():
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    coupled = lambda x, u: (jnp.sum(u ** 2)                        # noqa
                            + jnp.sum((u[1:] - u[:-1]) ** 2))
    with pytest.warns(UserWarning, match="dense"):
        mpc = nempc.NMPC(model, coupled, [box], H=30, DT=0.05)
    assert mpc.kkt_backend == "dense"
    # short horizons stay silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        mpc2 = nempc.NMPC(model, coupled, [box], H=6, DT=0.05)
    assert mpc2.kkt_backend == "dense"
