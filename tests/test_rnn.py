"""GRU dynamics: lifted-state MPC end-to-end (BASELINE config 5 element)."""

import jax
import jax.numpy as jnp
import numpy as np

import pyneuralempc_tpu as nempc
from pyneuralempc_tpu.models.rnn import (fit_gru_on_sequences, gru_dynamics,
                                         gru_step)


def test_gru_step_shapes():
    gd = gru_dynamics(x_dim=2, u_dim=1, hidden=8)
    params = gd.init_params(jax.random.PRNGKey(0))
    z = jnp.zeros((5, 10))
    u = jnp.zeros((5, 1))
    out = gd.model(z, u, params=params)
    assert out.shape == (5, 10)


def test_gru_hidden_state_evolves():
    gd = gru_dynamics(x_dim=1, u_dim=1, hidden=4)
    params = gd.init_params(jax.random.PRNGKey(1))
    z = gd.lift(jnp.array([0.5]))
    out = gd.model(z[None, :], jnp.array([[0.7]]), params=params)[0]
    assert not np.allclose(np.asarray(out[1:]), 0.0)


def test_gru_fits_linear_system_and_solves_mpc():
    """Fit a GRU to a damped linear system from rollouts, then run MPC
    through the lifted model with the Riccati backend."""
    a, b = 0.9, 0.3

    rng = np.random.default_rng(0)
    N, T = 256, 12
    U = rng.uniform(-1, 1, (N, T, 1)).astype(np.float32)
    X = np.zeros((N, T + 1, 1), np.float32)
    X[:, 0, 0] = rng.uniform(-1, 1, N)
    for t in range(T):
        X[:, t + 1, 0] = a * X[:, t, 0] + b * U[:, t, 0]

    gd = gru_dynamics(x_dim=1, u_dim=1, hidden=8)
    params, mse = fit_gru_on_sequences(gd, jnp.asarray(X), jnp.asarray(U),
                                       steps=1500, lr=5e-3)
    assert mse < 5e-4, f"GRU failed to fit linear system: mse={mse}"

    cost = nempc.StageCost(
        stage=lambda z, u: (jnp.sum((z[:1] - 0.4) ** 2)
                            + 0.05 * jnp.sum(u ** 2)))
    box = gd.box(states_constraint=[[-2.0, 2.0]],
                 control_constraint=[[-1.0, 1.0]])
    mpc = nempc.NMPC(gd.model, cost, [box], H=10, DT=1.0,
                     integrator="direct",
                     config=nempc.IPConfig(max_iter=60))
    z0 = gd.lift(jnp.array([0.0]))
    res = mpc.next(z0, params=params)
    assert bool(res.converged)
    x_final = float(gd.head(res.x)[-1, 0])
    # setpoint 0.4 reachable: steady state x = b u/(1-a) = 3u -> u=0.133
    assert abs(x_final - 0.4) < 0.1
