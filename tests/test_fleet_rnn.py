"""BASELINE config 5 capability: RNN (GRU) dynamics, H=100, fleet batch
sharded over the (virtual) mesh — compiles and solves end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyneuralempc_tpu as nempc
from pyneuralempc_tpu.models.rnn import fit_gru_on_sequences, gru_dynamics
from pyneuralempc_tpu.parallel.sharding import ShardedNMPC, make_mesh

pytestmark = [pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason="needs 8 (virtual) devices"),
              pytest.mark.slow]


def test_gru_fleet_h100_sharded():
    # fit a GRU to a 2-state damped linear system from rollouts
    A = np.array([[0.95, 0.05], [0.0, 0.9]], np.float32)
    Bm = np.array([[0.0], [0.2]], np.float32)
    rng = np.random.default_rng(0)
    N, T = 128, 16
    U = rng.uniform(-1, 1, (N, T, 1)).astype(np.float32)
    X = np.zeros((N, T + 1, 2), np.float32)
    X[:, 0] = rng.uniform(-1, 1, (N, 2))
    for t in range(T):
        X[:, t + 1] = X[:, t] @ A.T + U[:, t] @ Bm.T
    gd = gru_dynamics(x_dim=2, u_dim=1, hidden=8)
    params, mse = fit_gru_on_sequences(gd, jnp.asarray(X), jnp.asarray(U),
                                       steps=800, lr=5e-3)
    assert mse < 5e-3

    # H=100 economic MPC over the lifted GRU state, fleet of 16 sharded
    H = 100
    cost = nempc.StageCost(
        stage=lambda z, u: jnp.sum((z[:2] - jnp.array([0.3, 0.0])) ** 2)
        + 0.05 * jnp.sum(u ** 2))
    box = gd.box(states_constraint=[[-2.0, 2.0]] * 2,
                 control_constraint=[[-1.0, 1.0]])
    mpc = nempc.NMPC(gd.model, cost, [box], H=H, DT=1.0,
                     integrator="direct",
                     config=nempc.IPConfig(max_iter=40, kkt="riccati_pscan"))
    smpc = ShardedNMPC(mpc, make_mesh(8))
    z0s = jnp.asarray(np.concatenate(
        [rng.uniform(-0.5, 0.5, (16, 2)), np.zeros((16, 8))], axis=1),
        jnp.float32)
    carry, res = smpc.next_batch(z0s, params=params)
    assert res.u.shape == (16, H, 1)
    assert int(res.converged.sum()) >= 14   # fleet solves, H=100, pscan
    # warm re-plan stays converged
    carry, res2 = smpc.next_batch(z0s * 0.98, params=params, carry=carry)
    assert int(res2.converged.sum()) >= 14
