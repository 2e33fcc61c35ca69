"""Horizon (sequence-parallel) sharded Riccati sweep on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyneuralempc_tpu.parallel.horizon import (make_horizon_mesh,
                                               make_sharded_sweep)
from pyneuralempc_tpu.solve.riccati import riccati_sweep_ref

from test_pscan import make_data

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def batch_args(B=8, H=32, nx=3, nu=2):
    datas = [make_data(H=H, nx=nx, nu=nu, seed=s) for s in range(B)]
    args = [jnp.stack([d[i] for d in datas]) for i in range(7)]
    return args + [jnp.zeros((B,), jnp.float32)]


@pytest.mark.parametrize("n_horizon", [2, 4, 8])
def test_sharded_matches_sequential(n_horizon):
    args = batch_args()
    ref = jax.vmap(riccati_sweep_ref)(*args)
    mesh = make_horizon_mesh(8 // n_horizon, n_horizon)
    out = make_sharded_sweep(mesh)(*args)
    assert bool(jnp.all(out[3]))
    for r, o in zip(ref[:3], out[:3]):
        scale = float(jnp.max(jnp.abs(r))) + 1.0
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=2e-4 * scale)


def test_sharded_long_horizon():
    """H=128 over 4 horizon shards x 2 scenario shards."""
    args = batch_args(B=4, H=128, nx=2, nu=1)
    ref = jax.vmap(riccati_sweep_ref)(*args)
    out = make_sharded_sweep(make_horizon_mesh(2, 4))(*args)
    assert bool(jnp.all(out[3]))
    scale = float(jnp.max(jnp.abs(ref[0]))) + 1.0
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               atol=1e-3 * scale)


def test_sharded_output_sharding():
    """Outputs stay sharded over both mesh axes (no implicit gather)."""
    args = batch_args(B=8, H=32)
    mesh = make_horizon_mesh(2, 4)
    out = make_sharded_sweep(mesh)(*args)
    ndev = {s.device.id for s in out[0].addressable_shards}
    assert len(ndev) == 8


def test_end_to_end_horizon_solve():
    """Full IP solve with the horizon-sharded KKT backend (NMPC(mesh=...))
    matches the plain Riccati solve."""
    import pyneuralempc_tpu as nempc

    H, B = 8, 4

    def f(x, u):
        return jnp.concatenate([x[:, 1:], u - 0.2 * x[:, :1]], axis=1)

    model = nempc.jax_dynamics(f, x_dim=2, u_dim=1)
    cost = nempc.StageCost(
        stage=lambda x, u: jnp.sum(u ** 2) + jnp.sum((x - 0.3) ** 2))
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    kw = dict(H=H, DT=0.1, integrator="rk4", config=nempc.IPConfig())
    ref_mpc = nempc.NMPC(model, cost, [box], **kw)
    sh_mpc = nempc.NMPC(model, cost, [box],
                        mesh=make_horizon_mesh(2, 4), **kw)
    assert sh_mpc.kkt_backend == "riccati_horizon"

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 2)), jnp.float32)
    _, r_ref = ref_mpc.next_batch(x0s)
    _, r_sh = sh_mpc.next_batch(x0s)
    assert bool(jnp.all(r_ref.converged))
    assert bool(jnp.all(r_sh.converged))
    np.testing.assert_allclose(np.asarray(r_sh.u), np.asarray(r_ref.u),
                               atol=5e-4)


def test_end_to_end_horizon_solve_with_stage_constraint():
    """Sequence-parallel solve with an ACTIVE nonlinear StageConstraint:
    the constraint's slack-Σ folding happens in the shared stage blocks,
    so the horizon-sharded sweep must reproduce the plain Riccati solve."""
    import pyneuralempc_tpu as nempc

    H, B = 8, 4

    def f(x, u):
        return jnp.concatenate([x[:, 1:], u - 0.2 * x[:, :1]], axis=1)

    model = nempc.jax_dynamics(f, x_dim=2, u_dim=1)
    cost = nempc.StageCost(
        stage=lambda x, u: jnp.sum(u ** 2) + jnp.sum((x - 0.5) ** 2))
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    # nonlinear stage constraint that the (x -> 0.5) pull activates
    pc = nempc.stage_interval(
        lambda x, u: jnp.array([x[0] ** 2 + x[1] ** 2]), dim=1,
        lb=-jnp.inf, ub=0.09)
    kw = dict(H=H, DT=0.1, integrator="rk4",
              config=nempc.IPConfig(tol=1e-6))
    ref_mpc = nempc.NMPC(model, cost, [box, pc], **kw)
    sh_mpc = nempc.NMPC(model, cost, [box, pc],
                        mesh=make_horizon_mesh(2, 4), **kw)
    assert ref_mpc.kkt_backend == "riccati"
    assert sh_mpc.kkt_backend == "riccati_horizon"

    rng = np.random.default_rng(0)
    # start inside the constraint ball (|x0|² well under 0.09) — starts
    # outside it are locally infeasible for a one-step-reach constraint
    x0s = jnp.asarray(rng.uniform(-0.15, 0.15, (B, 2)), jnp.float32)
    _, r_ref = ref_mpc.next_batch(x0s)
    _, r_sh = sh_mpc.next_batch(x0s)
    assert bool(jnp.all(r_ref.converged)) and bool(jnp.all(r_sh.converged))
    # the constraint is active somewhere (otherwise this tests nothing)
    g = np.asarray(r_ref.x[..., 0] ** 2 + r_ref.x[..., 1] ** 2)
    assert g.max() > 0.09 - 1e-3
    np.testing.assert_allclose(np.asarray(r_sh.u), np.asarray(r_ref.u),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(r_sh.slack),
                               np.asarray(r_ref.slack), atol=5e-4)
