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
