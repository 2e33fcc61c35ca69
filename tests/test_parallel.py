"""Scenario sharding on the virtual 8-device CPU mesh (SURVEY §4's
fake-device testing strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyneuralempc_tpu as nempc
from pyneuralempc_tpu.models.mlp import MLPDynamics
from pyneuralempc_tpu.parallel.sharding import (ShardedNMPC, make_mesh,
                                                shard_leading)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


@pytest.fixture(scope="module")
def mpc_and_params():
    model = MLPDynamics.make(x_dim=2, u_dim=1, hidden=[8])
    params = model.init_params(jax.random.PRNGKey(0))
    cost = lambda x, u: jnp.sum(u ** 2) + jnp.sum(x[:, 0] ** 2)
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    mpc = nempc.NMPC(model, cost, [box], H=6, DT=0.1, integrator="rk4",
                     config=nempc.IPConfig(max_iter=30))
    return mpc, params


def _x0s(B):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(-0.5, 0.5, (B, 2)), jnp.float32)


def test_mesh_creation():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("scenario",)


def test_shard_leading_places_shards():
    mesh = make_mesh(8)
    x = shard_leading(jnp.zeros((16, 3)), mesh)
    assert len({s.device.id for s in x.addressable_shards}) == 8


def test_sharded_matches_unsharded(mpc_and_params):
    mpc, params = mpc_and_params
    mesh = make_mesh(8)
    smpc = ShardedNMPC(mpc, mesh)
    x0s = _x0s(16)
    _, sharded = smpc.next_batch(x0s, params=params)
    _, plain = mpc.next_batch(x0s, params=params)
    assert bool(jnp.all(sharded.converged == plain.converged))
    # sharded vs unsharded differ by f32 fusion/reduction order only
    np.testing.assert_allclose(np.asarray(sharded.u), np.asarray(plain.u),
                               atol=1e-3)


def test_sharded_receding_horizon_carry(mpc_and_params):
    mpc, params = mpc_and_params
    mesh = make_mesh(8)
    smpc = ShardedNMPC(mpc, mesh)
    x0s = _x0s(16)
    carry, res1 = smpc.next_batch(x0s, params=params)
    carry, res2 = smpc.next_batch(x0s, params=params, carry=carry)
    assert int(res2.converged.sum()) == 16
    # warm-started second solve should be no slower than the cold one
    assert int(jnp.max(res2.iterations)) <= int(jnp.max(res1.iterations))


def test_indivisible_batch_rejected(mpc_and_params):
    mpc, params = mpc_and_params
    smpc = ShardedNMPC(mpc, make_mesh(8))
    with pytest.raises(ValueError):
        smpc.next_batch(_x0s(12), params=params)


def test_graft_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[1].u.shape == (8, 10, 1)


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_sharded_hot_path_has_no_data_collectives(mpc_and_params):
    """Structural scaling guarantee (docs/SCALING.md), both modes:

    * independent (shard_map, the default): the compiled warm step must
      contain NO collectives AT ALL — each shard runs its own while_loop
      and exits on its own (zero cross-shard traffic, no lockstep).
    * GSPMD (independent=False): no DATA collectives; the only cross-
      shard traffic permitted is the batched while_loop's pred[]
      (one-boolean) all-reduce termination test.
    """
    import re

    from pyneuralempc_tpu.core.problem import runtime
    from pyneuralempc_tpu.parallel.sharding import replicate

    mpc, params = mpc_and_params
    mesh = make_mesh(8)
    x0s = _x0s(16)

    # ---- independent (shard_map) mode: zero collectives ----
    smpc = ShardedNMPC(mpc, mesh)
    carry, res = smpc.next_batch(x0s, params=params)
    assert bool(jnp.all(res.converged))
    carry2, res2 = smpc.next_batch(x0s, params=params, carry=carry)
    key = next(k for k in smpc._shmap_cache if k[0])
    warm_fn = smpc._shmap_cache[key]
    carry_s = shard_leading(carry, mesh)
    rt = runtime(shard_leading(x0s, mesh), params=replicate(params, mesh))
    hlo = warm_fn.lower(carry_s, rt).compile().as_text()
    coll = re.findall(r"all-reduce|all-gather|collective-permute"
                      r"|all-to-all|reduce-scatter", hlo)
    assert not coll, f"collectives in the independent mode: {set(coll)}"

    # ---- GSPMD mode: only the pred[] termination all-reduce ----
    gmpc = ShardedNMPC(mpc, mesh, independent=False)
    carry, res = gmpc.next_batch(x0s, params=params)
    gmpc.next_batch(x0s, params=params, carry=carry)  # populate warm cache
    key = next(k for k in mpc._batch_cache if k[0])
    warm = mpc._batch_cache[key]
    carry_s = shard_leading(carry, mesh)
    x0_s = shard_leading(x0s, mesh)
    rt = runtime(x0_s, params=replicate(params, mesh))
    hlo = warm.lower(carry_s, rt).compile().as_text()
    banned = re.findall(r"all-gather|collective-permute|all-to-all"
                        r"|reduce-scatter", hlo)
    assert not banned, f"data collectives on the hot path: {set(banned)}"
    for m in re.finditer(r"^.*= (\S+) all-reduce.*$", hlo, re.M):
        assert m.group(1).startswith("pred[]"), (
            f"non-predicate all-reduce on the hot path: {m.group(0)[:200]}")
