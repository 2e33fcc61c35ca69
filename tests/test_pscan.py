"""Parallel-in-time (associative scan) Riccati vs the sequential sweep."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyneuralempc_tpu as nempc
from pyneuralempc_tpu.solve.interior_point import IPConfig
from pyneuralempc_tpu.solve.pscan import riccati_sweep_pscan
from pyneuralempc_tpu.solve.riccati import riccati_sweep_ref


def make_data(H=16, nx=3, nu=2, seed=0, dt=0.1):
    rng = np.random.default_rng(seed)
    ns = nx + nu
    A = jnp.asarray(np.eye(nx) + dt * rng.normal(0, 0.5, (H, nx, nx)),
                    jnp.float32)
    B = jnp.asarray(dt * rng.normal(0, 1, (H, nx, nu)), jnp.float32)
    G = jnp.asarray(rng.normal(0, 0.05, (H, ns, ns)), jnp.float32)
    G = 0.5 * (G + G.transpose(0, 2, 1))
    M = jnp.asarray(rng.normal(0, 0.1, (H, ns, ns)), jnp.float32)
    M = 0.5 * (M + M.transpose(0, 2, 1)) + jnp.eye(ns)
    mx = jnp.asarray(rng.normal(0, 1, (H, nx)), jnp.float32)
    mu_ = jnp.asarray(rng.normal(0, 1, (H, nu)), jnp.float32)
    c = jnp.asarray(rng.normal(0, 0.1, (H, nx)), jnp.float32)
    return A, B, G, M, mx, mu_, c, jnp.float32(0.0)


@pytest.mark.parametrize("H,nx,nu", [(8, 2, 1), (16, 3, 2), (33, 4, 1),
                                     (64, 2, 2)])
def test_pscan_matches_sequential(H, nx, nu):
    args = make_data(H=H, nx=nx, nu=nu)
    ref = riccati_sweep_ref(*args)
    out = jax.jit(riccati_sweep_pscan)(*args)
    assert bool(out[3])
    scale = max(1.0, float(jnp.max(jnp.abs(ref[0]))))
    for r, o in zip(ref[:3], out[:3]):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=3e-4 * scale, rtol=2e-3)


def test_pscan_long_horizon_f32_stability():
    """H=256: the log-depth composition must stay finite and close to the
    sequential result."""
    args = make_data(H=256, nx=3, nu=1, dt=0.02)
    ref = riccati_sweep_ref(*args)
    out = jax.jit(riccati_sweep_pscan)(*args)
    assert bool(out[3])
    err = float(jnp.max(jnp.abs(out[0] - ref[0])))
    scale = float(jnp.max(jnp.abs(ref[0]))) + 1.0
    assert err < 1e-2 * scale


def test_pscan_delta_regularisation():
    args = list(make_data(H=10, nx=2, nu=1))
    # negative control curvature needs delta to fix
    M = np.array(args[3])
    M[:, 2, 2] = -3.0
    args[3] = jnp.asarray(M)
    out0 = riccati_sweep_pscan(*args[:-1], jnp.float32(0.0))
    assert not bool(out0[3])
    out1 = riccati_sweep_pscan(*args[:-1], jnp.float32(10.0))
    assert bool(out1[3])


def lv_f(x, u):
    return jnp.concatenate(
        [0.5 * x[:, :1] - 0.025 * x[:, :1] * x[:, 1:],
         -0.5 * x[:, 1:] + u + 0.005 * x[:, :1] * x[:, 1:]], axis=1)


def test_pscan_solver_end_to_end():
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = nempc.StageCost(stage=lambda x, u: 1.1 * jnp.sum(u)
                           + 0.05 * jnp.sum(x ** 2))
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    x0 = jnp.array([0.3, 0.2])
    r_seq = nempc.NMPC(model, cost, [box], H=40, DT=0.05, integrator="rk4",
                       config=IPConfig(kkt="riccati")).next(x0)
    r_par = nempc.NMPC(model, cost, [box], H=40, DT=0.05, integrator="rk4",
                       config=IPConfig(kkt="riccati_pscan")).next(x0)
    assert bool(r_seq.converged) and bool(r_par.converged)
    np.testing.assert_allclose(np.asarray(r_par.u), np.asarray(r_seq.u),
                               atol=2e-4)


def test_pscan_solver_with_stage_constraint():
    """O(log H) parallel-in-time sweep under an active StageConstraint —
    the slack condensation lives in the shared stage blocks, so the pscan
    backend must agree with the sequential Riccati solve."""
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = nempc.StageCost(stage=lambda x, u: 1.1 * jnp.sum(u)
                           + 0.05 * jnp.sum(x ** 2))
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    pc = nempc.stage_interval(
        lambda x, u: jnp.array([x[0] + 0.5 * x[1]]), dim=1,
        lb=-0.45, ub=0.45)
    x0 = jnp.array([0.3, 0.2])
    kw = dict(H=40, DT=0.05, integrator="rk4")
    r_seq = nempc.NMPC(model, cost, [box, pc],
                       config=IPConfig(kkt="riccati"), **kw).next(x0)
    r_par = nempc.NMPC(model, cost, [box, pc],
                       config=IPConfig(kkt="riccati_pscan"), **kw).next(x0)
    assert bool(r_seq.converged) and bool(r_par.converged)
    np.testing.assert_allclose(np.asarray(r_par.u), np.asarray(r_seq.u),
                               atol=3e-4)


@pytest.mark.slow
def test_pscan_time_last_matches_matrix_last():
    """The time-last relayout (VERDICT r3 #4: packed (rows, H) leaves so
    TPU tiles pad nothing) must agree with the matrix-last implementation
    it replaces for nx <= _TL_MAX, including the ok flag.

    Runs in a SUBPROCESS: the TL form's giant unrolled associative-scan
    compiles destabilise the XLA CPU compiler for the REST of the test
    process (observed: a later unrelated jit segfaults inside
    backend_compile_and_load once a few TL shapes have compiled
    in-process; moving the TL compiles to a throwaway interpreter makes
    the full suite reliable).  TPU-scale TL shapes are exercised by
    tools/bench_horizon_tpu.py on hardware.
    """
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import sys; sys.path.insert(0, {repo!r})
import numpy as np
import jax.numpy as jnp
from pyneuralempc_tpu.solve.pscan import (_riccati_sweep_pscan_ml,
                                          _riccati_sweep_pscan_tl)
sys.path.insert(0, {tests!r})
from test_pscan import make_data
for H, nx, nu, seed in [(16, 3, 2, 0), (24, 4, 1, 1), (8, 4, 4, 3)]:
    args = make_data(H=H, nx=nx, nu=nu, seed=seed)
    ml = jax.jit(_riccati_sweep_pscan_ml)(*args)
    tl = jax.jit(_riccati_sweep_pscan_tl)(*args)
    scale = max(1.0, float(jnp.max(jnp.abs(ml[0]))))
    for a, b in zip(ml[:3], tl[:3]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4 * scale, rtol=2e-3)
    assert bool(ml[3]) == bool(tl[3])
print("TL-OK")
"""
    repo = __file__.rsplit("/", 2)[0]
    r = subprocess.run(
        [sys.executable, "-c",
         code.format(repo=repo, tests=repo + "/tests")],
        capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0 and "TL-OK" in r.stdout, (
        r.stdout[-2000:], r.stderr[-2000:])


def test_pscan_matrix_last_path_above_tl_cap():
    """nx > _TL_MAX stays on the matrix-last path and still matches the
    sequential sweep (the dispatch must not silently break big stages)."""
    from pyneuralempc_tpu.solve.pscan import _TL_MAX
    nx = _TL_MAX + 2
    args = make_data(H=12, nx=nx, nu=2, seed=5)
    ref = riccati_sweep_ref(*args)
    out = jax.jit(riccati_sweep_pscan)(*args)
    assert bool(out[3])
    scale = max(1.0, float(jnp.max(jnp.abs(ref[0]))))
    for r, o in zip(ref[:3], out[:3]):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=3e-4 * scale, rtol=2e-3)
