"""Fused Riccati Pallas kernel vs the scan reference (interpret mode on
CPU; the compiled path is exercised by bench.py on real TPU hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyneuralempc_tpu.ops.pallas.riccati_kernel import (_kernel_fits,
                                                        riccati_sweep_pallas)
from pyneuralempc_tpu.solve.riccati import riccati_sweep_ref


def make_data(B=3, H=5, nx=2, nu=1, seed=0):
    rng = np.random.default_rng(seed)
    ns = nx + nu
    A = jnp.asarray(np.eye(nx) + 0.1 * rng.normal(0, 0.3, (B, H, nx, nx)),
                    jnp.float32)
    Bm = jnp.asarray(0.1 * rng.normal(0, 1, (B, H, nx, nu)), jnp.float32)
    G = jnp.asarray(rng.normal(0, 0.05, (B, H, ns, ns)), jnp.float32)
    G = 0.5 * (G + G.transpose(0, 1, 3, 2))
    M = jnp.asarray(rng.normal(0, 0.1, (B, H, ns, ns)), jnp.float32)
    M = 0.5 * (M + M.transpose(0, 1, 3, 2)) + jnp.eye(ns)
    mx = jnp.asarray(rng.normal(0, 1, (B, H, nx)), jnp.float32)
    mu_ = jnp.asarray(rng.normal(0, 1, (B, H, nu)), jnp.float32)
    c = jnp.asarray(rng.normal(0, 0.1, (B, H, nx)), jnp.float32)
    delta = jnp.zeros((B,), jnp.float32)
    return A, Bm, G, M, mx, mu_, c, delta


def test_kernel_matches_scan_interpret():
    args = make_data()
    ref = jax.vmap(riccati_sweep_ref)(*args)
    out = riccati_sweep_pallas(*args, interpret=True)
    for r, o in zip(ref[:3], out[:3]):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=2e-5)
    assert bool(jnp.all(ref[3] == out[3]))


@pytest.mark.slow
def test_kernel_nx4_interpret():
    args = make_data(B=2, H=3, nx=4, nu=1, seed=1)
    ref = jax.vmap(riccati_sweep_ref)(*args)
    out = riccati_sweep_pallas(*args, interpret=True)
    for r, o in zip(ref[:3], out[:3]):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-4)


def test_kernel_delta_per_problem_interpret():
    """δ varies per batch element (vectorised inertia retry)."""
    args = list(make_data(B=4, H=4))
    args[7] = jnp.asarray([0.0, 0.1, 1.0, 10.0], jnp.float32)
    ref = jax.vmap(riccati_sweep_ref)(*args)
    out = riccati_sweep_pallas(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               atol=2e-5)


def test_kernel_ok_flag_on_negative_curvature():
    args = list(make_data(B=2, H=3))
    # poison problem 1 with hugely negative control curvature
    M = np.array(args[3])
    M[1, :, 2, 2] = -50.0
    args[3] = jnp.asarray(M)
    out = riccati_sweep_pallas(*args, interpret=True)
    assert bool(out[3][0])
    assert not bool(out[3][1])


@pytest.mark.slow
def test_kernel_quadrotor_dims_interpret():
    """The streamed kernel at quadrotor stage dims (nx=12, nu=4) — the
    config the v1 whole-sweep-resident design could never dispatch.  H is
    shortened for interpret-mode speed; per-stage code is H-independent."""
    args = make_data(B=2, H=3, nx=12, nu=4, seed=2)
    ref = jax.vmap(riccati_sweep_ref)(*args)
    out = riccati_sweep_pallas(*args, interpret=True)
    for r, o in zip(ref[:3], out[:3]):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=2e-4)
    assert bool(jnp.all(out[3]))


def test_kernel_local_delta_retry_interpret():
    """A numerically-marginal pivot (within the nudge-scale local bumps)
    must be rescued ok=True by ONE sweep — identically by the kernel's
    per-lane retry and the scan reference's per-stage retry, so TPU and
    CPU backends follow one iterate path."""
    args = list(make_data(B=2, H=3, seed=3))
    # make stage 1 of problem 1 marginal: kill B there so Quu = Muu + Guu
    # exactly, set that entry barely negative (rescuable at 1e-6), and
    # decouple Qux/qu at that stage (Mxu = Gux = 0) — a marginal pivot
    # under strong coupling would produce huge gains that poison the
    # upstream value function, which is exactly the case the nudge cap
    # defers to the global ladder
    Bm = np.array(args[1])
    Bm[1, 1] = 0.0
    args[1] = jnp.asarray(Bm)
    M = np.array(args[3])
    G = np.array(args[2])
    M[1, 1, 2, 2] = -G[1, 1, 2, 2] - 2e-7
    M[1, 1, :2, 2] = M[1, 1, 2, :2] = 0.0
    G[1, 1, :2, 2] = G[1, 1, 2, :2] = 0.0
    mu_ = np.array(args[5])
    mu_[1, 1] = 0.0           # qu = 0 too: the rescued k stays bounded
    args[5] = jnp.asarray(mu_)
    args[2] = jnp.asarray(G)
    args[3] = jnp.asarray(M)
    ref = jax.vmap(riccati_sweep_ref)(*args)
    assert bool(ref[3][0]) and bool(ref[3][1])   # scan rescues it locally
    out = riccati_sweep_pallas(*args, interpret=True)
    assert bool(out[3][0]) and bool(out[3][1])   # kernel agrees
    # both problems identical between the backends (same local bumps)
    for b in range(2):
        np.testing.assert_allclose(np.asarray(out[0][b]),
                                   np.asarray(ref[0][b]), atol=2e-5)
    assert np.all(np.isfinite(np.asarray(out[0][1])))


def test_local_retry_defers_indefiniteness_to_ladder():
    """GENUINE indefiniteness (beyond the nudge-scale local bumps) must
    report ok=False from BOTH backends so the outer global-δ ladder
    convexifies the whole horizon — a locally-rescued Quu under an
    indefinite value function yields saddle directions (measured: the
    cartpole swing-up closed loop collapsed to 2/30 converged re-plans
    when the top local bump was 1.0)."""
    args = list(make_data(B=2, H=3, seed=3))
    M = np.array(args[3])
    M[1, 1, 2, 2] = -0.5      # real indefiniteness, not noise
    args[3] = jnp.asarray(M)
    ref = jax.vmap(riccati_sweep_ref)(*args)
    out = riccati_sweep_pallas(*args, interpret=True)
    assert bool(ref[3][0]) and not bool(ref[3][1])
    assert bool(out[3][0]) and not bool(out[3][1])


def test_fits_predicate():
    assert _kernel_fits(20, 2, 1)          # LV bench config
    assert _kernel_fits(20, 2, 4)          # small multi-input fits too
    assert _kernel_fits(50, 12, 4)         # quadrotor fleet (streamed v2 —
    #                                        the v1 resident design refused)
    assert _kernel_fits(500, 12, 4)        # per-stage footprint: H-free
    assert _kernel_fits(50, 12, 10)        # r5: overactuated fleet rides
    #                                        the kernel (triangle-streamed
    #                                        G/M + factor-blend retry)
    assert _kernel_fits(20, 2, 16)         # r5 cap edge for small nx
    assert not _kernel_fits(20, 2, 17)     # nu cap (chol unroll size)
    assert not _kernel_fits(50, 12, 16)    # VMEM decides inside the cap
    assert not _kernel_fits(20, 64, 4)     # stage blocks too big for VMEM


def test_custom_vmap_fallback_on_cpu():
    """On CPU the custom_vmap rule must route to the vmapped scan."""
    from pyneuralempc_tpu.solve.riccati import riccati_sweep
    args = make_data()
    out = jax.jit(jax.vmap(riccati_sweep))(*args)
    ref = jax.vmap(riccati_sweep_ref)(*args)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               atol=1e-5)


@pytest.mark.slow
def test_kernel_nu3_interpret():
    args = make_data(B=2, H=3, nx=3, nu=3, seed=2)
    ref = jax.vmap(riccati_sweep_ref)(*args)
    out = riccati_sweep_pallas(*args, interpret=True)
    for r, o in zip(ref[:3], out[:3]):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-4)
    assert bool(jnp.all(ref[3] == out[3]))


def test_chunked_scan_vmap_matches_vmap():
    """Out-of-envelope fleet fallback: lax.map over batch chunks of the
    vmapped scan must reproduce the monolithic vmap exactly, including a
    non-divisible batch (pad rows are dropped)."""
    from pyneuralempc_tpu.ops.pallas.riccati_kernel import (
        _chunked_scan_vmap, _ref_sweep)
    args = make_data(B=7, H=4, nx=3, nu=2, seed=5)
    ref = jax.vmap(riccati_sweep_ref)(*args)
    import os
    os.environ["NEMPC_SCAN_CHUNK"] = "3"       # 7 -> chunks of 3 (pad 2)
    try:
        out = jax.jit(
            lambda *a: _chunked_scan_vmap(_ref_sweep, a, 7))(*args)
    finally:
        del os.environ["NEMPC_SCAN_CHUNK"]
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=0.0)


def test_kernel_plan_paths():
    """Pre-dispatch envelope check names the path and the reason."""
    from pyneuralempc_tpu.ops.pallas.riccati_kernel import kernel_plan
    assert kernel_plan(20, 2, 1)["path"] == "pallas_fused"
    assert kernel_plan(50, 12, 4)["path"] == "pallas_streamed"
    # r5: nu=10 now rides the kernel; nu=17 is past the cap
    assert kernel_plan(50, 12, 10, batch=4096)["path"] == "pallas_streamed"
    p = kernel_plan(50, 12, 17, batch=4096)    # nu cap exceeded, fleet
    assert p["path"] == "scan_chunked" and p["chunk"] >= 1
    assert "nu=17" in p["reason"]
    assert kernel_plan(50, 12, 17, batch=64)["path"] == "scan"
    # NEMPC_DISABLE_PALLAS must surface in the plan (ADVICE r4): a
    # kernel-eligible fleet with the kernel disabled would otherwise skip
    # host chunking and hit the device-side fault
    import os
    os.environ["NEMPC_DISABLE_PALLAS"] = "1"
    try:
        pd = kernel_plan(50, 12, 4, batch=4096)
        assert pd["path"] == "scan_chunked"
        assert "NEMPC_DISABLE_PALLAS" in pd["reason"]
    finally:
        del os.environ["NEMPC_DISABLE_PALLAS"]
    assert kernel_plan(20, 2, 1, on_tpu=False)["path"] == "scan"
    # general envelope: r > nu and R > 33 both name their cap
    assert "r=3" in kernel_plan(10, 4, 2, R=1, r=3)["reason"]
    assert "R=40" in kernel_plan(10, 4, 2, R=40, r=0)["reason"]
    assert kernel_plan(30, 4, 2, R=5, r=1)["path"].startswith("pallas")
