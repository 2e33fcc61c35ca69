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
    """A problem whose Quu is indefinite at δ=0 but fixable by a local
    bump must come back ok=True from ONE sweep (in-kernel per-lane retry),
    with the healthy problem's direction untouched."""
    args = list(make_data(B=2, H=3, seed=3))
    M = np.array(args[3])
    M[1, 1, 2, 2] = -0.5      # mild indefiniteness at one stage
    args[3] = jnp.asarray(M)
    ref = jax.vmap(riccati_sweep_ref)(*args)
    assert not bool(ref[3][1])            # the plain sweep fails it...
    out = riccati_sweep_pallas(*args, interpret=True)
    assert bool(out[3][0]) and bool(out[3][1])   # ...the kernel rescues it
    # healthy problem identical to the reference
    np.testing.assert_allclose(np.asarray(out[0][0]),
                               np.asarray(ref[0][0]), atol=2e-5)
    # rescued problem is finite
    assert np.all(np.isfinite(np.asarray(out[0][1])))


def test_fits_predicate():
    assert _kernel_fits(20, 2, 1)          # LV bench config
    assert _kernel_fits(20, 2, 4)          # small multi-input fits too
    assert _kernel_fits(50, 12, 4)         # quadrotor fleet (streamed v2 —
    #                                        the v1 resident design refused)
    assert _kernel_fits(500, 12, 4)        # per-stage footprint: H-free
    assert not _kernel_fits(20, 2, 9)      # nu cap (chol unroll size)
    assert not _kernel_fits(20, 64, 4)     # stage blocks too big for VMEM


def test_custom_vmap_fallback_on_cpu():
    """On CPU the custom_vmap rule must route to the vmapped scan."""
    from pyneuralempc_tpu.solve.riccati import riccati_sweep
    args = make_data()
    out = jax.jit(jax.vmap(riccati_sweep))(*args)
    ref = jax.vmap(riccati_sweep_ref)(*args)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               atol=1e-5)


def test_kernel_nu3_interpret():
    args = make_data(B=2, H=3, nx=3, nu=3, seed=2)
    ref = jax.vmap(riccati_sweep_ref)(*args)
    out = riccati_sweep_pallas(*args, interpret=True)
    for r, o in zip(ref[:3], out[:3]):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-4)
    assert bool(jnp.all(ref[3] == out[3]))
