"""General (multi-rhs + stage-EQ Schur) Riccati Pallas kernels vs the scan
reference (interpret mode on CPU; the compiled path is exercised by
tools/check_kernel_tpu.py on real TPU hardware).

These kernels close the round-3 gap where EQ/border-constrained fleets had
only the XLA scan sweep — the shape that faults the TPU compiler at fleet
batch sizes on the plain path (fleet_tpu6_noker.log).  Configs here are
tiny because interpret mode runs tile ops one by one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyneuralempc_tpu.ops.pallas.riccati_kernel import (
    _kernel_fits_general, riccati_sweep_general_pallas)
from pyneuralempc_tpu.solve.riccati import (riccati_sweep_general,
                                            riccati_sweep_general_ref)


def make_data(B=2, H=3, nx=2, nu=2, R=2, r=1, seed=0):
    rng = np.random.default_rng(seed)
    ns = nx + nu
    A = jnp.asarray(np.eye(nx) + 0.1 * rng.normal(0, 0.3, (B, H, nx, nx)),
                    jnp.float32)
    Bm = jnp.asarray(0.1 * rng.normal(0, 1, (B, H, nx, nu)), jnp.float32)
    G = jnp.asarray(rng.normal(0, 0.05, (B, H, ns, ns)), jnp.float32)
    G = 0.5 * (G + G.transpose(0, 1, 3, 2))
    M = jnp.asarray(rng.normal(0, 0.1, (B, H, ns, ns)), jnp.float32)
    M = 0.5 * (M + M.transpose(0, 1, 3, 2)) + jnp.eye(ns)
    mx = jnp.asarray(rng.normal(0, 1, (B, R, H, nx)), jnp.float32)
    mu_ = jnp.asarray(rng.normal(0, 1, (B, R, H, nu)), jnp.float32)
    c = jnp.asarray(rng.normal(0, 0.1, (B, R, H, nx)), jnp.float32)
    delta = jnp.zeros((B,), jnp.float32)
    dc = jnp.full((B,), 1e-8, jnp.float32)
    if r:
        # well-conditioned EQ rows (identity-dominant): random full-rank-
        # deficient E makes the Schur S = E Quu⁻¹ Eᵀ nearly singular and
        # the comparison measures conditioning, not kernel correctness
        # (measured: with N(0,0.5) rows at r=nu both f32 backends sit
        # ~1e-2 from the f64 truth, the kernel CLOSER than the scan)
        E = jnp.asarray(np.eye(r, nu) + 0.2 * rng.normal(0, 1, (B, H, r, nu)),
                        jnp.float32)
        F = jnp.asarray(rng.normal(0, 0.5, (B, H, r, nx)), jnp.float32)
        h = jnp.asarray(rng.normal(0, 0.3, (B, R, H, r)), jnp.float32)
        Jx = jnp.asarray(rng.normal(0, 0.5, (B, H, r, nx)), jnp.float32)
    else:
        E = F = h = Jx = None
    return A, Bm, G, M, mx, mu_, c, delta, dc, E, F, h, Jx


def ref_batched(args):
    A, Bm, G, M, mx, mu_, c, delta, dc, E, F, h, Jx = args
    if E is None:
        return jax.vmap(
            lambda *a: riccati_sweep_general_ref(*a))(
                A, Bm, G, M, mx, mu_, c, delta)
    return jax.vmap(
        lambda A, Bm, G, M, mx, mu_, c, d, E, F, h, Jx:
        riccati_sweep_general_ref(A, Bm, G, M, mx, mu_, c, d, 1e-8,
                                  E, F, h, Jx))(
            A, Bm, G, M, mx, mu_, c, delta, E, F, h, Jx)


def assert_matches(args, atol=2e-5):
    ref = ref_batched(args)
    out = riccati_sweep_general_pallas(*args, interpret=True)
    for rr, o in zip(ref[:4], out[:4]):
        if rr.size:
            np.testing.assert_allclose(np.asarray(o), np.asarray(rr),
                                       atol=atol)
    assert bool(jnp.all(ref[4] == out[4]))
    assert bool(jnp.all(ref[4]))


def test_general_kernel_multirhs_eq():
    """rhs axis R=2 + one stage EQ row: the bordered-constraint shape."""
    assert_matches(make_data())


def test_general_kernel_multirhs_noeq():
    """R=2, r=0: the trajectory-border shape with no stage EQ rows."""
    assert_matches(make_data(R=2, r=0, seed=1))


@pytest.mark.slow
def test_general_kernel_single_rhs_eq():
    """R=1, r=2 (r = nu): the pure stage-equality shape."""
    assert_matches(make_data(R=1, r=2, seed=2))


def test_general_kernel_ok_flag_agrees_on_indefiniteness():
    """Genuine control-curvature indefiniteness must report ok=False from
    both backends (the outer global-δ ladder then convexifies)."""
    args = list(make_data(seed=3))
    M = np.array(args[3])
    M[1, :, 2, 2] = -50.0
    args[3] = jnp.asarray(M)
    ref = ref_batched(args)
    out = riccati_sweep_general_pallas(*args, interpret=True)
    assert bool(ref[4][0]) and not bool(ref[4][1])
    assert bool(out[4][0]) and not bool(out[4][1])


def test_general_fits_predicate():
    # (H, nx, nu, R, r)
    assert _kernel_fits_general(50, 12, 4, 1, 2)    # quadrotor + EQ rows
    assert _kernel_fits_general(20, 2, 1, 9, 0)     # LV + 8 border rows
    assert _kernel_fits_general(50, 12, 4, 5, 0)    # quadrotor + 4 border
    assert not _kernel_fits_general(20, 2, 1, 40, 0)   # R cap
    assert _kernel_fits_general(20, 2, 9, 1, 0)        # r5: nu cap now 16
    assert not _kernel_fits_general(20, 2, 17, 1, 0)   # nu cap
    assert not _kernel_fits_general(50, 12, 4, 2, 5)   # r > nu
    assert not _kernel_fits_general(20, 64, 4, 1, 0)   # VMEM


def test_general_dispatcher_cpu_fallback():
    """On CPU the custom_vmap rule must route to the vmapped scan; the
    public dispatcher normalises absent EQ blocks to zero-width."""
    args = make_data(R=2, r=1, seed=4)
    A, Bm, G, M, mx, mu_, c, delta, dc, E, F, h, Jx = args
    out = jax.jit(jax.vmap(
        lambda A, Bm, G, M, mx, mu_, c, d, E, F, h, Jx:
        riccati_sweep_general(A, Bm, G, M, mx, mu_, c, d, 1e-8,
                              E, F, h, Jx)))(
            A, Bm, G, M, mx, mu_, c, delta, E, F, h, Jx)
    ref = ref_batched(args)
    for rr, o in zip(ref[:4], out[:4]):
        np.testing.assert_allclose(np.asarray(o), np.asarray(rr), atol=1e-5)


def test_general_dispatcher_unbatched():
    """Unbatched call runs the scan reference directly."""
    args = make_data(B=1, R=2, r=1, seed=5)
    one = [None if a is None else a[0] for a in args]
    out = riccati_sweep_general(one[0], one[1], one[2], one[3], one[4],
                                one[5], one[6], one[7], 1e-8,
                                one[9], one[10], one[11], one[12])
    ref = ref_batched(args)
    for rr, o in zip(ref[:4], out[:4]):
        np.testing.assert_allclose(np.asarray(o), np.asarray(rr[0]),
                                   atol=1e-5)


def test_general_kernel_streamed_path(monkeypatch):
    """Force multi-chunk streaming (the small test dims otherwise pick
    CH == H and fuse): shrink the VMEM budget so the chunk picker splits
    the horizon, exercising the HBM gain round-trip and the cross-chunk
    carry.  Distinct H from the other tests so the jit cache (keyed on
    static dims, which capture the budget at trace time) cannot serve a
    fused compilation."""
    import pyneuralempc_tpu.ops.pallas.riccati_kernel as rk

    H = 6
    monkeypatch.setattr(rk, "_VMEM_BUDGET", 900 * 1024)
    assert rk._pick_chunk_general(H, 2, 2, 2, 1) < H
    args = make_data(B=2, H=H, R=2, r=1, seed=7)
    ref = ref_batched(args)
    out = riccati_sweep_general_pallas(*args, interpret=True)
    for rr, o in zip(ref[:4], out[:4]):
        np.testing.assert_allclose(np.asarray(o), np.asarray(rr),
                                   atol=2e-5)
    assert bool(jnp.all(ref[4] == out[4]))
