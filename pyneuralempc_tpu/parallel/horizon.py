"""Horizon (sequence-parallel) sharding of the Riccati sweep.

SURVEY §5.7: the reference's only notion of "sequence length" is the
horizon H, handled with dense O(H²)–O(H³) matrices.  Here long horizons
partition across devices: the parallel-in-time formulation
(:mod:`..solve.pscan`) makes the backward pass a composition of
linear-fractional value-map elements, and compositions split cleanly into

  1. a *local* suffix scan of the H/S stages owned by each device,
  2. an ``all_gather`` of the S per-shard total elements (tiny — one
     element each: (nx², 3·nx) floats),
  3. per-device composition of the later shards' totals into a boundary
     value (P_b, p_b) at its right edge,
  4. application of the local suffix elements to the boundary value,

and symmetrically for the forward (affine prefix) pass.  Communication is
two ``all_gather``s of per-shard boundary data over the ``horizon`` mesh
axis — O(S · nx²) bytes — regardless of H.  The batch axis shards over
``scenario`` with no communication at all.

Built on ``shard_map`` over a 2-D ``(scenario, horizon)`` mesh.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..solve import pscan as _ps


def make_horizon_mesh(n_scenario: int, n_horizon: int) -> Mesh:
    import numpy as np
    devs = jax.devices()[: n_scenario * n_horizon]
    return Mesh(np.asarray(devs).reshape(n_scenario, n_horizon),
                ("scenario", "horizon"))


def _apply_elem(e, Pv, pv):
    """Apply a value-map element to (P, p)."""
    A, b, C, eta, J = e
    nx = A.shape[-1]
    I = jnp.eye(nx, dtype=A.dtype)
    PC = I + jnp.einsum("...ij,...jk->...ik", Pv, C)
    # P (I + CP)^{-1} == (I + PC)^{-1} P  — must solve with (I + PC)
    PiA = jnp.linalg.solve(PC, jnp.einsum("...ij,...jk->...ik", Pv, A))
    Pn = J + jnp.einsum("...ji,...jk->...ik", A, PiA)
    rhs = pv + jnp.einsum("...ij,...j->...i", Pv, b)
    pn = eta + jnp.einsum("...ji,...j->...i", A,
                          jnp.linalg.solve(PC, rhs[..., None])[..., 0])
    return Pn, pn


def _compose(e1, e2):
    """Compose value-map elements, e1 earlier in time (see pscan.py)."""
    A1, b1, C1, n1, J1 = e1
    A2, b2, C2, n2, J2 = e2
    nx = A1.shape[-1]
    I = jnp.eye(nx, dtype=A1.dtype)
    CJ = I + jnp.einsum("...ij,...jk->...ik", C1, J2)
    JC = I + jnp.einsum("...ij,...jk->...ik", J2, C1)
    solve = jnp.linalg.solve
    GA1 = solve(CJ, A1)
    Gb = solve(CJ, (b1 - jnp.einsum("...ij,...j->...i", C1, n2))[..., None]
               )[..., 0]
    GC1 = solve(CJ, C1)
    Gn = solve(JC, (n2 + jnp.einsum("...ij,...j->...i", J2, b1))[..., None]
               )[..., 0]
    GJ2 = solve(JC, J2)
    return (jnp.einsum("...ij,...jk->...ik", A2, GA1),
            jnp.einsum("...ij,...j->...i", A2, Gb) + b2,
            jnp.einsum("...ij,...jk,...lk->...il", A2, GC1, A2) + C2,
            n1 + jnp.einsum("...ji,...j->...i", A1, Gn),
            J1 + jnp.einsum("...ji,...jk,...kl->...il", A1, GJ2, A1))


def _identity_elem(nx, dtype, batch_shape=()):
    I = jnp.broadcast_to(jnp.eye(nx, dtype=dtype),
                         batch_shape + (nx, nx))
    Z = jnp.zeros(batch_shape + (nx, nx), dtype)
    z = jnp.zeros(batch_shape + (nx,), dtype)
    return (I, z, Z, z, Z)


def make_sharded_sweep(mesh: Mesh) -> Callable:
    """Build ``sweep(A, B, G, M, mx, mu, c, delta)`` for batched inputs
    (B, H, ...) with B sharded over ``scenario`` and H over ``horizon``.

    Returns (dX, dU, dLam, ok) with the same sharding.  Result matches
    ``vmap(riccati_sweep_pscan)`` to f32 tolerance.
    """
    S = mesh.shape["horizon"]

    def local_sweep(A, B_, G, M, m_x, m_u, c, delta):
        # shapes: (B_loc, H_loc, ...) — everything below is vmapped over
        # the local batch; stage math reuses the pscan building blocks.
        def one(A, B_, G, M, m_x, m_u, c, delta):
            H, nx = c.shape
            elems, (Uh, Sh, uh), ok = _ps._canonical_elems(
                A, B_, G, M, m_x, m_u, c, delta)

            # (1) local suffix scan (reverse: fn gets (later, earlier))
            suffix = jax.lax.associative_scan(
                lambda a, b: _compose(b, a), elems, reverse=True)
            local_total = jax.tree_util.tree_map(lambda x: x[0], suffix)

            # (2) gather per-shard totals over the horizon axis
            totals = jax.lax.all_gather(local_total, "horizon")   # (S,...)

            # (3) boundary value at my right edge: apply totals of LATER
            # shards (composed) to (0, 0) == take J/eta of their composite.
            my = jax.lax.axis_index("horizon")
            ident = jax.tree_util.tree_map(
                lambda x: jax.lax.pcast(x, ("horizon", "scenario"),
                                        to="varying"),
                _identity_elem(nx, A.dtype))

            def fold(i, acc):
                # compose shards in increasing time order, masked to > my
                e_i = jax.tree_util.tree_map(lambda x: x[i], totals)
                comp = _compose(acc, e_i)
                keep = i > my
                return jax.tree_util.tree_map(
                    lambda a, b: jnp.where(keep, b, a), acc, comp)

            later = jax.lax.fori_loop(0, S, fold, ident)
            Pb, pb = later[4], later[3]           # J, eta of composite

            # (4) local values: apply local suffix elements to boundary
            P_loc, p_loc = jax.vmap(_apply_elem, in_axes=(0, None, None))(
                suffix, Pb, pb)
            P_next = jnp.concatenate([P_loc[1:], Pb[None]], 0)
            p_next = jnp.concatenate([p_loc[1:], pb[None]], 0)

            K, k, ok_g = jax.vmap(_ps._gains)(Uh, Sh, uh, A, B_, c,
                                              P_next, p_next)
            ok = ok & jnp.all(ok_g)

            # forward: affine prefix maps, two-level
            F = A + jnp.einsum("tij,tjk->tik", B_, K)
            v = jnp.einsum("tij,tj->ti", B_, k) + c

            def aff(m1, m2):
                F1, v1 = m1
                F2, v2 = m2
                return (jnp.einsum("...ij,...jk->...ik", F2, F1),
                        jnp.einsum("...ij,...j->...i", F2, v1) + v2)

            Fp, vp = jax.lax.associative_scan(aff, (F, v))
            tot_f = (Fp[-1], vp[-1])
            tots_f = jax.lax.all_gather(tot_f, "horizon")

            # boundary dx at my left edge: compose earlier shards in
            # increasing time order
            I_f = jax.tree_util.tree_map(
                lambda x: jax.lax.pcast(x, ("horizon", "scenario"),
                                        to="varying"),
                (jnp.eye(nx, dtype=A.dtype), jnp.zeros((nx,), A.dtype)))

            def fold_f2(i, acc):
                m_i = jax.tree_util.tree_map(lambda x: x[i], tots_f)
                comp = aff(acc, m_i)     # acc (earlier) then m_i
                keep = i < my
                return jax.tree_util.tree_map(
                    lambda a, b: jnp.where(keep, b, a), acc, comp)

            F0, v0 = jax.lax.fori_loop(0, S, fold_f2, I_f)
            dx_left = v0                                  # Δx at left edge
            dX = (jnp.einsum("tij,j->ti", Fp, dx_left) + vp)
            dx_prev = jnp.concatenate([dx_left[None], dX[:-1]], 0)
            dU = jnp.einsum("tij,tj->ti", K, dx_prev) + k

            Mxx = M[:, :nx, :nx] + delta * jnp.eye(nx, dtype=A.dtype)
            Mxu = M[:, :nx, nx:]
            dLam = (jnp.einsum("tij,tj->ti", P_next + Mxx, dX)
                    + jnp.einsum("tij,tj->ti", Mxu, dU) + p_next + m_x)
            ok = ok & jnp.all(jnp.isfinite(dX)) & jnp.all(jnp.isfinite(dU))
            return dX, dU, dLam, ok

        dX, dU, dLam, ok = jax.vmap(one, in_axes=(0,) * 7 + (0,))(
            A, B_, G, M, m_x, m_u, c, delta)
        # one flag per problem: AND across horizon shards (psum marks the
        # result replicated over the axis, satisfying out_specs)
        ok = jax.lax.psum(ok.astype(jnp.int32), "horizon") == S
        return dX, dU, dLam, ok

    spec_bh = P("scenario", "horizon")
    in_specs = (spec_bh, spec_bh, spec_bh, spec_bh, spec_bh, spec_bh,
                spec_bh, P("scenario"))
    out_specs = (spec_bh, spec_bh, spec_bh, P("scenario"))
    return jax.jit(jax.shard_map(local_sweep, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs))


def horizon_sweep(mesh: Mesh) -> Callable:
    """Sweep impl that makes the *whole interior-point solve*
    sequence-parallel: pass as ``sweep_impl`` to
    :func:`~pyneuralempc_tpu.solve.riccati.make_riccati_direction` (or use
    ``NMPC(..., mesh=mesh)``).

    A single (un-vmapped) problem falls back to the parallel-in-time scan;
    under ``vmap`` — i.e. inside ``NMPC.next_batch`` — the batched KKT sweep
    dispatches to the ``shard_map``'d (scenario, horizon) sharded sweep, so
    every IP iteration's Riccati factorisation runs split across the mesh
    while the surrounding stage-block autodiff partitions by GSPMD.

    Requires the batch divisible by ``mesh.shape['scenario']`` and H by
    ``mesh.shape['horizon']``.
    """
    sharded = make_sharded_sweep(mesh)

    @jax.custom_batching.custom_vmap
    def sweep(A, B_, G, M, mx, mu_, c, delta):
        return _ps.riccati_sweep_pscan(A, B_, G, M, mx, mu_, c, delta)

    @sweep.def_vmap
    def _rule(axis_size, in_batched, A, B_, G, M, mx, mu_, c, delta):
        def bcast(x, b):
            return x if b else jnp.broadcast_to(
                jnp.asarray(x)[None], (axis_size,) + jnp.shape(x))

        args = [bcast(x, b) for x, b in zip((A, B_, G, M, mx, mu_, c),
                                            in_batched[:7])]
        out = sharded(*args, bcast(delta, in_batched[7]))
        return out, (True, True, True, True)

    return sweep
