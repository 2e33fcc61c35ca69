"""Closed-loop simulation harness.

The reference example hand-writes its simulate → re-plan loop
(``examples/lotka_volterra/run.py:121-143``, commented out, with a
retry-from-random-init on failure).  Here the loop is a library function:
plant stepping, re-plan cadence, convergence accounting, and the failure
policy (reuse the remaining plan when a solve fails — the receding-horizon
analog of the reference's retry) are handled once, for single plants and
for batched fleets.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class ClosedLoopResult(NamedTuple):
    x: Any            # (T+1, x_dim) plant trajectory
    u: Any            # (T, u_dim) applied controls
    converged: Any    # (n_solves,) per-solve flags
    iterations: Any   # (n_solves,)
    objective: Any    # (n_solves,) planned objective at each solve


def closed_loop(mpc, plant_step: Callable, x0, steps: int,
                replan_every: int = 1, p=None, tvp_fn: Optional[Callable] = None,
                params=None, plant_params=None) -> ClosedLoopResult:
    """Run receding-horizon MPC against a plant.

    ``plant_step(x, u) -> x_next`` operates on single states (vectors).
    ``tvp_fn(t) -> (H, tvp_dim)`` supplies the look-ahead tvp window at
    plant step t (or None).  The MPC re-plans every ``replan_every`` steps
    and plays the remaining plan in between; if a solve fails, the previous
    plan keeps playing (and the warm carry keeps improving next re-plan).
    """
    x = jnp.asarray(x0)
    mpc.reset()
    xs, us = [x], []
    conv, iters, objs = [], [], []
    plan, k = None, 0
    for t in range(steps):
        if t % replan_every == 0 or k >= mpc.H:
            tvp = None if tvp_fn is None else tvp_fn(t)
            res = mpc.next(x, p=p, tvp=tvp, params=params)
            conv.append(bool(res.converged))
            iters.append(int(res.iterations))
            objs.append(float(res.objective))
            if plan is None or bool(res.converged):
                plan, k = res, 0
            else:
                k = min(k, mpc.H - 1)   # keep playing the old plan
        u = plan.u[k]
        k += 1
        x = plant_step(x, u) if plant_params is None else plant_step(
            x, u, plant_params)
        xs.append(x)
        us.append(u)
    return ClosedLoopResult(
        x=jnp.stack(xs), u=jnp.stack(us),
        converged=np.asarray(conv), iterations=np.asarray(iters),
        objective=np.asarray(objs))


class FleetLoopResult(NamedTuple):
    """Batched closed-loop rollout: leading axes are (n_solves|steps, B)."""
    x: Any            # (steps+1, B, x_dim) plant trajectories
    u: Any            # (steps, B, u_dim) applied controls
    converged: Any    # (n_solves, B) per-solve flags
    iterations: Any   # (n_solves, B)
    objective: Any    # (n_solves, B) planned objective at each solve
    theta: Any        # (n_solves, B) constraint violation at each solve


def closed_loop_batch(mpc, plant_step: Callable, x0s, steps: int,
                      replan_every: int = 1, p=None, params=None,
                      plant_params=None, tvp_seq=None) -> FleetLoopResult:
    """Batched closed-loop MPC, fully on-device (one compiled program).

    The single-plant :func:`closed_loop` is a host Python loop — fine for
    one plant, but a fleet of thousands re-planning in lockstep (BASELINE
    config 5's real workload) must not pay a host round-trip per step.
    Here the whole loop — warm re-plan, per-member failure policy, plant
    stepping — is a ``lax.scan`` over re-plan rounds; the only host syncs
    are the initial transfer and the final fetch.

    ``plant_step(x, u[, plant_params]) -> x_next`` on single vectors
    (vmapped internally).  ``p``/``params`` may be shared across the batch
    or carry a leading batch axis (per-member parameters / per-member
    models — detected like :meth:`NMPC.next_batch`).  ``tvp_seq``
    optionally supplies the time-varying-parameter look-ahead window for
    every solve: shape (n_replans+1, H, tvp_dim) — index 0 feeds the cold
    solve, index j+1 the j-th warm re-plan (the batched analog of
    :func:`closed_loop`'s ``tvp_fn``).
    Failure policy matches :func:`closed_loop`: a member whose re-plan did
    not converge keeps playing its previous plan (shifted to stay aligned
    in time) while its warm carry keeps improving.

    ``steps`` must be a multiple of ``replan_every`` (``replan_every``
    controls are played from each plan between re-plans, the reference
    example's cadence — ``run.py:121-143`` re-plans every 2 steps).
    """
    if steps % replan_every:
        raise ValueError("steps must be a multiple of replan_every")
    if replan_every > mpc.H:
        raise ValueError("replan_every cannot exceed the horizon H")
    n_replans = steps // replan_every
    x0s = jnp.asarray(x0s)
    B = x0s.shape[0]
    if tvp_seq is not None:
        tvp_seq = jnp.asarray(tvp_seq)
        if tvp_seq.shape[0] != n_replans + 1:
            raise ValueError(
                f"tvp_seq must supply n_replans+1 = {n_replans + 1} "
                f"windows, got {tvp_seq.shape[0]}")

    from ..core.problem import runtime as _runtime
    from .controller import _baxis, _baxis_tree

    axes = {"x0": 0, "p": _baxis(p, 1), "tvp": None,
            "params": _baxis_tree(params, B)}

    def run(x0s, rt, tvp_seq, plant_params):
        # tvp_seq / plant_params are TRACED arguments (None = absent, a
        # static pytree-structure distinction): repeated fleet evaluations
        # at the same shapes (x0 sweeps, fresh tvp windows, retrained plant
        # params) reuse one compiled program instead of recompiling the
        # whole closed loop per call (round-2 advisor finding).
        def plant_one(xx, uu):
            return (plant_step(xx, uu) if plant_params is None
                    else plant_step(xx, uu, plant_params))

        def vplant(x, u):
            return jax.vmap(plant_one)(x, u)

        def cold(x0, rt_):
            c = mpc.cold_start(x0, p=rt_["p"], tvp=rt_["tvp"],
                               params=rt_["params"])
            return mpc._step(c, rt_)

        vcold = jax.vmap(cold, in_axes=(0, axes))
        vwarm = jax.vmap(mpc._warm_step, in_axes=(0, axes))

        def stats(res):
            return (res.converged, res.iterations, res.objective, res.theta)

        if tvp_seq is not None:
            rt = dict(rt)
            rt["tvp"] = tvp_seq[0]
        carry, res = vcold(x0s, rt)
        cold_stats = stats(res)

        def body(st, j):
            carry, x, plan_u = st
            xs, us = [], []
            for k in range(replan_every):
                u_k = plan_u[:, k]
                x = vplant(x, u_k)
                xs.append(x)
                us.append(u_k)
            rt_t = dict(rt)
            rt_t["x0"] = x
            if tvp_seq is not None:
                rt_t["tvp"] = tvp_seq[j + 1]
            carry, res = vwarm(carry, rt_t)
            # failure policy: non-converged members keep playing their
            # previous plan, shifted by the controls just consumed
            stale = jnp.concatenate(
                [plan_u[:, replan_every:],
                 jnp.repeat(plan_u[:, -1:], replan_every, axis=1)], axis=1)
            plan_u = jnp.where(res.converged[:, None, None], res.u, stale)
            return ((carry, x, plan_u),
                    (jnp.stack(xs), jnp.stack(us), stats(res)))

        (carry, x, _), (xs, us, warm_stats) = jax.lax.scan(
            body, (carry, x0s, res.u), jnp.arange(n_replans))
        return carry, xs, us, cold_stats, warm_stats

    # cache the jitted runner on the controller (like NMPC._batch_cache),
    # keyed on everything baked into the trace as Python structure; shape
    # changes retrace inside the same cached jit as usual
    key = ("clb", plant_step, steps, replan_every,
           axes["p"], axes["params"],
           tvp_seq is None, plant_params is None)
    if key not in mpc._batch_cache:
        mpc._batch_cache[key] = jax.jit(run)
    carry, xs, us, cold_stats, warm_stats = mpc._batch_cache[key](
        x0s, _runtime(x0s, p=p, params=params), tvp_seq, plant_params)
    # (n_replans, r, B, d) -> (steps, B, d); prepend x0
    x_traj = jnp.concatenate([x0s[None], xs.reshape(steps, B, -1)])
    u_traj = us.reshape(steps, B, -1)
    # n_replans solves are *applied*: the cold plan + the first
    # n_replans-1 warm plans (the last warm plan is returned in the
    # stats but never played)
    full = [jnp.concatenate([c[None], wseq]) for c, wseq in
            zip(cold_stats, warm_stats)]
    return FleetLoopResult(x=x_traj, u=u_traj, converged=full[0],
                           iterations=full[1], objective=full[2],
                           theta=full[3])


def plant_from_model(model, integrator: str, dt: float,
                     params=None) -> Callable:
    """Wrap a dynamics model as a single-state plant step function."""
    from ..ops.integrators import step_fn

    phi = step_fn(model, integrator, dt)

    def step(x, u, prm=params):
        return phi(x[None, :], u[None, :], None, None, prm)[0]

    return jax.jit(step)
