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


def plant_from_model(model, integrator: str, dt: float,
                     params=None) -> Callable:
    """Wrap a dynamics model as a single-state plant step function."""
    from ..ops.integrators import step_fn

    phi = step_fn(model, integrator, dt)

    def step(x, u, prm=params):
        return phi(x[None, :], u[None, :], None, None, prm)[0]

    return jax.jit(step)
