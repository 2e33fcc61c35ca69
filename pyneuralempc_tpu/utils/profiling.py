"""Solver phase profiling (SURVEY §5.1: the reference imports ``time`` and
never uses it; here per-phase cost breakdown is a first-class tool).

``profile_solver`` times the individual phases of one interior-point
iteration — stage-block derivative assembly, KKT sweep, merit line search,
residual evaluation — each as its own jitted function over the same batch,
so you can see where a warm MPC step's milliseconds actually go on the
target backend before reaching for a kernel.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp

from .timing import time_fn


def profile_solver(mpc, x0s, params=None, iters: int = 10) -> Dict:
    """Phase-level timing of the batched solve on the current backend.

    Returns {phase: seconds} medians.  ``mpc`` must use the Riccati
    backend (phase decomposition follows its structure).
    """
    from ..core.problem import runtime
    from ..solve.riccati import make_riccati_direction

    nlp, cfg = mpc.nlp, mpc._ipcfg
    B = x0s.shape[0]
    carry = jax.vmap(lambda x0: mpc.cold_start(x0, params=params))(x0s)
    rt = runtime(x0s, params=params)
    rt_axes = {"x0": 0, "p": None, "tvp": None, "params": None}

    w = carry.w
    lam = carry.lam
    mu = 1e-2

    def residuals(w, rt):
        g = jax.grad(nlp.objective)(w, rt)
        c, vjp = jax.vjp(lambda ww: nlp.constraints(ww, rt), w)
        return g, c, vjp(jnp.zeros_like(c))[0]

    sl = jax.vmap(lambda wi: wi - nlp.lower)(w)
    su = jax.vmap(lambda wi: nlp.upper - wi)(w)
    Sigma = jnp.clip(mu / jnp.clip(sl, 1e-6, None) ** 2
                     + mu / jnp.clip(su, 1e-6, None) ** 2, 0, 1e6)
    Sigma = jnp.where(jnp.isfinite(Sigma), Sigma, 0.0)
    r_tilde = jnp.zeros_like(w)
    c0 = jax.jit(jax.vmap(lambda wi, x0: nlp.constraints(
        wi, runtime(x0, params=params)), in_axes=(0, 0)))(w, x0s)

    direction = make_riccati_direction(nlp, cfg)

    out = {}
    f_res = jax.jit(jax.vmap(residuals, in_axes=(0, rt_axes)))
    out["residuals+grad"] = time_fn(f_res, w, rt, iters=iters)["p50"]

    f_dir = jax.jit(jax.vmap(direction, in_axes=(0, 0, rt_axes, 0, 0, 0)))
    out["direction(blocks+sweep)"] = time_fn(
        f_dir, w, lam, rt, Sigma, r_tilde, c0, iters=iters)["p50"]

    def merit_fan(wi, rti):
        alphas = 0.5 ** jnp.arange(8, dtype=w.dtype)
        return jax.vmap(
            lambda a: nlp.objective(wi * (1 - a * 1e-3), rti)
            + jnp.sum(jnp.abs(nlp.constraints(wi * (1 - a * 1e-3), rti)))
        )(alphas)

    f_ls = jax.jit(jax.vmap(merit_fan, in_axes=(0, rt_axes)))
    out["line-search fan"] = time_fn(f_ls, w, rt, iters=iters)["p50"]

    _, step = mpc.next_batch(x0s, params=params)
    carry2, _ = mpc.next_batch(x0s, params=params)
    f_full = lambda: mpc.next_batch(x0s, params=params, carry=carry2)[1].u
    out["full warm step"] = time_fn(f_full, iters=iters)["p50"]
    return out


def main():  # pragma: no cover - manual tool
    import os
    import sys

    import numpy as np
    import pyneuralempc_tpu as nempc
    from pyneuralempc_tpu.models.mlp import MLPDynamics

    B = int(os.environ.get("PROF_BATCH", 1024))
    H = int(os.environ.get("PROF_H", 20))
    surrogate = MLPDynamics.make(x_dim=2, u_dim=1, hidden=[32, 32])
    params = surrogate.init_params(jax.random.PRNGKey(0))
    cost = nempc.StageCost(stage=lambda x, u: 1.1 * jnp.sum(u))
    box = nempc.DomainConstraint(
        states_constraint=[[-1.0, 1.0], [-1.0, 0.35]],
        control_constraint=[[0.0, 1.2]])
    mpc = nempc.NMPC(surrogate, cost, [box], H=H, DT=0.1, integrator="rk4")
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.stack([rng.uniform(0.2, 0.8, B),
                                rng.uniform(-0.9, -0.3, B)], axis=1),
                      jnp.float32)
    prof = profile_solver(mpc, x0s, params=params)
    for k, v in prof.items():
        print(f"{k:28s} {v*1e3:8.2f} ms", file=sys.stderr)


if __name__ == "__main__":  # pragma: no cover
    main()
