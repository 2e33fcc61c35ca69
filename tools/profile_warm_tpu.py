"""Phase profile of the bench warm step on TPU (VERDICT r4 weak #7 /
next #6: commit a breakdown of where the 24.5 ms pipelined step goes,
then attack the largest slice).

Reconstructs bench.py's exact workload (LV H=20, 2x32 MLP surrogate,
tol=1e-5 + polish), then measures:

  1. the pipelined warm re-plan step for CONFIG VARIANTS that disable one
     phase at a time (polish depth, line-search fan width) — the honest
     way to cost a phase inside one fused jit program where host-side
     timers cannot see phase boundaries;
  2. jitted sub-programs of the real solver internals (batched Riccati
     direction = stage-block autodiff + sweep; batched residuals; one
     constraint rollout = one line-search candidate evaluation) — the
     per-iteration unit costs that multiply by the measured ~3.9 warm
     iterations.

Surrogate training is cached on disk (tools/.lv_surrogate.msgpack) so
re-runs skip the 3000-step fit.  Run on the TPU host:
    python tools/profile_warm_tpu.py
Prints a table to stderr and one JSON line to stdout; committed as
tools/profile_warm_tpu.log.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

_CKPT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".lv_surrogate.npz")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def get_surrogate():
    import jax
    from pyneuralempc_tpu.models.mlp import MLPDynamics
    from pyneuralempc_tpu.models.train import (fit_surrogate,
                                               sample_transitions)
    import jax.numpy as jnp

    surrogate = MLPDynamics.make(x_dim=2, u_dim=1, hidden=[32, 32])
    if os.path.exists(_CKPT):
        data = np.load(_CKPT)
        params = [{"w": jnp.asarray(data[f"w{i}"]),
                   "b": jnp.asarray(data[f"b{i}"])}
                  for i in range(len(data.files) // 2)]
        log(f"surrogate params loaded from {_CKPT}")
        return surrogate, params

    def f_true(x, u):
        xr = 30.0 * (x + 1.0)
        ur = 50.0 * u
        d1 = 0.5 * xr[:, :1] - 0.025 * xr[:, :1] * xr[:, 1:]
        d2 = -0.5 * xr[:, 1:] + ur + 0.005 * xr[:, :1] * xr[:, 1:]
        return jnp.concatenate([d1, d2], axis=1) / 30.0

    X, U, Y = sample_transitions(f_true, jax.random.PRNGKey(0), 8192, 2, 1,
                                 x_range=(-1.0, 1.2), u_range=(0.0, 1.2))
    params, mse = fit_surrogate(surrogate, X, U, Y, steps=3000, lr=2e-3,
                                batch=1024)
    log(f"surrogate mse={mse:.2e}")
    np.savez(_CKPT, **{f"{k}{i}": np.asarray(layer[k])
                       for i, layer in enumerate(params)
                       for k in ("w", "b")})
    return surrogate, params


def build_mpc(surrogate, **cfg_over):
    import jax.numpy as jnp
    import pyneuralempc_tpu as nempc

    REG = 1e-4
    cost = lambda x, u: 1.1 * jnp.sum(u) + REG * jnp.sum(u * u)  # noqa
    box = nempc.DomainConstraint(
        states_constraint=[[-1.0, 1.0], [-1.0, 0.35]],
        control_constraint=[[0.0, 1.2]])
    cfg = dict(tol=1e-5, polish_iters=5, polish_mu=1e-9,
               warm_z_corridor=1e2, warm_mu=3e-4)
    cfg.update(cfg_over)
    return nempc.NMPC(surrogate, cost, [box], H=20, DT=0.1,
                      integrator="rk4", config=nempc.IPConfig(**cfg))


def pipelined_ms(mpc, params, x0s, phi, steps=32, ramp=8):
    """bench.py's steady-state loop: host-chained async dispatches, one
    final block."""
    import jax

    carry, res = mpc.next_batch(x0s, params=params)
    jax.block_until_ready(carry.w)
    xs = x0s
    for _ in range(ramp):
        xs = phi(xs, res.u[:, 0])
        carry, res = mpc.next_batch(xs, params=params, carry=carry)
    jax.block_until_ready(carry.w)
    t0 = time.perf_counter()
    for _ in range(steps):
        xs = phi(xs, res.u[:, 0])
        carry, res = mpc.next_batch(xs, params=params, carry=carry)
    jax.block_until_ready(carry.w)
    ms = (time.perf_counter() - t0) / steps * 1e3
    import jax.numpy as jnp
    return ms, int(res.converged.sum()), float(jnp.mean(res.iterations)), \
        int(jnp.max(res.iterations))


def main():
    import jax
    import jax.numpy as jnp
    import pyneuralempc_tpu as nempc
    nempc.enable_compilation_cache()
    from pyneuralempc_tpu.core.problem import runtime
    from pyneuralempc_tpu.ops.integrators import step_fn
    from pyneuralempc_tpu.utils.timing import time_fn

    B = int(os.environ.get("PROF_BATCH", 4096))
    log(f"backend={jax.default_backend()} B={B}")
    surrogate, params = get_surrogate()

    def f_true(x, u):
        xr = 30.0 * (x + 1.0)
        ur = 50.0 * u
        d1 = 0.5 * xr[:, :1] - 0.025 * xr[:, :1] * xr[:, 1:]
        d2 = -0.5 * xr[:, 1:] + ur + 0.005 * xr[:, :1] * xr[:, 1:]
        return jnp.concatenate([d1, d2], axis=1) / 30.0

    phi = jax.jit(jax.vmap(
        lambda x, u: step_fn(nempc.jax_dynamics(f_true, 2, 1), "rk4", 0.1)(
            x[None], u[None])[0]))
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.stack([rng.uniform(0.2, 0.8, B),
                                rng.uniform(-0.9, -0.3, B)], axis=1),
                      jnp.float32)

    # ---- 1. config-variant pipelined steps ----
    variants = [
        ("baseline (polish=5, fan=8)", {}),
        ("polish=0", {"polish_iters": 0}),
        ("polish=2", {"polish_iters": 2}),
        ("fan=4", {"ls_backtracks": 4}),
        ("fan=2", {"ls_backtracks": 2}),
        ("polish=2 fan=4", {"polish_iters": 2, "ls_backtracks": 4}),
    ]
    rows = {}
    for name, over in variants:
        mpc = build_mpc(surrogate, **over)
        ms, conv, it_mean, it_max = pipelined_ms(mpc, params, x0s, phi)
        rows[name] = {"ms_per_step": round(ms, 2),
                      "solves_per_s": round(B / ms * 1e3),
                      "converged": conv, "iters_mean": round(it_mean, 2),
                      "iters_max": it_max}
        log(f"{name:28s} {ms:7.2f} ms/step  {B/ms*1e3:9.0f}/s  "
            f"conv {conv}/{B}  iters {it_mean:.2f} mean / {it_max} max")

    # ---- 2. unit costs of the real solver internals ----
    mpc = build_mpc(surrogate)
    nlp, cfg = mpc.nlp, mpc._ipcfg
    from pyneuralempc_tpu.solve.riccati import make_riccati_direction
    direction = make_riccati_direction(nlp, cfg)
    carry, res = mpc.next_batch(x0s, params=params)
    jax.block_until_ready(carry.w)
    rt = runtime(x0s, params=params)
    rt_axes = {"x0": 0, "p": None, "tvp": None, "params": None}
    w, lam = carry.w, carry.lam
    Sigma = jnp.ones_like(w) * 1e-2
    r_tilde = jnp.zeros_like(w)
    c0 = jax.jit(jax.vmap(lambda wi, rti: nlp.constraints(wi, rti),
                          in_axes=(0, rt_axes)))(w, rt)

    units = {}
    f_dir = jax.jit(jax.vmap(direction, in_axes=(0, 0, rt_axes, 0, 0, 0)))
    units["direction(blocks+sweep)"] = time_fn(
        f_dir, w, lam, rt, Sigma, r_tilde, c0, iters=20)["p50"]

    def residuals(wi, lami, rti):
        g = jax.grad(nlp.objective)(wi, rti)
        c, vjp = jax.vjp(lambda ww: nlp.constraints(ww, rti), wi)
        return g, c, vjp(lami)[0]

    f_res = jax.jit(jax.vmap(residuals, in_axes=(0, 0, rt_axes)))
    units["residuals(grad+Jt)"] = time_fn(f_res, w, lam, rt,
                                          iters=20)["p50"]

    f_con = jax.jit(jax.vmap(lambda wi, rti: nlp.constraints(wi, rti),
                             in_axes=(0, rt_axes)))
    units["ls candidate (rollout)"] = time_fn(f_con, w, rt,
                                              iters=20)["p50"]
    f_obj = jax.jit(jax.vmap(lambda wi, rti: nlp.objective(wi, rti),
                             in_axes=(0, rt_axes)))
    units["objective"] = time_fn(f_obj, w, rt, iters=20)["p50"]
    for k, v in units.items():
        log(f"unit {k:26s} {v*1e3:7.2f} ms")

    base = rows["baseline (polish=5, fan=8)"]
    print(json.dumps({
        "metric": "lv_warm_step_phase_profile",
        "value": base["ms_per_step"], "unit": "ms/step pipelined B=4096",
        "vs_baseline": None,
        "variants": rows,
        "unit_costs_ms": {k: round(v * 1e3, 3) for k, v in units.items()},
    }))


if __name__ == "__main__":
    main()
