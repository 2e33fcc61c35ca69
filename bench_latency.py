"""Warm re-plan latency vs fleet size: the BASELINE config-5 real-time view.

Config 5's clause is a 10 ms re-plan budget.  ``fleet_rnn_tpu.log`` showed
a 16,384-member fleet re-plans in ~960 ms on one chip — 96 chips' worth of
work per budget window — but never measured the latency-vs-batch curve, so
the number a pod deployment actually needs (the largest PER-CHIP fleet that
re-plans inside 10 ms) was unknown (VERDICT r2 item 3).  This harness
measures it, two ways per batch size:

* **blocking**: one warm re-plan per host round-trip (the hard-real-time
  view; through the TPU tunnel this includes dispatch latency, which the
  CLAUDE.md notes can spike — treat the pipelined number as the truth for
  deployment shapes where state estimation lives on-device);
* **pipelined**: k re-plans chained on-device (feedback = planned next
  state) with one final sync — dispatch amortised, the per-re-plan compute
  cost.

Workloads: ``rnn`` (config 5: GRU dynamics, lifted state, H=100, direct)
and ``quad`` (config 4: quadrotor H=50 exact-Hessian RK4).

Run:   python bench_latency.py [--workload rnn|quad] [--batches 64,...]
       [--budget-ms 10] [--pipe 16]
Prints a table to stderr and ONE JSON line to stdout.
"""

import argparse
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_rnn(H=100, fit_steps=1500):
    import jax
    import jax.numpy as jnp
    import pyneuralempc_tpu as nempc
    from pyneuralempc_tpu.models.rnn import (fit_gru_on_sequences,
                                             gru_dynamics)

    def plant_seq(key, T):
        ks = jax.random.split(key, 2)
        x = jax.random.uniform(ks[0], (2,), minval=-0.5, maxval=0.5)
        us = jax.random.uniform(ks[1], (T, 1), minval=-1.0, maxval=1.0)
        w = jnp.zeros(())

        def step(carry, u):
            x, w = carry
            w = 0.7 * w + 0.3 * u[0]
            x1 = x[0] + 0.5 * (-0.4 * x[0] + w)
            x2 = x[1] + 0.5 * (0.5 * x[0] - 0.3 * x[1])
            xn = jnp.stack([x1, x2])
            return (xn, w), xn

        (_, _), xs = jax.lax.scan(step, (x, w), us)
        return jnp.concatenate([x[None], xs]), us

    gd = gru_dynamics(x_dim=2, u_dim=1, hidden=8)
    keys = jax.random.split(jax.random.PRNGKey(0), 512)
    X_seqs, U_seqs = jax.vmap(lambda k: plant_seq(k, 32))(keys)
    t0 = time.perf_counter()
    params, mse = fit_gru_on_sequences(gd, X_seqs, U_seqs, steps=fit_steps,
                                       lr=3e-3)
    log(f"GRU fitted: mse={mse:.2e} ({time.perf_counter()-t0:.1f}s)")
    cost = nempc.StageCost(stage=gd.head_objective(
        lambda x, u: jnp.sum((x - jnp.array([0.3, 0.2])) ** 2)))
    box = gd.box(states_constraint=[[-1.0, 1.0], [-1.0, 1.0]],
                 control_constraint=[[-1.0, 1.0]])
    mpc = nempc.NMPC(gd.model, cost, [box], H=H, DT=1.0,
                     integrator="direct",
                     config=nempc.IPConfig(max_iter=60))

    def make_x0s(B):
        import numpy as np
        rng = np.random.default_rng(0)
        x0s = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 2)), jnp.float32)
        return jax.vmap(gd.lift)(x0s)

    return mpc, params, make_x0s


def build_quad(H=50):
    import os
    import numpy as np
    import jax.numpy as jnp
    import pyneuralempc_tpu as nempc
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "examples"))
    from quadrotor import F_HOVER, quad_f

    truth = nempc.jax_dynamics(quad_f(), x_dim=12, u_dim=4)
    qcost = nempc.StageCost(
        stage=lambda x, u: (jnp.sum(x[:3] ** 2) + 0.1 * jnp.sum(x[3:6] ** 2)
                            + 0.5 * jnp.sum(x[6:8] ** 2) + 0.1 * x[8] ** 2
                            + 0.02 * jnp.sum(x[9:] ** 2)
                            + 0.05 * jnp.sum((u - F_HOVER) ** 2)),
        terminal=lambda x: 5.0 * (jnp.sum(x[:3] ** 2)
                                  + jnp.sum(x[3:6] ** 2)))
    qbox = nempc.DomainConstraint(
        states_constraint=[[-5.0, 5.0]] * 3 + [[-8.0, 8.0]] * 3
        + [[-0.8, 0.8]] * 2 + [[-np.pi, np.pi]] + [[-8.0, 8.0]] * 3,
        control_constraint=[[0.0, 3.0]] * 4)
    mpc = nempc.NMPC(truth, qcost, [qbox], H=H, DT=0.02, integrator="rk4",
                     config=nempc.IPConfig(max_iter=80))

    def make_x0s(B):
        rng = np.random.default_rng(0)
        qx0 = np.zeros((B, 12), np.float32)
        qx0[:, 0:3] = rng.uniform(-1.0, 1.0, (B, 3))
        qx0[:, 3:6] = rng.uniform(-0.5, 0.5, (B, 3))
        qx0[:, 6:8] = rng.uniform(-0.3, 0.3, (B, 2))
        return jnp.asarray(qx0)

    return mpc, None, make_x0s


def measure(mpc, params, x0s, pipe, reps):
    """(blocking_ms_p50, pipelined_ms_per_replan, converged_frac)."""
    import jax
    import numpy as np

    carry, res = mpc.next_batch(x0s, params=params)
    jax.block_until_ready(carry.w)
    # warm-up: let iterations settle to steady state + compile warm path
    for _ in range(3):
        carry, res = mpc.next_batch(res.x[:, 0], params=params, carry=carry)
    jax.block_until_ready(carry.w)

    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        carry, res = mpc.next_batch(res.x[:, 0], params=params, carry=carry)
        jax.block_until_ready(carry.w)
        ts.append(time.perf_counter() - t0)
    blocking = float(np.median(ts)) * 1e3

    # pipelined: chain re-plans without host syncs (warm the queue first —
    # the tunnel runs the first ~8 post-sync dispatches slow, CLAUDE.md)
    for _ in range(8):
        carry, res = mpc.next_batch(res.x[:, 0], params=params, carry=carry)
    jax.block_until_ready(carry.w)
    t0 = time.perf_counter()
    for _ in range(pipe):
        carry, res = mpc.next_batch(res.x[:, 0], params=params, carry=carry)
    jax.block_until_ready(carry.w)
    pipelined = (time.perf_counter() - t0) / pipe * 1e3
    conv = float(res.converged.mean())
    return blocking, pipelined, conv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", choices=("rnn", "quad"), default="rnn")
    ap.add_argument("--batches", type=str,
                    default="64,128,256,512,1024,2048,4096,8192,16384")
    ap.add_argument("--budget-ms", type=float, default=10.0)
    ap.add_argument("--pipe", type=int, default=16)
    ap.add_argument("--reps", type=int, default=9)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.workload == "rnn":
        mpc, params, make_x0s = build_rnn()
    else:
        mpc, params, make_x0s = build_quad()
    log(f"workload={args.workload} backend={jax.default_backend()} "
        f"kkt={mpc.kkt_backend} budget={args.budget_ms}ms")
    log(f"{'B':>7} {'blocking_ms':>12} {'pipelined_ms':>13} "
        f"{'solves/s(pipe)':>15} {'conv':>6}")

    best_b, best_rate, rows = 0, 0.0, []
    for B in [int(b) for b in args.batches.split(",")]:
        x0s = make_x0s(B)
        blocking, pipelined, conv = measure(mpc, params, x0s, args.pipe,
                                            args.reps)
        rate = B / (pipelined / 1e3)
        rows.append({"B": B, "blocking_ms": round(blocking, 2),
                     "pipelined_ms": round(pipelined, 2),
                     "solves_per_s": round(rate, 1),
                     "converged": round(conv, 4)})
        log(f"{B:>7} {blocking:>12.2f} {pipelined:>13.2f} {rate:>15,.0f} "
            f"{conv:>6.3f}")
        if pipelined <= args.budget_ms and conv >= 0.999 and B > best_b:
            best_b, best_rate = B, rate
    log(f"largest per-chip fleet inside the {args.budget_ms} ms budget "
        f"(pipelined): B={best_b} at {best_rate:,.0f} solves/s")
    print(json.dumps({
        "metric": f"{args.workload}_fleet_max_B_within_"
                  f"{int(args.budget_ms)}ms",
        "value": best_b, "unit": "solves/replan",
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
