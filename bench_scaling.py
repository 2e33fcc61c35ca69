"""Scaling-efficiency harness: scenario-sharded fleet at 1/2/4/8 devices.

Measures the BASELINE north-star scaling clause (">= 80% efficiency at 2
hosts") the only way possible without a multi-chip slice: run the SAME
total batch unsharded and sharded over n virtual devices and compare
steady-state warm re-plan throughput.

What this measures, precisely: scenario sharding is pure data parallelism
— the partitioned program contains *zero* collectives on the hot path
(docs/SCALING.md; verify with jax.jit(...).lower().compile() and grep the
HLO for all-reduce).  On one host, n virtual CPU devices share the same
cores, so total work/time is constant if and only if partitioning adds no
communication or overhead; the efficiency number below is therefore
    eff(n) = t_unsharded / t_sharded_over_n
which is exactly the multiplicative term that degrades real multi-chip
scaling on top of per-chip throughput (bench.py's metric).  On a real
slice, per-chip work is 1/n of the batch and ICI carries nothing, so
fleet throughput = n × per-chip throughput × eff(n).

Run:   python bench_scaling.py [--batch 256] [--steps 8] [--devices 1,2,4,8]
       (forces the CPU backend with 8 virtual devices; TPU slices > 1 chip
        are not available in this environment — see CLAUDE.md)

Prints a table to stderr and one JSON summary line to stdout.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_mpc(H=20, DT=0.1, tol=1e-5):
    """The bench.py workload (normalized controlled Lotka-Volterra) with
    exact dynamics instead of the MLP surrogate — same solve structure,
    no training step."""
    import jax.numpy as jnp
    import pyneuralempc_tpu as nempc

    def f_true(x, u):
        xr = 30.0 * (x + 1.0)
        ur = 50.0 * u
        d1 = 0.5 * xr[:, :1] - 0.025 * xr[:, :1] * xr[:, 1:]
        d2 = -0.5 * xr[:, 1:] + ur + 0.005 * xr[:, :1] * xr[:, 1:]
        return jnp.concatenate([d1, d2], axis=1) / 30.0

    model = nempc.jax_dynamics(f_true, x_dim=2, u_dim=1)
    cost = nempc.StageCost(stage=lambda x, u: 1.1 * jnp.sum(u))
    box = nempc.DomainConstraint(
        states_constraint=[[-1.0, 1.0], [-1.0, 0.35]],
        control_constraint=[[0.0, 1.2]])
    return nempc.NMPC(model, cost, [box], H=H, DT=DT, integrator="rk4",
                      config=nempc.IPConfig(tol=tol))


def measure(mpc, B, steps, n_devices=None, independent=True):
    """Steady-state warm re-plan seconds/step for batch B, optionally
    scenario-sharded over n_devices.  Returns (sec_per_step, n_converged).

    ``independent`` selects ShardedNMPC's partitioning mode: per-shard
    shard_map solvers with independent early exit (default) vs plain
    GSPMD lockstep — the comparison behind sharding.py's mode choice."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pyneuralempc_tpu.parallel.sharding import ShardedNMPC, make_mesh

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.stack([rng.uniform(0.2, 0.8, B),
                                rng.uniform(-0.9, -0.3, B)], axis=1),
                      jnp.float32)
    runner = (mpc if n_devices is None
              else ShardedNMPC(mpc, make_mesh(n_devices),
                               independent=independent))
    carry, res = runner.next_batch(x0s)
    jax.block_until_ready(carry.w)
    # warm-path compile + pipeline ramp, untimed
    for _ in range(2):
        carry, res = runner.next_batch(res.x[:, 0], carry=carry)
    jax.block_until_ready(carry.w)
    t0 = time.perf_counter()
    for _ in range(steps):
        carry, res = runner.next_batch(res.x[:, 0], carry=carry)
    jax.block_until_ready(carry.w)
    return (time.perf_counter() - t0) / steps, int(res.converged.sum())


def measure_pipelined(mpc, B, steps, n_devices=None, reps=3):
    """Steady-state warm re-plan seconds/step with the k re-plan steps
    CHAINED ON-DEVICE in one compiled lax.scan (feedback = planned next
    state), optionally scenario-sharded.

    This is the deployment shape (docs/SCALING.md "placement notes":
    nothing returns to the host between steps) and the measurement the
    dispatched mode above cannot give on a virtual mesh: per-step Python
    dispatch and per-shard re-placement (device_put per step) are fixed
    costs that UNDER-report sharding efficiency as the solver gets faster
    — r3 measured eff(2) fall 0.91→0.6 with no partitioning change
    (VERDICT r3 weak #3).  One scan = one dispatch for all k steps, so
    what remains is the partitioned program's own overhead — the thing
    eff(n) is supposed to measure."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pyneuralempc_tpu.core.problem import runtime
    from pyneuralempc_tpu.parallel.sharding import make_mesh, shard_leading

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.stack([rng.uniform(0.2, 0.8, B),
                                rng.uniform(-0.9, -0.3, B)], axis=1),
                      jnp.float32)
    carry, res = mpc.next_batch(x0s)        # cold solve (untimed)
    jax.block_until_ready(carry.w)
    x_next = res.x[:, 0]

    axes = {"x0": 0, "p": None, "tvp": None, "params": None}
    step_fn = jax.vmap(mpc._warm_step, in_axes=(0, axes))

    def chain(c0, x0):
        def body(cx, _):
            c, x = cx
            c2, r = step_fn(c, runtime(x, None, None, None))
            return (c2, r.x[:, 0]), jnp.sum(r.converged)
        (c2, xk), convs = jax.lax.scan(body, (c0, x0), None, length=steps)
        return c2, xk, convs

    if n_devices is not None:
        mesh = make_mesh(n_devices)
        carry = shard_leading(carry, mesh)
        x_next = shard_leading(x_next, mesh)
    fn = jax.jit(chain)
    c2, _, convs = fn(carry, x_next)        # compile, untimed
    jax.block_until_ready(c2.w)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        c2, _, convs = fn(carry, x_next)
        jax.block_until_ready(c2.w)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best, int(np.asarray(convs)[-1])


def measure_horizon(H, B, steps, n_horizon):
    """Steady-state warm re-plan seconds/step with the KKT sweep sharded
    over the HORIZON axis of a (1, n_horizon) mesh (sequence parallelism —
    SURVEY §5.7), vs None = single-device pscan-free baseline.  Long-H
    problems only: the sweep is O(H) work with O(log) depth per shard."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pyneuralempc_tpu.parallel.horizon import make_horizon_mesh

    mesh = (None if n_horizon is None
            else make_horizon_mesh(n_scenario=1, n_horizon=n_horizon))
    import pyneuralempc_tpu as nempc

    def f_true(x, u):
        xr = 30.0 * (x + 1.0)
        ur = 50.0 * u
        d1 = 0.5 * xr[:, :1] - 0.025 * xr[:, :1] * xr[:, 1:]
        d2 = -0.5 * xr[:, 1:] + ur + 0.005 * xr[:, :1] * xr[:, 1:]
        return jnp.concatenate([d1, d2], axis=1) / 30.0

    model = nempc.jax_dynamics(f_true, x_dim=2, u_dim=1)
    cost = nempc.StageCost(stage=lambda x, u: 1.1 * jnp.sum(u))
    box = nempc.DomainConstraint(
        states_constraint=[[-1.0, 1.0], [-1.0, 0.35]],
        control_constraint=[[0.0, 1.2]])
    mpc = nempc.NMPC(model, cost, [box], H=H, DT=2.0 / H,
                     integrator="rk4",
                     config=nempc.IPConfig(tol=1e-5), mesh=mesh)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.stack([rng.uniform(0.2, 0.8, B),
                                rng.uniform(-0.9, -0.3, B)], axis=1),
                      jnp.float32)
    carry, res = mpc.next_batch(x0s)
    jax.block_until_ready(carry.w)
    for _ in range(2):
        carry, res = mpc.next_batch(res.x[:, 0], carry=carry)
    jax.block_until_ready(carry.w)
    t0 = time.perf_counter()
    for _ in range(steps):
        carry, res = mpc.next_batch(res.x[:, 0], carry=carry)
    jax.block_until_ready(carry.w)
    return (time.perf_counter() - t0) / steps, int(res.converged.sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--devices", type=str, default="1,2,4,8")
    ap.add_argument("--horizon-axis", action="store_true",
                    help="also measure horizon (sequence-parallel) "
                    "sharding across H values")
    ap.add_argument("--horizons", type=str, default="64,128,256,512")
    ap.add_argument("--horizon-batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    ns = [int(s) for s in args.devices.split(",")]
    log(f"devices available: {len(jax.devices())}  B={args.batch}  "
        f"steps={args.steps}")

    mpc = build_mpc()
    B = args.batch

    # ---- pipelined mode (the headline: on-device chained re-plans) ----
    t_ref_p, conv = measure_pipelined(mpc, B, args.steps, n_devices=None)
    log(f"pipelined unsharded    : {t_ref_p*1e3:8.1f} ms/step  "
        f"{B/t_ref_p:10.0f} solves/s  conv {conv}/{B}")
    prows = {}
    for n in ns:
        t_n, conv = measure_pipelined(mpc, B, args.steps, n_devices=n)
        eff = t_ref_p / t_n
        prows[n] = {"ms_per_step": round(t_n * 1e3, 1),
                    "solves_per_s": round(B / t_n, 1),
                    "efficiency_vs_unsharded": round(eff, 3)}
        log(f"pipelined sharded n={n:2d}: {t_n*1e3:8.1f} ms/step  "
            f"{B/t_n:10.0f} solves/s  eff={eff:.3f}  conv {conv}/{B}")

    # ---- dispatched mode (host re-dispatch per step; kept for the
    # confound decomposition: pipelined-vs-dispatched gap = per-step
    # dispatch + re-placement fixed cost) ----
    t_ref, conv = measure(mpc, B, args.steps, n_devices=None)
    log(f"unsharded      : {t_ref*1e3:8.1f} ms/step  "
        f"{B/t_ref:10.0f} solves/s  conv {conv}/{B}")
    rows = {}
    for n in ns:
        t_n, conv = measure(mpc, B, args.steps, n_devices=n)
        eff = t_ref / t_n
        rows[n] = {"ms_per_step": round(t_n * 1e3, 1),
                   "solves_per_s": round(B / t_n, 1),
                   "efficiency_vs_unsharded": round(eff, 3)}
        log(f"sharded n={n:2d}   : {t_n*1e3:8.1f} ms/step  "
            f"{B/t_n:10.0f} solves/s  eff={eff:.3f}  conv {conv}/{B}")

    # ShardedNMPC mode comparison at n=2 (the sharding.py docstring's
    # independent-vs-GSPMD claim, re-measured on the current stack)
    t_ind, _ = measure(mpc, B, args.steps, n_devices=2, independent=True)
    t_gsp, _ = measure(mpc, B, args.steps, n_devices=2, independent=False)
    modes = {"independent_ms": round(t_ind * 1e3, 1),
             "gspmd_ms": round(t_gsp * 1e3, 1),
             "independent_eff": round(t_ref / t_ind, 3),
             "gspmd_eff": round(t_ref / t_gsp, 3)}
    log(f"ShardedNMPC n=2 modes: independent {t_ind*1e3:.1f} ms "
        f"(eff {t_ref/t_ind:.3f})  gspmd {t_gsp*1e3:.1f} ms "
        f"(eff {t_ref/t_gsp:.3f})")

    hrows = {}
    if args.horizon_axis:
        # Horizon (sequence-parallel) axis: same problem, same batch,
        # KKT sweep sharded over n_horizon devices of a (1, n) mesh.
        # On one host the virtual devices TIMESHARE the cores, so
        # eff < 1 here measures partitioning overhead (boundary
        # all_gathers + per-shard fixed costs), not parallel speedup —
        # the TPU-side scan-vs-pscan crossover is measured separately by
        # tools/bench_horizon_tpu.py on the real chip.
        Bh = args.horizon_batch
        for Hh in [int(s) for s in args.horizons.split(",")]:
            t_one, conv1 = measure_horizon(Hh, Bh, args.steps, None)
            log(f"H={Hh:4d} single  : {t_one*1e3:8.1f} ms/step  "
                f"conv {conv1}/{Bh}")
            hrows[Hh] = {"single_ms": round(t_one * 1e3, 1)}
            for nh in (2, 4):
                t_nh, convn = measure_horizon(Hh, Bh, args.steps, nh)
                eff = t_one / t_nh
                hrows[Hh][f"sharded{nh}_ms"] = round(t_nh * 1e3, 1)
                hrows[Hh][f"eff{nh}"] = round(eff, 3)
                log(f"H={Hh:4d} n_h={nh:2d}  : {t_nh*1e3:8.1f} ms/step  "
                    f"eff={eff:.3f}  conv {convn}/{Bh}")

    # Headline = 2-way sharding (the north-star clause is ">=80% at
    # 2 hosts"), PIPELINED mode — the deployment shape.  The dispatched
    # table rides in `detail_dispatched` for the fixed-cost decomposition.
    # Note: n virtual devices > physical cores under-reports efficiency
    # (they timeshare the same cores) — on real chips each shard has its
    # own compute.
    n_head = 2 if 2 in prows else ns[0]
    eff2 = prows[n_head]["efficiency_vs_unsharded"]
    out = {
        "metric": "scenario_sharding_efficiency_2way_fixed_batch_pipelined",
        "value": eff2,
        "unit": "ratio (t_unsharded / t_sharded_2way), on-device chained",
        "vs_baseline": round(eff2 / 0.8, 3),
        "detail_pipelined": prows,
        "detail_dispatched": rows,
        "sharded_nmpc_modes_2way": modes,
    }
    if hrows:
        out["horizon_axis"] = hrows
    print(json.dumps(out))


if __name__ == "__main__":
    main()
