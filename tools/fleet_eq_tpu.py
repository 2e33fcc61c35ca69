"""EQ/border-constrained quadrotor fleet, end-to-end on real TPU (run
manually: python tools/fleet_eq_tpu.py [--batch N] [--border]).

The round-3 general Pallas kernels gave stage-equality rows and
trajectory-level border rows a fleet-scale fast path (the XLA scan sweep
they previously rode faults the TPU compiler at fleet batch on this
problem size — fleet_tpu6_noker.log).  tools/check_kernel_tpu.py checks
the SWEEP in isolation; this harness runs the FULL interior-point solver
through the general path at fleet batch:

* quadrotor (12-state / 4-input, H=50, exact Hessians, RK4) steering to
  hover — BASELINE config 4's problem;
* stage EQUALITY row: zero net yaw torque, u0 − u1 + u2 − u3 = 0 at every
  stage (a real rotor-failure/trim constraint shape);
* optional trajectory-level border row (--border): total thrust impulse
  over the horizon capped, sum(U) ≤ budget — an energy-budget row
  coupling all stages, solved as a rank-1 Schur border.

Output committed as tools/fleet_eq_tpu.log.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/examples")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--border", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import pyneuralempc_tpu as nempc
    nempc.enable_compilation_cache()
    from quadrotor import F_HOVER, quad_f

    print(f"backend={jax.default_backend()} devices={jax.devices()} "
          f"B={args.batch} H=50 border={args.border}", flush=True)

    truth = nempc.jax_dynamics(quad_f(), x_dim=12, u_dim=4)
    cost = nempc.StageCost(
        stage=lambda x, u: (jnp.sum(x[:3] ** 2) + 0.1 * jnp.sum(x[3:6] ** 2)
                            + 0.5 * jnp.sum(x[6:8] ** 2) + 0.1 * x[8] ** 2
                            + 0.02 * jnp.sum(x[9:] ** 2)
                            + 0.05 * jnp.sum((u - F_HOVER) ** 2)),
        terminal=lambda x: 5.0 * (jnp.sum(x[:3] ** 2)
                                  + jnp.sum(x[3:6] ** 2)))
    box = nempc.DomainConstraint(
        states_constraint=[[-5.0, 5.0]] * 3 + [[-8.0, 8.0]] * 3
        + [[-0.8, 0.8]] * 2 + [[-np.pi, np.pi]] + [[-8.0, 8.0]] * 3,
        control_constraint=[[0.0, 3.0]] * 4)
    # zero net yaw torque at every stage (stage EQ row -> in-sweep Schur)
    yaw_trim = nempc.StageConstraint(
        stage=lambda x, u: (u[0] - u[1] + u[2] - u[3])[None],
        dim=1, lb=(0.0,), ub=(0.0,))
    cons = [box, yaw_trim]
    if args.border:
        # horizon thrust-impulse budget (trajectory row -> rank-1 border);
        # generous enough to be inactive at hover, active on hard starts
        cons.append(nempc.PathConstraint(
            fn=lambda X, U: jnp.sum(U)[None],
            dim=1, lb=(0.0,), ub=(50 * 4 * F_HOVER * 1.15,)))
    mpc = nempc.NMPC(truth, cost, cons, H=50, DT=0.02, integrator="rk4",
                     config=nempc.IPConfig(max_iter=80))
    print(f"kkt backend: {mpc.kkt_backend}", flush=True)

    B = args.batch
    rng = np.random.default_rng(0)
    x0 = np.zeros((B, 12), np.float32)
    x0[:, 0:3] = rng.uniform(-1.0, 1.0, (B, 3))
    x0[:, 3:6] = rng.uniform(-0.5, 0.5, (B, 3))
    x0[:, 6:8] = rng.uniform(-0.3, 0.3, (B, 2))
    x0s = jnp.asarray(x0)

    t0 = time.perf_counter()
    carry, res = mpc.next_batch(x0s)
    jax.block_until_ready(carry.w)
    n_conv = int(res.converged.sum())
    print(f"cold batched solve + compile: {time.perf_counter()-t0:.1f}s  "
          f"converged {n_conv}/{B}  iters max {int(res.iterations.max())}",
          flush=True)
    # EQ row honoured across the fleet?
    viol = float(jnp.max(jnp.abs(res.u[:, :, 0] - res.u[:, :, 1]
                                 + res.u[:, :, 2] - res.u[:, :, 3])))
    print(f"max |u0-u1+u2-u3| across fleet: {viol:.2e}", flush=True)

    # warm steady state (feedback = planned next state)
    for _ in range(3):
        carry, res = mpc.next_batch(res.x[:, 0], carry=carry)
    jax.block_until_ready(carry.w)
    for _ in range(8):      # pipeline ramp, untimed
        carry, res = mpc.next_batch(res.x[:, 0], carry=carry)
    jax.block_until_ready(carry.w)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        carry, res = mpc.next_batch(res.x[:, 0], carry=carry)
    jax.block_until_ready(carry.w)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"warm fleet step: {dt*1e3:.0f}ms -> {B/dt:,.0f} solves/s  "
          f"converged {int(res.converged.sum())}/{B}  "
          f"iters max {int(res.iterations.max())} "
          f"mean {float(res.iterations.mean()):.2f}", flush=True)
    viol = float(jnp.max(jnp.abs(res.u[:, :, 0] - res.u[:, :, 1]
                                 + res.u[:, :, 2] - res.u[:, :, 3])))
    print(f"max |u0-u1+u2-u3| across fleet (warm): {viol:.2e}", flush=True)


if __name__ == "__main__":
    main()
