"""Fleet-scale MPC (BASELINE config 5, scaled to available hardware):
thousands of concurrent quadrotor MPC solves, scenario-sharded over a
device mesh, receding-horizon with warm carries.

On a real multi-chip slice this runs B scenarios at B/n_chips per chip; on
a single chip (or the virtual CPU mesh) it demonstrates the identical
program at whatever B fits.  The reference cannot express any of this —
one ``NMPC.next()`` is one CPU solve (SURVEY §2).

Run:  python examples/fleet.py [--cpu] [--batch 16384] [--H 50] [--steps 5]
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python examples/fleet.py --cpu --mesh 8 --batch 256
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from quadrotor import F_HOVER, quad_f  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--H", type=int, default=50)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard over this many devices (0 = no sharding)")
    ap.add_argument("--closed-loop", type=int, default=0, metavar="T",
                    help="also run a T-step on-device closed-loop fleet "
                         "evaluation (cost + violations)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import pyneuralempc_tpu as nempc
    nempc.enable_compilation_cache()

    H, DT, B = args.H, 0.02, args.batch
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
    mpc = nempc.NMPC(truth, cost, [box], H=H, DT=DT, integrator="rk4",
                     config=nempc.IPConfig(max_iter=60))
    print(f"devices={len(jax.devices())}  kkt={mpc.kkt_backend}  "
          f"B={B}  H={H}")

    rng = np.random.default_rng(0)
    x0s = np.zeros((B, 12), np.float32)
    x0s[:, 0:3] = rng.uniform(-1.0, 1.0, (B, 3))
    x0s[:, 3:6] = rng.uniform(-0.5, 0.5, (B, 3))
    x0s[:, 6:8] = rng.uniform(-0.3, 0.3, (B, 2))
    x0s = jnp.asarray(x0s)

    if args.mesh:
        from pyneuralempc_tpu.parallel.sharding import ShardedNMPC, make_mesh
        runner = ShardedNMPC(mpc, make_mesh(args.mesh))
        print(f"scenario-sharded over {args.mesh} devices "
              f"({B // args.mesh} problems/device)")
    else:
        runner = mpc

    t0 = time.perf_counter()
    carry, res = runner.next_batch(x0s)
    jax.block_until_ready(carry.w)
    print(f"cold fleet solve (incl compile): {time.perf_counter()-t0:.1f}s  "
          f"converged {int(res.converged.sum())}/{B}")

    # receding horizon: plant = plan head (perfect-model fleet rollout)
    carry, res = runner.next_batch(res.x[:, 0], carry=carry)
    jax.block_until_ready(carry.w)       # warm-path compile, untimed
    t0 = time.perf_counter()
    for _ in range(args.steps):
        carry, res = runner.next_batch(res.x[:, 0], carry=carry)
    jax.block_until_ready(carry.w)
    dt_step = (time.perf_counter() - t0) / args.steps
    print(f"warm fleet step: {dt_step*1e3:.0f}ms -> "
          f"{B/dt_step:,.0f} solves/s  "
          f"(converged {int(res.converged.sum())}/{B})")

    if args.closed_loop:
        # Config-5-shaped evaluation: the whole fleet closed loop —
        # plant stepping, warm re-plans, failure policy — runs device-side
        # as one lax.scan program (api/simulate.closed_loop_batch); the
        # host only sees the final trajectories.
        from pyneuralempc_tpu.api.simulate import (closed_loop_batch,
                                                   plant_from_model)
        plant = plant_from_model(truth, "rk4", DT)
        T = args.closed_loop
        t0 = time.perf_counter()
        out = closed_loop_batch(mpc, plant, x0s, steps=T)
        jax.block_until_ready(out.x)
        dt = time.perf_counter() - t0
        # closed-loop economic cost of the APPLIED trajectory
        stage_v = jax.vmap(cost.stage)
        cl_cost = jnp.sum(stage_v(out.x[1:].reshape(-1, 12),
                                  out.u.reshape(-1, 4))
                          .reshape(T, B), axis=0)
        lb, ub = mpc.nlp.spec.box.tile(1)
        lo = lb[:12][None, None]
        hi = ub[:12][None, None]
        viol = jnp.maximum(jnp.maximum(lo - out.x[1:], out.x[1:] - hi),
                           0.0)
        conv = np.asarray(out.converged)
        print(f"closed loop: {T} steps x {B} plants in {dt:.1f}s "
              f"({T*B/dt:,.0f} solves/s incl. compile)")
        print(f"  mean closed-loop cost {float(cl_cost.mean()):.3f}  "
              f"worst {float(cl_cost.max()):.3f}")
        print(f"  max state-box violation {float(viol.max()):.2e}  "
              f"solves converged {conv.sum()}/{conv.size}")


if __name__ == "__main__":
    main()
