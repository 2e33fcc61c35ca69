"""Cartpole swing-up via economic NMPC (BASELINE config 3).

4-state (cart position/velocity, pole angle/rate), 1 input (cart force),
H=50, nonlinear dynamics, a *nonlinear state constraint* (pole-tip
horizontal clearance |pos + L·sinθ| <= TIP_MAX — a StageConstraint solved
on the O(H) Riccati KKT backend, not the dense fallback), box bounds, and a
custom economic cost (energy shaping + effort price — no reference
trajectory).

θ is measured from the UPRIGHT position (θ=0 up, θ=π hanging); the MPC must
discover the pumping maneuver on its own, while keeping the tip inside the
clearance envelope.

Run: python examples/cartpole.py [--cpu] [--mlp] [--steps N]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# physics
MC, MP, L, G = 1.0, 0.1, 0.5, 9.81


def cartpole_f():
    import jax.numpy as jnp

    def f(x, u):
        # x = [pos, vel, theta, omega]; theta=0 upright
        pos, vel, th, om = x[:, 0:1], x[:, 1:2], x[:, 2:3], x[:, 3:4]
        F = u[:, 0:1]
        s, c = jnp.sin(th), jnp.cos(th)
        # standard cartpole equations (theta from upright)
        denom = MC + MP * s ** 2
        acc = (F + MP * s * (L * om ** 2 - G * c)) / denom
        alpha = (-F * c - MP * L * om ** 2 * s * c
                 + (MC + MP) * G * s) / (L * denom)
        return jnp.concatenate([vel, acc, om, alpha], axis=1)

    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mlp", action="store_true")
    ap.add_argument("--steps", type=int, default=60)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import pyneuralempc_tpu as nempc
    nempc.enable_compilation_cache()
    from pyneuralempc_tpu.ops.integrators import step_fn

    H, DT = 50, 0.05
    f_true = cartpole_f()
    truth = nempc.jax_dynamics(f_true, x_dim=4, u_dim=1)

    if args.mlp:
        from pyneuralempc_tpu.models.train import fit_normalized_surrogate

        # angle-aware features: θ enters as (sin θ, cos θ) so the net never
        # sees a wrap; inputs/targets are standardised (train.py)
        def feats(x):
            return jnp.concatenate([x[:, :2], jnp.sin(x[:, 2:3]),
                                    jnp.cos(x[:, 2:3]), x[:, 3:4]], axis=1)

        model, params, rel_mse = fit_normalized_surrogate(
            f_true, jax.random.PRNGKey(0), x_dim=4, u_dim=1,
            hidden=[128, 128], n=131072, x_range=(-4.0, 4.0),
            u_range=(-12.0, 12.0), steps=12000, lr=1e-3, batch=4096,
            feature_map=feats, feature_dim=5, name="cartpole_mlp")
        print(f"surrogate fitted: normalized mse={rel_mse:.2e}")
    else:
        model, params = truth, None

    # economic cost: pay for pole potential-energy deficit + effort price
    cost = nempc.StageCost(
        stage=lambda x, u: (3.0 * (1.0 - jnp.cos(x[2]))
                            + 0.1 * x[0] ** 2 + 0.05 * x[1] ** 2
                            + 0.05 * x[3] ** 2 + 0.01 * jnp.sum(u ** 2)),
        terminal=lambda x: 30.0 * (1.0 - jnp.cos(x[2])) + 5.0 * x[3] ** 2)
    box = nempc.DomainConstraint(
        states_constraint=[[-2.0, 2.0], [-6.0, 6.0],
                           [-2.0 * np.pi, 2.0 * np.pi], [-12.0, 12.0]],
        control_constraint=[[-10.0, 10.0]])
    # nonlinear state constraint (config 3): pole-tip horizontal clearance
    # |pos + L·sin θ| <= TIP_MAX — stage-wise, so it folds into the Riccati
    # sweep (slack Σ condensed into the per-stage blocks).
    TIP_MAX = 0.55
    tip = nempc.stage_interval(
        lambda x, u: jnp.array([x[0] + L * jnp.sin(x[2])]),
        dim=1, lb=-TIP_MAX, ub=TIP_MAX)
    mpc = nempc.NMPC(model, cost, [box, tip], H=H, DT=DT, integrator="rk4",
                     config=nempc.IPConfig(max_iter=120))
    print("kkt backend:", mpc.kkt_backend)
    assert mpc.kkt_backend == "riccati", \
        "config 3 must run structured O(H), not dense"

    phi_true = step_fn(truth, "rk4", DT)
    x = jnp.array([0.0, 0.0, np.pi - 0.05, 0.0])  # hanging (tiny offset
    # breaks the exact-saddle symmetry at theta=pi where all gradients vanish)
    import time
    conv, traj, us, lat = [], [x], [], []
    plan, k = None, 0
    for t in range(args.steps):
        if t % 2 == 0:
            t0 = time.perf_counter()
            res = mpc.next(x, params=params)
            jax.block_until_ready(res.u)
            lat.append(time.perf_counter() - t0)
            plan, k = res, 0
            conv.append(bool(res.converged))
        u = plan.u[k]
        k += 1
        x = phi_true(x[None, :], u[None, :])[0]
        traj.append(x)
        us.append(float(u[0]))
    # blocking re-plan latency (drop the compile-laden first two solves)
    if len(lat) > 4:
        warm = np.asarray(lat[2:])
        print(f"re-plan latency (H=50, nonlinear tip constraint, "
              f"riccati): p50={np.median(warm)*1e3:.1f}ms  "
              f"min={warm.min()*1e3:.1f}ms")

    traj = np.asarray(traj)
    cos_final = float(np.cos(traj[-1, 2]))
    tip_pos = traj[:, 0] + L * np.sin(traj[:, 2])
    print(f"solves converged: {sum(conv)}/{len(conv)}")
    print(f"final cos(theta): {cos_final:.3f}  (1.0 = upright)")
    print(f"cart pos range: [{traj[:,0].min():.2f}, {traj[:,0].max():.2f}]"
          f"  (box +-2)")
    print(f"tip clearance |pos + L sin(th)| max: {np.abs(tip_pos).max():.3f}"
          f"  (nonlinear constraint <= {TIP_MAX})")
    print(f"force range: [{min(us):.2f}, {max(us):.2f}]  (box +-10)")
    assert np.abs(traj[:, 0]).max() <= 2.01, "cart position bound violated"
    assert np.abs(tip_pos).max() <= TIP_MAX + 0.05, \
        "tip clearance constraint violated in closed loop"
    return cos_final


if __name__ == "__main__":
    main()
