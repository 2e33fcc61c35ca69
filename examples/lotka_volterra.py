"""Closed-loop economic MPC on the controlled Lotka-Volterra system.

The canonical workload, rebuilt from the reference example
(``/root/reference/examples/lotka_volterra/run.py``) with its coordinate
inconsistency fixed: the reference applies raw-coefficient dynamics to
normalized states (run.py:30-34 vs :64-66), which yields an uncontrollable
system.  Here the normalization is carried through the dynamics properly.

System (raw units): prey x₁~[0,60], predator x₂~[0,40], feed rate u∈[0,60]:

    ẋ₁ = 0.5·x₁ − 0.025·x₁·x₂
    ẋ₂ = −0.5·x₂ + u + 0.005·x₁·x₂

Economics: feeding the predators costs 1.1/unit; the farm must keep the
prey population under a hard cap.  The MPC feeds as little as possible
while honouring the cap — a pure economic cost with an active state
constraint, no tracking term.

Run:  python examples/lotka_volterra.py [--mlp] [--steps N] [--cpu]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def normalized_lv():
    """Normalized dynamics x_n = x/30 − 1, u_n = u/50, properly transformed:
    dx_n/dt = f_raw(30(x_n+1), 50·u_n) / 30."""
    import jax.numpy as jnp

    def f(x, u):
        xr = 30.0 * (x + 1.0)
        ur = 50.0 * u
        d1 = 0.5 * xr[:, :1] - 0.025 * xr[:, :1] * xr[:, 1:]
        d2 = -0.5 * xr[:, 1:] + ur + 0.005 * xr[:, :1] * xr[:, 1:]
        return jnp.concatenate([d1, d2], axis=1) / 30.0

    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mlp", action="store_true",
                    help="use a trained MLP surrogate instead of the ODE")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import pyneuralempc_tpu as nempc
    nempc.enable_compilation_cache()
    from pyneuralempc_tpu.ops.integrators import step_fn

    H, DT = 25, 0.1
    f_true = normalized_lv()
    truth = nempc.jax_dynamics(f_true, x_dim=2, u_dim=1)

    if args.mlp:
        from pyneuralempc_tpu.models.mlp import MLPDynamics
        from pyneuralempc_tpu.models.train import (fit_surrogate,
                                                   sample_transitions)
        surrogate = MLPDynamics.make(x_dim=2, u_dim=1, hidden=[32, 32])
        X, U, Y = sample_transitions(
            lambda x, u: f_true(x, u), jax.random.PRNGKey(0), 8192, 2, 1,
            x_range=(-1.0, 1.2), u_range=(0.0, 1.2))
        params, mse = fit_surrogate(surrogate, X, U, Y, steps=3000, lr=2e-3,
                                    batch=1024)
        print(f"surrogate fitted: mse={mse:.2e}")
        model = surrogate
    else:
        model, params = truth, None

    # economics: feed cost, prey cap at raw 60 (normalized 1.0)
    cost = lambda x, u: jnp.sum(u * 1.1)
    box = nempc.DomainConstraint(
        states_constraint=[[-1.0, 1.0], [-1.0, 0.35]],
        control_constraint=[[0.0, 1.2]])
    mpc = nempc.NMPC(model, cost, [box], H=H, DT=DT, integrator="rk4")

    # plant: ground-truth ODE, re-plan every 2 steps (run.py REFRESH_EVERY=2)
    phi_true = step_fn(truth, "rk4", DT)
    x = jnp.array([50.0 / 30 - 1, 5.0 / 30 - 1])
    traj, us, feed_cost, n_conv = [x], [], 0.0, 0
    plan, k = None, 0
    for t in range(args.steps):
        if t % 2 == 0:
            res = mpc.next(x, params=params)
            plan, k = res, 0
            n_conv += int(bool(res.converged))
        u = plan.u[k]
        k += 1
        x = phi_true(x[None, :], u[None, :])[0]
        traj.append(x)
        us.append(float(u[0]))
        feed_cost += 1.1 * float(u[0]) * DT

    traj = np.asarray(traj)
    prey = 30.0 * (traj[:, 0] + 1)
    pred = 30.0 * (traj[:, 1] + 1)
    print(f"solves converged: {n_conv}/{(args.steps + 1) // 2}")
    print(f"prey  range: [{prey.min():6.2f}, {prey.max():6.2f}]  (cap 60)")
    print(f"pred  range: [{pred.min():6.2f}, {pred.max():6.2f}]")
    print(f"feed  range: [{50*min(us):6.2f}, {50*max(us):6.2f}]")
    print(f"total feed cost: {50*feed_cost:.2f}")
    assert prey.max() <= 60.5, "prey cap violated"


if __name__ == "__main__":
    main()
