"""Quadrotor fleet MPC (BASELINE config 4): 12-state / 4-input dynamics,
H=50, 1k-scenario batched solves on one chip.

State: position p(3), velocity v(3), attitude (roll, pitch, yaw), body
rates ω(3).  Controls: four rotor thrusts (N).  The batch solves 1024
different initial conditions concurrently (vmap), each steering to hover at
the origin under thrust limits — the fleet-serving workload the reference
cannot express at all (one NMPC.next() = one problem; SURVEY §2).

Run: python examples/quadrotor.py [--cpu] [--batch N] [--mlp]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

M, G = 0.5, 9.81
JX, JY, JZ = 2.3e-3, 2.3e-3, 4.0e-3
ARM, KTAU = 0.17, 0.016   # arm length, yaw-torque/thrust ratio
F_HOVER = M * G / 4.0


def quad_f():
    import jax.numpy as jnp

    def f(x, u):
        v = x[:, 3:6]
        phi, th, psi = x[:, 6:7], x[:, 7:8], x[:, 8:9]
        om = x[:, 9:12]
        p_, q_, r_ = om[:, 0:1], om[:, 1:2], om[:, 2:3]

        T = jnp.sum(u, axis=1, keepdims=True)
        sph, cph = jnp.sin(phi), jnp.cos(phi)
        sth, cth = jnp.sin(th), jnp.cos(th)
        sps, cps = jnp.sin(psi), jnp.cos(psi)

        # body z-axis in world frame (ZYX euler)
        zb = jnp.concatenate([cph * sth * cps + sph * sps,
                              cph * sth * sps - sph * cps,
                              cph * cth], axis=1)
        acc = (T / M) * zb - jnp.concatenate(
            [jnp.zeros_like(T), jnp.zeros_like(T),
             jnp.full_like(T, G)], axis=1)

        # euler kinematics
        tth = sth / jnp.maximum(cth, 1e-3)
        dphi = p_ + sph * tth * q_ + cph * tth * r_
        dth = cph * q_ - sph * r_
        dpsi = (sph * q_ + cph * r_) / jnp.maximum(cth, 1e-3)

        # torques from differential thrust (x config)
        tau_x = ARM * (u[:, 1:2] - u[:, 3:4])
        tau_y = ARM * (u[:, 2:3] - u[:, 0:1])
        tau_z = KTAU * (u[:, 0:1] - u[:, 1:2] + u[:, 2:3] - u[:, 3:4])
        dom = jnp.concatenate(
            [(tau_x - (JZ - JY) * q_ * r_) / JX,
             (tau_y - (JX - JZ) * p_ * r_) / JY,
             (tau_z - (JY - JX) * p_ * q_) / JZ], axis=1)

        return jnp.concatenate([v, acc,
                                jnp.concatenate([dphi, dth, dpsi], axis=1),
                                dom], axis=1)

    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--mlp", action="store_true")
    ap.add_argument("--H", type=int, default=50)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import time

    import jax.numpy as jnp
    import pyneuralempc_tpu as nempc
    nempc.enable_compilation_cache()

    H, DT = args.H, 0.02
    f_true = quad_f()
    truth = nempc.jax_dynamics(f_true, x_dim=12, u_dim=4)

    if args.mlp:
        from pyneuralempc_tpu.models.train import fit_normalized_surrogate

        # attitude enters as (sin, cos) per Euler angle; inputs/targets
        # standardised — a raw MLP on these scales fails outright
        # (accelerations ~±25 vs rates ~±1; see train.py)
        def feats(x):
            ang = x[:, 6:9]
            return jnp.concatenate([x[:, :6], jnp.sin(ang), jnp.cos(ang),
                                    x[:, 9:12]], axis=1)

        model, params, rel_mse = fit_normalized_surrogate(
            f_true, jax.random.PRNGKey(0), x_dim=12, u_dim=4,
            hidden=[256, 256], n=262144, x_range=(-1.5, 1.5),
            u_range=(0.0, 3.0), steps=15000, lr=1e-3, batch=8192,
            feature_map=feats, feature_dim=15, name="quad_mlp")
        print(f"surrogate fitted: normalized mse={rel_mse:.2e}")
    else:
        model, params = truth, None

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
    mpc = nempc.NMPC(model, cost, [box], H=H, DT=DT, integrator="rk4",
                     config=nempc.IPConfig(max_iter=80))
    print("kkt backend:", mpc.kkt_backend)

    # 1k scenarios: random displaced/perturbed starts
    rng = np.random.default_rng(0)
    B = args.batch
    x0s = np.zeros((B, 12), np.float32)
    x0s[:, 0:3] = rng.uniform(-1.0, 1.0, (B, 3))      # position offset
    x0s[:, 3:6] = rng.uniform(-0.5, 0.5, (B, 3))      # velocity
    x0s[:, 6:8] = rng.uniform(-0.3, 0.3, (B, 2))      # roll/pitch
    x0s[:, 9:12] = rng.uniform(-0.5, 0.5, (B, 3))     # rates
    x0s = jnp.asarray(x0s)

    t0 = time.perf_counter()
    carry, res = mpc.next_batch(x0s, params=params)
    jax.block_until_ready(carry.w)
    t_cold = time.perf_counter() - t0
    print(f"cold batched solve ({B} scenarios, incl compile): {t_cold:.1f}s"
          f"  converged {int(res.converged.sum())}/{B}")

    carry2, res2 = mpc.next_batch(x0s * 0.98, params=params, carry=carry)
    jax.block_until_ready(carry2.w)   # first warm call compiles; untimed
    t0 = time.perf_counter()
    carry3, res3 = mpc.next_batch(x0s * 0.96, params=params, carry=carry2)
    jax.block_until_ready(carry3.w)
    t_warm = time.perf_counter() - t0
    print(f"warm re-plan: {t_warm*1e3:.0f}ms -> "
          f"{B/t_warm:.0f} solves/s  converged "
          f"{int(res3.converged.sum())}/{B}")

    # sanity: plans steer towards hover
    p_start = float(jnp.mean(jnp.linalg.norm(x0s[:, :3], axis=1)))
    p_end = float(jnp.mean(jnp.linalg.norm(res.x[:, -1, :3], axis=1)))
    print(f"mean |position|: start {p_start:.3f} -> end of plan {p_end:.3f}")
    # tilt-limited flight covers only so much ground in H*DT seconds;
    # expect contraction proportional to the horizon length
    factor = max(0.3, 1.0 - 0.3 * H * DT)
    assert p_end < factor * p_start, "plans do not approach hover"


if __name__ == "__main__":
    main()
