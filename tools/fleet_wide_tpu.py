"""Out-of-envelope fleet on real TPU (run manually:
python tools/fleet_wide_tpu.py [--batch N] [--chunk C]).

A 10-rotor overactuated multirotor: 12 states, nu=10 CONTROLS.  History:
before round 4 this fleet DIED (monolithic vmapped XLA scan faults the
TPU at fleet batch); round 4 made it SOLVE via host-chunked scan dispatch
(~109 solves/s).  Round 5 extends the streamed Pallas kernel envelope to
nu<=16 (factor-blend δ-retry + symmetric-triangle streaming of G/M cut
both the statement count and the dominant per-stage VMEM block), so this
fleet now rides the kernel path (_kernel_fits: nu=10, nx=12 fits).  Use
NEMPC_DISABLE_PALLAS=1 to re-measure the chunked-scan fallback.

Output committed as tools/fleet_wide_tpu.log.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

M, G = 0.8, 9.81
JX, JY, JZ = 4.0e-3, 4.0e-3, 7.0e-3
ARM, KTAU = 0.22, 0.016
N_ROT = 10
F_HOVER = M * G / N_ROT


def deca_f():
    """10-rotor rigid body: rotors at angles 2πi/10, alternating spin."""
    import jax.numpy as jnp

    ang = np.arange(N_ROT) * 2 * np.pi / N_ROT
    sx = np.sin(ang).astype(np.float32)          # roll arms
    cy = np.cos(ang).astype(np.float32)          # pitch arms
    spin = np.where(np.arange(N_ROT) % 2 == 0, 1.0, -1.0).astype(np.float32)

    def f(x, u):
        v = x[:, 3:6]
        phi, th, psi = x[:, 6:7], x[:, 7:8], x[:, 8:9]
        om = x[:, 9:12]
        p_, q_, r_ = om[:, 0:1], om[:, 1:2], om[:, 2:3]

        T = jnp.sum(u, axis=1, keepdims=True)
        sph, cph = jnp.sin(phi), jnp.cos(phi)
        sth, cth = jnp.sin(th), jnp.cos(th)
        sps, cps = jnp.sin(psi), jnp.cos(psi)
        zb = jnp.concatenate([cph * sth * cps + sph * sps,
                              cph * sth * sps - sph * cps,
                              cph * cth], axis=1)
        acc = (T / M) * zb - jnp.concatenate(
            [jnp.zeros_like(T), jnp.zeros_like(T),
             jnp.full_like(T, G)], axis=1)

        tth = sth / jnp.maximum(cth, 1e-3)
        dphi = p_ + sph * tth * q_ + cph * tth * r_
        dth = cph * q_ - sph * r_
        dpsi = (sph * q_ + cph * r_) / jnp.maximum(cth, 1e-3)

        tau_x = ARM * (u @ jnp.asarray(sx))[:, None]
        tau_y = -ARM * (u @ jnp.asarray(cy))[:, None]
        tau_z = KTAU * (u @ jnp.asarray(spin))[:, None]
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
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=0,
                    help="override NEMPC_SCAN_CHUNK")
    ap.add_argument("--no-solve-chunk", action="store_true",
                    help="force the monolithic vmap (batch_chunk=0) to "
                    "exercise the sweep-level chunked dispatch instead")
    args = ap.parse_args()
    if args.chunk:
        os.environ["NEMPC_SCAN_CHUNK"] = str(args.chunk)

    import jax
    import jax.numpy as jnp
    import pyneuralempc_tpu as nempc
    nempc.enable_compilation_cache()
    from pyneuralempc_tpu.ops.pallas.riccati_kernel import kernel_plan

    H = 50
    print(f"backend={jax.default_backend()} devices={jax.devices()} "
          f"B={args.batch} H={H} nu={N_ROT}", flush=True)
    plan = kernel_plan(H, 12, N_ROT, batch=args.batch)
    print(f"kernel_plan: {plan}", flush=True)

    truth = nempc.jax_dynamics(deca_f(), x_dim=12, u_dim=N_ROT)
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
        control_constraint=[[0.0, 2.5]] * N_ROT)
    mpc = nempc.NMPC(truth, cost, [box], H=H, DT=0.02, integrator="rk4",
                     config=nempc.IPConfig(max_iter=80))
    bc = 0 if args.no_solve_chunk else None
    auto = mpc._auto_batch_chunk(args.batch)
    print(f"kkt backend: {mpc.kkt_backend}  "
          f"auto batch_chunk: {auto if bc is None else 'forced 0'}",
          flush=True)

    B = args.batch
    rng = np.random.default_rng(0)
    x0 = np.zeros((B, 12), np.float32)
    x0[:, 0:3] = rng.uniform(-1.0, 1.0, (B, 3))
    x0[:, 3:6] = rng.uniform(-0.5, 0.5, (B, 3))
    x0[:, 6:8] = rng.uniform(-0.3, 0.3, (B, 2))
    x0s = jnp.asarray(x0)

    t0 = time.perf_counter()
    carry, res = mpc.next_batch(x0s, batch_chunk=bc)
    jax.block_until_ready(carry.w)
    n_conv = int(res.converged.sum())
    print(f"cold batched solve + compile: {time.perf_counter()-t0:.1f}s  "
          f"converged {n_conv}/{B}  iters max {int(res.iterations.max())} "
          f"mean {float(res.iterations.mean()):.2f}", flush=True)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        carry, res = mpc.next_batch(res.x[:, 0], carry=carry, batch_chunk=bc)
    jax.block_until_ready(carry.w)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"warm fleet step: {dt*1e3:.0f}ms -> {B/dt:,.0f} solves/s  "
          f"converged {int(res.converged.sum())}/{B}  "
          f"iters max {int(res.iterations.max())} "
          f"mean {float(res.iterations.mean()):.2f}", flush=True)
    print("OUT-OF-ENVELOPE FLEET SOLVED (chunked scan dispatch)",
          flush=True)


if __name__ == "__main__":
    main()
