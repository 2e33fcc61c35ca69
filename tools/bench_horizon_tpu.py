"""Horizon-axis benchmark on real TPU (run manually:
python tools/bench_horizon_tpu.py).

VERDICT r2 item 7 asks for a MEASURED horizon-axis number.  Multi-chip
hardware is unavailable here, so the hardware-true measurement this host
CAN make is end-to-end warm re-plan latency vs H for the three sweep
implementations on one chip:

* ``riccati`` (default)  — streamed Pallas kernel under vmap, O(H) depth;
* ``riccati`` + NEMPC_DISABLE_PALLAS=1 — the XLA scan, O(H) depth with
  per-stage dispatch/fusion overhead;
* ``riccati_pscan``      — associative scan, O(log H) depth at ~3× FLOPs.
  Its element composition is exactly what ``parallel/horizon.py`` shards
  across devices, so its single-chip behaviour bounds what a
  horizon-sharded mesh adds for a single problem.

Earlier micro-benchmarking of the bare sweeps produced sub-ms times the
TPU tunnel cannot resolve credibly (single-shot timings vary 3×,
CLAUDE.md), so this harness times the FULL solver (NMPC warm re-plans,
pipelined) where per-step costs are 10⁺ ms.

Round-3 limitation, FIXED in round 4: the matrix-last pscan at B=1024,
H=1024, nx=4 could not even compile on v5e — its (B, H, nx, nx) element
tensors tiled as T(4,128) with a 32× padding expansion and the compiler
asked for 19.3 GB of HBM (15.75 available).  The time-last relayout
(solve/pscan.py, nx <= 4: packed (B, rows, H) elements) removes the
padding; ``pscan_fleet_oom_check`` compiles and runs that exact shape,
and the end-to-end table shows the TL pscan matching or beating the
streamed Pallas kernel at long H (it is the few-long-problems tool; the
kernel remains the fleet-batch default).  Output committed as
tools/bench_horizon_tpu.log.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def build_mpc(H, kkt):
    import jax.numpy as jnp
    import pyneuralempc_tpu as nempc
    nempc.enable_compilation_cache()

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
    return nempc.NMPC(model, cost, [box], H=H, DT=2.0 / H,
                      integrator="rk4",
                      config=nempc.IPConfig(tol=1e-5, kkt=kkt))


def measure(mpc, B, steps=16):
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.stack([rng.uniform(0.2, 0.8, B),
                                rng.uniform(-0.9, -0.3, B)], axis=1),
                      jnp.float32)
    carry, res = mpc.next_batch(x0s)
    jax.block_until_ready(carry.w)
    for _ in range(3):
        carry, res = mpc.next_batch(res.x[:, 0], carry=carry)
    jax.block_until_ready(carry.w)
    for _ in range(8):      # tunnel pipeline ramp, untimed
        carry, res = mpc.next_batch(res.x[:, 0], carry=carry)
    jax.block_until_ready(carry.w)
    t0 = time.perf_counter()
    for _ in range(steps):
        carry, res = mpc.next_batch(res.x[:, 0], carry=carry)
    jax.block_until_ready(carry.w)
    return ((time.perf_counter() - t0) / steps * 1e3,
            int(res.converged.sum()))


def pscan_fleet_oom_check(B=1024, H=1024, nx=4, nu=2):
    """The round-3 blocker: matrix-last pscan at B=1024×H=1024 could not
    even compile (19.3 GB HBM demanded of 15.75 — compiler dump).  The
    round-4 time-last relayout packs elements as (B, rows, H) leaves, so
    tiling pads ~nothing; this check compiles AND runs the bare sweep at
    that exact shape."""
    import time

    import jax
    import jax.numpy as jnp
    from pyneuralempc_tpu.solve.pscan import riccati_sweep_pscan

    rng = np.random.default_rng(0)
    ns = nx + nu
    A = jnp.asarray(np.eye(nx) + 0.02 * rng.normal(0, 0.5, (B, H, nx, nx)),
                    jnp.float32)
    Bm = jnp.asarray(0.02 * rng.normal(0, 1, (B, H, nx, nu)), jnp.float32)
    G = np.asarray(rng.normal(0, 0.02, (B, H, ns, ns)), np.float32)
    G = jnp.asarray(0.5 * (G + G.transpose(0, 1, 3, 2)))
    M = np.asarray(rng.normal(0, 0.05, (B, H, ns, ns)), np.float32)
    M = jnp.asarray(0.5 * (M + M.transpose(0, 1, 3, 2))
                    + np.eye(ns, dtype=np.float32))
    mx = jnp.asarray(rng.normal(0, 1, (B, H, nx)), jnp.float32)
    mu_ = jnp.asarray(rng.normal(0, 1, (B, H, nu)), jnp.float32)
    c = jnp.asarray(rng.normal(0, 0.05, (B, H, nx)), jnp.float32)
    delta = jnp.zeros((B,), jnp.float32)
    with jax.default_matmul_precision("float32"):
        fn = jax.jit(jax.vmap(riccati_sweep_pscan))
        t0 = time.perf_counter()
        out = fn(A, Bm, G, M, mx, mu_, c, delta)
        jax.block_until_ready(out[0])
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = fn(A, Bm, G, M, mx, mu_, c, delta)
        jax.block_until_ready(out[0])
        t_run = time.perf_counter() - t0
    ok = bool(jnp.all(out[3]))
    print(f"pscan(time-last) B={B} H={H} nx={nx} nu={nu}: "
          f"compile+run {t_first:.1f}s, steady run {t_run*1e3:.2f}ms, "
          f"ok={ok} (round-3 matrix-last: 19.3 GB HBM compile OOM)",
          flush=True)


def main():
    import jax
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    assert jax.default_backend() == "tpu"
    pscan_fleet_oom_check()
    print("end-to-end warm re-plan ms/step (pipelined), LV exact "
          "dynamics, tol=1e-5", flush=True)
    print(f"{'B':>5} {'H':>5} {'pallas':>9} {'scan':>9} {'pscan':>9}",
          flush=True)
    for B in (8, 256):
        for H in (64, 512):
            row = {}
            for tag, kkt in (("pallas", "riccati"), ("scan", "riccati"),
                             ("pscan", "riccati_pscan")):
                if tag == "scan":
                    os.environ["NEMPC_DISABLE_PALLAS"] = "1"
                try:
                    mpc = build_mpc(H, kkt)
                    ms, conv = measure(mpc, B)
                    row[tag] = ms
                    if conv != B:
                        print(f"  note: {tag} B={B} H={H} conv {conv}/{B}",
                              flush=True)
                finally:
                    os.environ.pop("NEMPC_DISABLE_PALLAS", None)
            print(f"{B:>5} {H:>5} {row['pallas']:>9.2f} "
                  f"{row['scan']:>9.2f} {row['pscan']:>9.2f}", flush=True)


if __name__ == "__main__":
    main()
