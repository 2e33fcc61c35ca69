"""RNN-dynamics MPC fleet (BASELINE config 5 as written): 16k concurrent
solves, GRU dynamics model, H=100, receding horizon against the 10 ms
real-time budget.

The GRU's hidden state is LIFTED into the MPC state (models/rnn.py):
z = [x, h], so the transcription stays first-order Markov, the O(H)
Riccati sweep applies unchanged, and all derivatives — including through
the gate nonlinearities — come from autodiff.  The reference lists RNN
dynamics as an unimplemented roadmap item (``README.md:23``).

On a single chip this runs the full B at B-per-chip; --mesh shards the
scenario axis (on a real multi-host slice the same program runs B/n per
chip — scenario sharding is communication-free, docs/SCALING.md).

Run:  python examples/fleet_rnn.py [--cpu] [--batch 16384] [--H 100]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--H", type=int, default=100)
    ap.add_argument("--hidden", type=int, default=8)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--mesh", type=int, default=0)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import pyneuralempc_tpu as nempc
    nempc.enable_compilation_cache()
    from pyneuralempc_tpu.models.rnn import (fit_gru_on_sequences,
                                             gru_dynamics)

    H, DT, B = args.H, 1.0, args.batch

    # Ground truth with hidden memory: a 2-state plant whose response lags
    # the input through an unmeasured first-order filter — exactly what a
    # recurrent surrogate must capture and a feed-forward model cannot.
    def plant_seq(key, T):
        ks = jax.random.split(key, 2)
        x = jax.random.uniform(ks[0], (2,), minval=-0.5, maxval=0.5)
        us = jax.random.uniform(ks[1], (T, 1), minval=-1.0, maxval=1.0)
        w = jnp.zeros(())

        def step(carry, u):
            x, w = carry
            w = 0.7 * w + 0.3 * u[0]                 # hidden actuator lag
            x1 = x[0] + 0.5 * (-0.4 * x[0] + w)
            x2 = x[1] + 0.5 * (0.5 * x[0] - 0.3 * x[1])
            xn = jnp.stack([x1, x2])
            return (xn, w), xn

        (_, _), xs = jax.lax.scan(step, (x, w), us)
        return jnp.concatenate([x[None], xs]), us

    t0 = time.perf_counter()
    gd = gru_dynamics(x_dim=2, u_dim=1, hidden=args.hidden)
    keys = jax.random.split(jax.random.PRNGKey(0), 512)
    X_seqs, U_seqs = jax.vmap(lambda k: plant_seq(k, 32))(keys)
    params, mse = fit_gru_on_sequences(gd, X_seqs, U_seqs, steps=3000,
                                       lr=3e-3)
    print(f"GRU fitted: teacher-forced mse={mse:.2e} "
          f"({time.perf_counter()-t0:.1f}s)")

    cost = gd.head_objective(
        lambda x, u: jnp.sum((x - jnp.array([0.3, 0.2])) ** 2))
    cost = nempc.StageCost(stage=cost)
    box = gd.box(states_constraint=[[-1.0, 1.0], [-1.0, 1.0]],
                 control_constraint=[[-1.0, 1.0]])
    mpc = nempc.NMPC(gd.model, cost, [box], H=H, DT=DT,
                     integrator="direct",
                     config=nempc.IPConfig(max_iter=60))
    print(f"devices={len(jax.devices())}  kkt={mpc.kkt_backend}  "
          f"B={B}  H={H}  lifted state={gd.model.dims.x}")

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 2)), jnp.float32)
    z0s = jax.vmap(gd.lift)(x0s)

    runner = mpc
    if args.mesh:
        from pyneuralempc_tpu.parallel.sharding import ShardedNMPC, make_mesh
        runner = ShardedNMPC(mpc, make_mesh(args.mesh))

    t0 = time.perf_counter()
    carry, res = runner.next_batch(z0s, params=params)
    jax.block_until_ready(carry.w)
    print(f"cold fleet solve (incl compile): {time.perf_counter()-t0:.1f}s"
          f"  converged {int(res.converged.sum())}/{B}")

    carry, res = runner.next_batch(res.x[:, 0], params=params, carry=carry)
    jax.block_until_ready(carry.w)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        carry, res = runner.next_batch(res.x[:, 0], params=params,
                                       carry=carry)
    jax.block_until_ready(carry.w)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"warm fleet step: {dt*1e3:.0f}ms -> {B/dt:,.0f} solves/s  "
          f"(converged {int(res.converged.sum())}/{B})")
    print(f"10ms real-time budget: a {B}-fleet re-plan takes "
          f"{dt*1e3:.0f}ms on one chip -> {dt*1e3/10:.1f} chips' worth of "
          f"work per budget window; per-solve amortized "
          f"{dt/B*1e6:.1f}µs")


if __name__ == "__main__":
    main()
