"""Horizon-axis sweep benchmark on real TPU (run manually:
python tools/bench_horizon_tpu.py).

VERDICT r2 item 7 asks for a MEASURED horizon-axis number, not just the
recipe.  Multi-chip hardware is unavailable here, so the hardware-true
measurement this host CAN make is the single-chip crossover between the
three sweep implementations as H grows:

* ``riccati_sweep_ref`` — lax.scan, O(H) sequential depth (the XLA
  latency-bound shape);
* ``riccati_sweep_pscan`` — associative scan, O(log H) depth at ~3× the
  FLOPs (the element type sequence parallelism shards across devices:
  ``parallel/horizon.py`` splits exactly this composition, so its
  single-chip win over the scan bounds what a horizon-sharded mesh can
  add on top);
* the streamed Pallas kernel — O(H) depth but one fused program (no
  per-stage dispatch overhead).

The virtual-mesh horizon-sharding overhead (the all_gather stitching
cost) is measured separately by ``bench_scaling.py --horizon-axis`` on
the CPU mesh; the two together give the measured picture docs/SCALING.md
records.  Output committed as tools/bench_horizon_tpu.log.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyneuralempc_tpu.ops.pallas.riccati_kernel import (  # noqa: E402
    _kernel_fits, riccati_sweep_pallas)
from pyneuralempc_tpu.solve.pscan import riccati_sweep_pscan  # noqa: E402
from pyneuralempc_tpu.solve.riccati import riccati_sweep_ref  # noqa: E402


def make_data(B, H, nx, nu, seed=0):
    rng = np.random.default_rng(seed)
    ns = nx + nu
    A = jnp.asarray(np.eye(nx) + 0.1 * rng.normal(0, 0.3, (B, H, nx, nx)),
                    jnp.float32)
    Bm = jnp.asarray(0.1 * rng.normal(0, 1, (B, H, nx, nu)), jnp.float32)
    G = jnp.asarray(rng.normal(0, 0.05, (B, H, ns, ns)), jnp.float32)
    G = 0.5 * (G + G.transpose(0, 1, 3, 2))
    M = jnp.asarray(rng.normal(0, 0.1, (B, H, ns, ns)), jnp.float32)
    M = 0.5 * (M + M.transpose(0, 1, 3, 2)) + jnp.eye(ns)
    mx = jnp.asarray(rng.normal(0, 1, (B, H, nx)), jnp.float32)
    mu_ = jnp.asarray(rng.normal(0, 1, (B, H, nu)), jnp.float32)
    c = jnp.asarray(rng.normal(0, 0.1, (B, H, nx)), jnp.float32)
    delta = jnp.zeros((B,), jnp.float32)
    return [A, Bm, G, M, mx, mu_, c, delta]


def time_fn(fn, args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out[0])
    # warm the dispatch pipeline (first chained dispatches after a sync
    # run slow through the tunnel — CLAUDE.md)
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out[0])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    assert jax.default_backend() == "tpu"
    B, nx, nu = 64, 4, 2
    print(f"B={B} nx={nx} nu={nu}  (ms per batched sweep)", flush=True)
    print(f"{'H':>5} {'scan':>9} {'pscan':>9} {'pallas':>9}  winner",
          flush=True)
    with jax.default_matmul_precision("float32"):
        scan_fn = jax.jit(jax.vmap(riccati_sweep_ref))
        pscan_fn = jax.jit(jax.vmap(riccati_sweep_pscan))
        ker_fn = jax.jit(lambda *a: riccati_sweep_pallas(*a))
        crossover = None
        for H in (32, 64, 128, 256, 512, 1024):
            args = make_data(B, H, nx, nu)
            t_scan = time_fn(scan_fn, args)
            t_pscan = time_fn(pscan_fn, args)
            t_ker = (time_fn(ker_fn, args)
                     if _kernel_fits(H, nx, nu) else float("nan"))
            rows = {"scan": t_scan, "pscan": t_pscan, "pallas": t_ker}
            winner = min((v, k) for k, v in rows.items()
                         if v == v)[1]
            if crossover is None and t_pscan < t_scan:
                crossover = H
            print(f"{H:>5} {t_scan:>9.2f} {t_pscan:>9.2f} {t_ker:>9.2f}"
                  f"  {winner}", flush=True)
    print(f"pscan-beats-scan crossover: "
          f"{'H=%d' % crossover if crossover else 'not reached'}",
          flush=True)


if __name__ == "__main__":
    main()
