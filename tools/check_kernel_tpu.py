"""On-hardware Pallas kernel check (run manually: python tools/check_kernel_tpu.py).

The pytest suite runs on the CPU backend (conftest forces it), so the
kernel there is exercised in interpret mode only.  This script runs the
COMPILED kernel on the real TPU and checks it against the vmapped scan
reference — correctness of both the fused (CH=H resident) and streamed
(CH=1) paths, the per-lane in-kernel δ retry, and a sweep-only timing
ratio.  Output is committed as tools/check_kernel_tpu.log.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyneuralempc_tpu.ops.pallas.riccati_kernel import (  # noqa: E402
    _pick_chunk, riccati_sweep_pallas)
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


def check(name, B, H, nx, nu, time_it=False):
    ch = _pick_chunk(H, nx, nu)
    args = make_data(B, H, nx, nu)
    with jax.default_matmul_precision("float32"):
        ref_fn = jax.jit(jax.vmap(riccati_sweep_ref))
        ker_fn = jax.jit(lambda *a: riccati_sweep_pallas(*a))
        ref = ref_fn(*args)
        out = ker_fn(*args)
        jax.block_until_ready(out[0])
        err = max(float(jnp.max(jnp.abs(o - r)))
                  for o, r in zip(out[:3], ref[:3]))
        ok_agree = bool(jnp.all(out[3] == ref[3]))
        line = (f"{name}: B={B} H={H} nx={nx} nu={nu} CH={ch} "
                f"max|kernel-scan|={err:.2e} ok-flags-agree={ok_agree}")
        if time_it:
            for fn, tag in ((ref_fn, "scan"), (ker_fn, "kernel")):
                fn(*args)[0].block_until_ready()
                t0 = time.perf_counter()
                for _ in range(10):
                    o = fn(*args)
                jax.block_until_ready(o[0])
                line += f"  {tag}={1e3*(time.perf_counter()-t0)/10:.2f}ms"
        print(line, flush=True)
        scale = max(float(jnp.max(jnp.abs(r))) for r in ref[:3])
        assert err <= 5e-4 * max(scale, 1.0), (err, scale)
        assert ok_agree


def check_local_retry(B=1024, H=8, nx=3, nu=2):
    """Unified local-δ semantics on hardware: a numerically-marginal
    pivot is rescued by the nudge-scale local retry, a genuinely
    indefinite one reports ok=False — identically in the kernel
    (per-lane) and the scan reference (per-stage)."""
    args = make_data(B, H, nx, nu, seed=3)
    # lane 7: marginal pivot (kill B at one stage so Quu = Muu + Guu,
    # then push one diagonal entry barely negative — rescuable at 1e-6)
    Bm = np.array(args[1])
    Bm[7, 2] = 0.0
    args[1] = jnp.asarray(Bm)
    M = np.array(args[3])
    G = np.array(args[2])
    M[7, 2, nx, nx] = -G[7, 2, nx, nx] - 2e-7
    # cancel Guu's off-diagonal so the marginal pivot stays decoupled
    # (a -2e-7 pivot under 0.05-scale coupling is unrescuable at nudge δ)
    M[7, 2, nx, nx + 1] = M[7, 2, nx + 1, nx] = -G[7, 2, nx, nx + 1]
    M[7, 2, nx + 1, nx + 1] = (1.0 - G[7, 2, nx + 1, nx + 1])
    # decouple Qux/qu at the marginal stage so the rescued gain stays
    # bounded (Mxu = Gux = 0, mu = 0; B is already zeroed)
    M[7, 2, :nx, nx:] = M[7, 2, nx:, :nx] = 0.0
    G[7, 2, :nx, nx:] = G[7, 2, nx:, :nx] = 0.0
    args[2] = jnp.asarray(G)
    mu_ = np.array(args[5])
    mu_[7, 2] = 0.0
    args[5] = jnp.asarray(mu_)
    # lane 9: genuine indefiniteness — must defer to the global ladder
    M[9, 2, nx, nx] = -0.5
    args[3] = jnp.asarray(M)
    with jax.default_matmul_precision("float32"):
        ref = jax.jit(jax.vmap(riccati_sweep_ref))(*args)
        out = jax.jit(lambda *a: riccati_sweep_pallas(*a))(*args)
    assert bool(ref[3][7]), "scan local δ retry should rescue lane 7"
    assert bool(out[3][7]), "kernel local δ retry should rescue lane 7"
    assert not bool(ref[3][9]), "scan must defer lane 9 to the ladder"
    assert not bool(out[3][9]), "kernel must defer lane 9 to the ladder"
    assert np.all(np.isfinite(np.asarray(out[0][7])))
    poisoned_err = float(jnp.max(jnp.abs(out[0][7] - ref[0][7])))
    healthy_err = float(jnp.max(jnp.abs(out[0][0] - ref[0][0])))
    print(f"local-retry: marginal lane rescued by BOTH backends, "
          f"indefinite lane deferred by BOTH "
          f"(rescued-lane err {poisoned_err:.2e}, healthy-lane err "
          f"{healthy_err:.2e})", flush=True)
    assert healthy_err < 5e-4
    assert poisoned_err < 5e-3   # rescued gains are regularised; looser


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    assert jax.default_backend() == "tpu", "run this on the TPU backend"
    check("LV-size (fused path)", B=4096, H=20, nx=2, nu=1, time_it=True)
    check("mid-size", B=2048, H=30, nx=4, nu=2)
    check("quadrotor-size (streamed path)", B=2048, H=50, nx=12, nu=4,
          time_it=True)
    check_local_retry()
    print("ALL TPU KERNEL CHECKS PASS")


if __name__ == "__main__":
    main()
