"""Scaling-efficiency harness (bench_scaling.py) wired into the suite.

The 8-device virtual-mesh case must build, shard, and measure — the
committed efficiency table in docs/SCALING.md comes from this harness.
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench_scaling import build_mpc, measure  # noqa: E402


@pytest.mark.slow
def test_measure_unsharded_and_8way():
    assert len(jax.devices()) >= 8   # conftest virtual mesh
    mpc = build_mpc(H=8)
    B = 16
    t_ref, conv_ref = measure(mpc, B, steps=1, n_devices=None)
    t_8, conv_8 = measure(mpc, B, steps=1, n_devices=8)
    assert conv_ref == B and conv_8 == B
    assert np.isfinite(t_ref) and t_ref > 0
    assert np.isfinite(t_8) and t_8 > 0


def test_bench_telemetry_line():
    """bench.telemetry emits the solver-health fields (iteration spread +
    restorations) the round-3 logs are required to carry."""
    import jax.numpy as jnp

    import pyneuralempc_tpu as nempc
    from bench import telemetry

    mpc = build_mpc(H=8)
    x0s = jnp.asarray(np.stack([np.linspace(0.25, 0.6, 8),
                                np.linspace(-0.6, -0.3, 8)], axis=1),
                      jnp.float32)
    _, res = mpc.next_batch(x0s)
    line = telemetry("smoke", res)
    for field in ("iters max=", "mean=", "p95=", "restorations=",
                  "unconverged="):
        assert field in line
    assert "telemetry[smoke]" in line
    assert "unconverged=0" in line
