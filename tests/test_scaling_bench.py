"""Scaling-efficiency harness (bench_scaling.py) wired into the suite.

The 8-device virtual-mesh case must build, shard, and measure — the
committed efficiency table in docs/SCALING.md comes from this harness.
"""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench_scaling import build_mpc, measure  # noqa: E402


def test_measure_unsharded_and_8way():
    assert len(jax.devices()) >= 8   # conftest virtual mesh
    mpc = build_mpc(H=8)
    B = 16
    t_ref, conv_ref = measure(mpc, B, steps=1, n_devices=None)
    t_8, conv_8 = measure(mpc, B, steps=1, n_devices=8)
    assert conv_ref == B and conv_8 == B
    assert np.isfinite(t_ref) and t_ref > 0
    assert np.isfinite(t_8) and t_8 > 0
