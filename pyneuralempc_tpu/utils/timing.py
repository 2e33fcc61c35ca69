"""Benchmark timing helpers (the reference imports ``time`` and never uses
it — SURVEY §5.1; here throughput/latency measurement is first-class)."""

from __future__ import annotations

import time
from typing import Callable, Dict

import jax
import numpy as np


def time_fn(fn: Callable, *args, warmup: int = 2, iters: int = 10,
            **kwargs) -> Dict[str, float]:
    """Wall-time a device function: returns p50/mean/min seconds per call.

    Blocks on all outputs so async dispatch doesn't lie to us.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts)
    return {"p50": float(np.median(ts)), "mean": float(ts.mean()),
            "min": float(ts.min()), "max": float(ts.max()),
            "iters": iters}
