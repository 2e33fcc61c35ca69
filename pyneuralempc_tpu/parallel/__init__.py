"""Distribution: scenario (dp) and horizon (sp) sharding over a TPU mesh.

The reference has no parallelism of any kind (SURVEY §2); these are the
TPU-native equivalents mandated by BASELINE.json — GSPMD scenario sharding
with zero hot-path collectives, and sequence-parallel (horizon) sharding of
the Riccati KKT sweep with two small all_gathers per solve.
"""

from .sharding import ShardedNMPC, make_mesh, replicate, shard_leading
from .horizon import horizon_sweep, make_horizon_mesh, make_sharded_sweep

__all__ = [
    "ShardedNMPC", "make_mesh", "replicate", "shard_leading",
    "horizon_sweep", "make_horizon_mesh", "make_sharded_sweep",
]
