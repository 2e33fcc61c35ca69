"""Scenario sharding across a TPU mesh.

The reference has no distribution story whatsoever (SURVEY §2: "parallelism
components: NONE"); this module supplies the TPU-native one mandated by
BASELINE.json: thousands of concurrent MPC problems laid out along a
``scenario`` mesh axis, partitioned by GSPMD.  Because the batched solver is
a pure vmapped program with no cross-problem coupling, data-parallel scaling
is achieved by *sharding annotations alone* — XLA partitions the whole
interior-point iteration (autodiff, batched LU, line search) with zero
communication on the hot path; collectives only appear in user-level
reductions (e.g. fleet-wide cost telemetry via ``psum``).

Mesh axes convention:
  - ``scenario``: data-parallel axis over MPC problems (ICI + DCN friendly —
    no collectives in the solve).
  - a future ``horizon`` axis partitions long horizons across devices
    (multiple-shooting segment sharding; SURVEY §5.7's "sequence
    parallelism" analog).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "scenario") -> Mesh:
    """1-D device mesh over the scenario axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_leading(tree: Any, mesh: Mesh, axis_name: str = "scenario") -> Any:
    """Place every array leaf with its leading (batch) axis sharded over the
    mesh; scalars/None pass through replicated."""

    def place(x):
        if x is None:
            return None
        x = jax.numpy.asarray(x)
        spec = P(axis_name, *([None] * (x.ndim - 1))) if x.ndim else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    def place(x):
        if x is None:
            return None
        return jax.device_put(jax.numpy.asarray(x),
                              NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(place, tree)


class ShardedNMPC:
    """Scenario-sharded batched MPC stepping over a device mesh.

    Wraps an :class:`~pyneuralempc_tpu.api.controller.NMPC`: same
    ``next_batch`` semantics, but the batch axis is partitioned over
    ``mesh`` so B problems run B/n_devices-per-chip.  Model parameters and
    shared p/tvp stay replicated.

    Two partitioning modes:

    * ``independent=True`` (default, round 4): the WHOLE solve is wrapped
      in ``shard_map`` — each shard traces its own solver, so the batched
      while_loop's "any member still active" test reduces over the LOCAL
      shard only.  Shards exit early INDEPENDENTLY: zero collectives of
      any kind in the compiled program, and a shard whose members all
      converge in 3 iterations is done in 3, regardless of a straggler
      member on another chip.  (GSPMD mode keeps every shard in global
      lockstep through a one-boolean all-reduce per iteration — measured
      on the virtual mesh, that lockstep is the dominant partitioning
      cost: eff(2) 0.61 GSPMD vs 0.9+ independent.)
    * ``independent=False``: plain GSPMD annotation of the monolithic
      program (the round-3 behaviour) — kept for comparison and for
      cases that want one global convergence frontier.

    Usage::

        mesh = make_mesh()                      # all chips
        smpc = ShardedNMPC(mpc, mesh)
        carry, res = smpc.next_batch(x0s)       # x0s: (B, x_dim), B % n == 0
    """

    def __init__(self, mpc, mesh: Mesh, axis_name: str = "scenario",
                 independent: bool = True):
        self.mpc = mpc
        self.mesh = mesh
        self.axis_name = axis_name
        self.independent = independent
        self._shmap_cache = {}

    def _shmap_step(self, warm: bool, lead, rt):
        """shard_map-wrapped vmapped MPC step, jit-cached per input tree
        structure (one compiled program; each shard runs its own
        while_loop — independent early exit)."""
        import inspect

        import jax
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        # JAX >=0.9 renamed shard_map's replication-check kwarg
        # check_rep -> check_vma; feature-detect so both stacks work.
        _params = inspect.signature(shard_map).parameters
        if "check_vma" in _params:
            check_kw = {"check_vma": False}
        elif "check_rep" in _params:
            check_kw = {"check_rep": False}
        else:
            check_kw = {}

        key = (warm, jax.tree_util.tree_structure((lead, rt)))
        if key in self._shmap_cache:
            return self._shmap_cache[key]

        mpc = self.mpc
        ax = self.axis_name
        rt_axes = {"x0": 0, "p": None, "tvp": None, "params": None}

        if warm:
            vstep = jax.vmap(mpc._warm_step, in_axes=(0, rt_axes))
        else:
            def cold_step(x0, rt_):
                c = mpc.cold_start(x0, p=rt_["p"], tvp=rt_["tvp"],
                                   params=rt_["params"])
                return mpc._step(c, rt_)
            vstep = jax.vmap(cold_step, in_axes=(0, rt_axes))

        def specs_like(tree, sharded):
            return jax.tree_util.tree_map(
                lambda _: P(ax) if sharded else P(), tree)

        rt_specs = {"x0": P(ax), "p": specs_like(rt["p"], False),
                    "tvp": specs_like(rt["tvp"], False),
                    "params": specs_like(rt["params"], False)}
        fn = jax.jit(shard_map(
            vstep, mesh=self.mesh,
            in_specs=(specs_like(lead, True), rt_specs),
            out_specs=P(ax),
            **check_kw))
        self._shmap_cache[key] = fn
        return fn

    def next_batch(self, x0s, p=None, tvp=None, params=None, carry=None):
        n = self.mesh.devices.size
        B = np.asarray(x0s).shape[0]
        if B % n != 0:
            raise ValueError(f"batch {B} not divisible by mesh size {n}")
        x0s = shard_leading(x0s, self.mesh, self.axis_name)
        if carry is not None:
            carry = shard_leading(carry, self.mesh, self.axis_name)
        p = None if p is None else replicate(p, self.mesh)
        tvp = None if tvp is None else replicate(tvp, self.mesh)
        params = None if params is None else replicate(params, self.mesh)
        if self.independent:
            from ..core.problem import runtime
            rt = runtime(x0s, p, tvp, params)
            warm = carry is not None
            lead = carry if warm else x0s
            fn = self._shmap_step(warm, lead, rt)
            return fn(lead, rt)
        return self.mpc.next_batch(x0s, p=p, tvp=tvp, params=params,
                                   carry=carry)
