"""Problem IR: the static description of one economic-MPC problem.

This replaces the reference's scattered contracts (pyNeuralEMPC's
``model/base.py:3-18`` dims + ``controller.py:7-22`` ctor args +
``constraints.py:3-33`` domain bounds) with a single immutable spec that is
hashable, so it can be closed over by jitted functions.  All *runtime* data
(initial state, parameters, time-varying parameters, NN weights, warm starts)
lives in :class:`RuntimeData`, a pytree that can be traced / vmapped /
sharded.

Design note (TPU-first): nothing in this module ever materialises an NLP
matrix.  The spec only records shapes and callables; the transcription layer
(:mod:`pyneuralempc_tpu.core.transcription`) produces pure functions of the
flat decision vector, and all derivatives are taken by JAX autodiff at solve
time, fused under one jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


Array = Any  # jax or numpy array


@dataclasses.dataclass(frozen=True)
class Dims:
    """Dimension metadata, mirroring the reference model contract
    (``/root/reference/pyNeuralEMPC/model/base.py:3-18``)."""

    x: int
    u: int
    p: int = 0
    tvp: int = 0

    @property
    def stage(self) -> int:
        """Decision variables per stage (state + control)."""
        return self.x + self.u


def runtime(x0, p=None, tvp=None, params=None) -> dict:
    """Pytree (plain dict) of runtime inputs for one solve.

    Keys:
      - ``x0``:     (x_dim,) initial state.
      - ``p``:      (p_dim,) constant parameters, or None.
      - ``tvp``:    (H, tvp_dim) time-varying parameters, or None.
      - ``params``: model parameter pytree (NN weights), or None.
    """
    return {
        "x0": jnp.asarray(x0),
        "p": None if p is None else jnp.asarray(p),
        "tvp": None if tvp is None else jnp.asarray(tvp),
        "params": params,
    }


@dataclasses.dataclass(frozen=True)
class Box:
    """Per-dimension box bounds, the equivalent of the reference
    ``DomainConstraint`` (``/root/reference/pyNeuralEMPC/constraints.py:3-33``).

    Bounds are stored as tuples of floats so the spec stays hashable; ±inf
    means unbounded.  ``tile(H)`` produces the flat per-decision-variable
    bound vectors in the canonical ``[x_0..x_{H-1} | u_0..u_{H-1}]`` layout.
    """

    x_lb: Tuple[float, ...]
    x_ub: Tuple[float, ...]
    u_lb: Tuple[float, ...]
    u_ub: Tuple[float, ...]

    @staticmethod
    def make(states_constraint: Sequence[Sequence[float]],
             control_constraint: Sequence[Sequence[float]]) -> "Box":
        """Build from the reference-style list-of-(lb, ub) pairs."""
        for name, c in (("states", states_constraint), ("control", control_constraint)):
            if len(c) == 0:
                raise ValueError(f"{name} constraint list is empty")
            if any(len(e) != 2 for e in c):
                raise ValueError(
                    f"{name} constraints must be (lower, upper) pairs")
            if any(e[0] > e[1] for e in c):
                raise ValueError(f"{name} constraint has lower > upper")
        return Box(
            x_lb=tuple(float(e[0]) for e in states_constraint),
            x_ub=tuple(float(e[1]) for e in states_constraint),
            u_lb=tuple(float(e[0]) for e in control_constraint),
            u_ub=tuple(float(e[1]) for e in control_constraint),
        )

    @staticmethod
    def unbounded(x_dim: int, u_dim: int) -> "Box":
        inf = float("inf")
        return Box(x_lb=(-inf,) * x_dim, x_ub=(inf,) * x_dim,
                   u_lb=(-inf,) * u_dim, u_ub=(inf,) * u_dim)

    def tile(self, H: int, dtype=jnp.float32) -> Tuple[Array, Array]:
        """Flat (lb, ub) over the [X | U] decision block, matching the
        reference tiling (``constraints.py:26-30``)."""
        lb = np.concatenate([np.tile(self.x_lb, H), np.tile(self.u_lb, H)])
        ub = np.concatenate([np.tile(self.x_ub, H), np.tile(self.u_ub, H)])
        return jnp.asarray(lb, dtype), jnp.asarray(ub, dtype)


# Path constraint classification, mirroring
# ``/root/reference/pyNeuralEMPC/constraints.py:36-63``.
EQ_TYPE = 0
INEQ_TYPE = 1
INTER_TYPE = 2


@dataclasses.dataclass(frozen=True)
class PathConstraint:
    """A general stage/trajectory constraint ``lb <= g(x, u, p, tvp) <= ub``.

    ``fn(x:(H,x_dim), u:(H,u_dim), p, tvp) -> (dim,)`` — same batched-in-time
    signature as the dynamics model.  Rows are auto-classified:

      * EQ    rows (lb == ub):       handled as equalities ``g - lb = 0``;
      * other rows (one- or two-sided): lifted with a slack variable ``s``
        bounded by (lb, ub) and the equality ``g - s = 0`` — the standard
        interior-point slack formulation, replacing the reference's
        EQ/INEQ/INTER ad-hoc split (``optimizer/slsqp.py:54-110``).

    ``lb``/``ub`` are float tuples so the spec stays hashable.
    """

    fn: Callable
    dim: int
    lb: Tuple[float, ...]
    ub: Tuple[float, ...]

    def __post_init__(self):
        if len(self.lb) != self.dim or len(self.ub) != self.dim:
            raise ValueError("PathConstraint bounds must have length == dim")
        if any(l > u for l, u in zip(self.lb, self.ub)):
            raise ValueError("PathConstraint has lower > upper bound")

    def row_types(self) -> np.ndarray:
        lb = np.asarray(self.lb)
        ub = np.asarray(self.ub)
        types = np.full(self.dim, INTER_TYPE)
        types[np.isclose(lb, ub)] = EQ_TYPE
        types[(lb == 0.0) & np.isinf(ub)] = INEQ_TYPE
        return types

    def get_type(self) -> int:
        """Whole-constraint classification (reference
        ``constraints.py:57-63`` semantics)."""
        t = self.row_types()
        if (t == EQ_TYPE).all():
            return EQ_TYPE
        if (t == INEQ_TYPE).all():
            return INEQ_TYPE
        return INTER_TYPE


@dataclasses.dataclass(frozen=True)
class StageConstraint:
    """A *stage-wise* path constraint ``lb <= g(x_{t+1}, u_t, p, tvp_t) <= ub``
    applied at every stage t (total H·dim rows).

    ``stage(x:(x_dim,), u:(u_dim,), p, tvp_t) -> (dim,)`` — the same
    single-stage signature as :class:`StageCost.stage` (x is the post-step
    decision state of the stage).  Declaring the stage structure is what
    keeps the O(H) Riccati KKT backend eligible: stage-wise rows are
    block-structured — their slack-eliminated Σ folds into the per-stage
    Hessian blocks, exactly like box bounds — whereas an opaque
    trajectory-level :class:`PathConstraint` forces the dense backend.
    This covers the reference's per-timestep user constraints
    (``/root/reference/pyNeuralEMPC/optimizer/ipopt.py:44-52`` appends them
    below the defect rows and hands them to Ipopt's sparse solver).

    ``lb``/``ub`` are per-stage-row float tuples (length ``dim``).
    Instances are callable with full trajectories (batched-over-time
    contract), returning (H, dim).
    """

    stage: Callable
    dim: int
    lb: Tuple[float, ...]
    ub: Tuple[float, ...]

    def __post_init__(self):
        if len(self.lb) != self.dim or len(self.ub) != self.dim:
            raise ValueError("StageConstraint bounds must have length == dim")
        if any(l > u for l, u in zip(self.lb, self.ub)):
            raise ValueError("StageConstraint has lower > upper bound")

    def row_types(self) -> np.ndarray:
        """Per-stage-row classification (same rules as PathConstraint)."""
        lb = np.asarray(self.lb)
        ub = np.asarray(self.ub)
        types = np.full(self.dim, INTER_TYPE)
        types[np.isclose(lb, ub)] = EQ_TYPE
        types[(lb == 0.0) & np.isinf(ub)] = INEQ_TYPE
        return types

    def __call__(self, x, u, p=None, tvp=None):
        import jax
        from ..models.base import _call_user_fn

        def one(x_t, u_t, tvp_t):
            return jnp.atleast_1d(_call_user_fn(self.stage, x_t, u_t, p,
                                                tvp_t))

        tvp_axis = None if tvp is None else 0
        return jax.vmap(one, in_axes=(0, 0, tvp_axis))(x, u, tvp)


def stage_inequality(fn: Callable, dim: int = 1) -> StageConstraint:
    """g(x_t, u_t) >= 0 at every stage."""
    return StageConstraint(stage=fn, dim=dim, lb=(0.0,) * dim,
                           ub=(float("inf"),) * dim)


def stage_interval(fn: Callable, dim: int, lb, ub) -> StageConstraint:
    lb = tuple(float(v) for v in np.broadcast_to(np.asarray(lb, float), (dim,)))
    ub = tuple(float(v) for v in np.broadcast_to(np.asarray(ub, float), (dim,)))
    return StageConstraint(stage=fn, dim=dim, lb=lb, ub=ub)


def equality_constraint(fn: Callable, dim: int) -> PathConstraint:
    """g(x, u, p, tvp) = 0 (reference ``EqualityConstraint``,
    ``constraints.py:66-81``)."""
    return PathConstraint(fn=fn, dim=dim, lb=(0.0,) * dim, ub=(0.0,) * dim)


def inequality_constraint(fn: Callable, dim: int) -> PathConstraint:
    """g(x, u, p, tvp) >= 0 (reference ``InequalityConstraint``,
    ``constraints.py:83-97``)."""
    return PathConstraint(fn=fn, dim=dim, lb=(0.0,) * dim,
                          ub=(float("inf"),) * dim)


def interval_constraint(fn: Callable, dim: int, lb, ub) -> PathConstraint:
    lb = tuple(float(v) for v in np.broadcast_to(np.asarray(lb, float), (dim,)))
    ub = tuple(float(v) for v in np.broadcast_to(np.asarray(ub, float), (dim,)))
    return PathConstraint(fn=fn, dim=dim, lb=lb, ub=ub)


def expand_constraint(pc, H: int):
    """Normalise a Path/Stage constraint to trajectory-level rows.

    Returns ``(traj_fn, n_rows, row_types, lb, ub)`` where
    ``traj_fn(X, U, p, tvp) -> (n_rows,)`` and the bound/type arrays have
    length ``n_rows`` (a StageConstraint's per-stage rows tile ×H in
    stage-major order: rows [t·dim, (t+1)·dim) belong to stage t)."""
    if isinstance(pc, StageConstraint):
        def traj_fn(X, U, p, tvp, _pc=pc):
            return _pc(X, U, p, tvp).reshape(-1)
        return (traj_fn, H * pc.dim, np.tile(pc.row_types(), H),
                np.tile(np.asarray(pc.lb, np.float64), H),
                np.tile(np.asarray(pc.ub, np.float64), H))
    def traj_fn(X, U, p, tvp, _pc=pc):
        from ..models.base import _call_user_fn
        return _call_user_fn(_pc.fn, X, U, p, tvp).reshape(-1)
    return (traj_fn, pc.dim, pc.row_types(),
            np.asarray(pc.lb, np.float64), np.asarray(pc.ub, np.float64))


@dataclasses.dataclass(frozen=True)
class StageCost:
    """A stage-separable economic cost: J = Σ_t ℓ(x_{t+1}, u_t, p, tvp_t)
    (+ optional terminal φ(x_H, p)).

    Declaring stage structure is what unlocks the O(H) block-tridiagonal
    Riccati KKT backend (:mod:`pyneuralempc_tpu.solve.riccati`) — the dense
    backend treats the cost as an opaque scalar and pays O(H³).  Both
    reference example costs are stage-separable (``run.py:82-89``,
    ``test.py``'s Σ(u−2)²).

    ``stage(x, u, p, tvp) -> scalar`` takes *single-stage* vectors
    ``x: (x_dim,)``, ``u: (u_dim,)``, ``tvp: (tvp_dim,)|None``.
    Instances are callable with full trajectories (batched-over-time
    reference contract), so they drop into any objective slot.
    """

    stage: Callable
    terminal: Optional[Callable] = None

    def __call__(self, x, u, p=None, tvp=None):
        import jax

        def one(x_t, u_t, tvp_t):
            from ..models.base import _call_user_fn
            return _call_user_fn(self.stage, x_t, u_t, p, tvp_t)

        tvp_axis = None if tvp is None else 0
        total = jnp.sum(jax.vmap(one, in_axes=(0, 0, tvp_axis))(x, u, tvp))
        if self.terminal is not None:
            term = (self.terminal(x[-1], p) if p is not None
                    else self.terminal(x[-1]))
            total = total + term
        return total


@dataclasses.dataclass(frozen=True)
class MPCSpec:
    """The full static problem description.

    Equivalent information to the reference ``NMPC.__init__`` arguments
    (``controller.py:7-22``): model+integrator, objective, constraints,
    horizon and step size — but immutable and hashable so jitted solvers can
    specialise on it.
    """

    model: Any                       # DynamicsModel (hashable dataclass)
    integrator: str                  # "delta" | "euler" | "rk4" | "direct"
    objective: Callable              # J(x:(H,nx), u:(H,nu), p, tvp) -> scalar
    box: Box
    path_constraints: Tuple[PathConstraint, ...]
    H: int
    DT: float

    def __post_init__(self):
        from ..ops.integrators import INTEGRATORS
        if self.integrator not in INTEGRATORS:
            raise ValueError(
                f"unknown integrator {self.integrator!r}; "
                f"available: {sorted(INTEGRATORS)}")
        if self.H < 1:
            raise ValueError("horizon H must be >= 1")

    @property
    def dims(self) -> Dims:
        return self.model.dims

    @property
    def n_primal(self) -> int:
        """Number of X/U decision variables: H * (x_dim + u_dim), the
        reference decision-vector size (``optimizer/ipopt.py:20-28``)."""
        return self.H * self.dims.stage

    @property
    def n_slack(self) -> int:
        return sum(int((expand_constraint(pc, self.H)[2] != EQ_TYPE).sum())
                   for pc in self.path_constraints)

    @property
    def n_defect(self) -> int:
        return self.H * self.dims.x
