"""Transcription: MPCSpec -> flat NLP functions.

Produces the standard interior-point form

    min_w  J(w)    s.t.  C(w) = 0,   lb <= w <= ub

with decision vector ``w = [vec(X) | vec(U) | s]`` — states first, controls
second, matching the reference NLP layout
(``/root/reference/pyNeuralEMPC/optimizer/ipopt.py:20-28``) — plus slack
variables ``s`` for the non-equality rows of user path constraints (the
reference instead splits EQ/INEQ/interval per backend,
``optimizer/slsqp.py:54-110``; slack lifting gives one uniform equality-only
form that vmaps).

Equality rows of ``C``:
  1. H·x_dim multiple-shooting defects (``optimizer/ipopt.py:44-52``);
  2. for each path constraint: EQ rows as ``g(w) - lb`` and the remaining
     rows as ``g(w) - s`` with ``s`` box-bounded by (lb, ub).

Everything returned is a pure function of ``(w, rt)`` where ``rt`` is the
:class:`~pyneuralempc_tpu.core.problem.RuntimeData` pytree — so one
``vmap``/``pjit`` wraps an entire batch of problems.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax.numpy as jnp
import numpy as np

from .problem import EQ_TYPE, MPCSpec
from .problem import expand_constraint as _expand
from ..models.base import _call_user_fn
from ..ops.integrators import step_fn
from ..ops.rollout import defects as _defects


@dataclasses.dataclass(frozen=True)
class NLP:
    """Flat NLP callables for one MPCSpec (all static metadata hashable)."""

    spec: MPCSpec
    n: int                 # total decision variables (primal + slack)
    m: int                 # total equality constraints
    objective: Callable    # (w, rt) -> scalar
    constraints: Callable  # (w, rt) -> (m,)
    lower: Any             # (n,) bound vectors (float32, ±inf allowed)
    upper: Any
    pack: Callable         # (X, U, s) -> w
    unpack: Callable       # w -> (X, U, s)
    init_slacks: Callable = None   # (X, U, rt) -> (n_slack,) g values
    shift_slacks: Callable = None  # (s,) -> (n_slack,) receding shift

    def lagrangian(self, w, lam, rt):
        """L(w, λ) = J(w) + λᵀC(w): its ∇²_w is the exact Hessian the
        reference assembles by hand (``optimizer/ipopt.py:66-86``)."""
        return self.objective(w, rt) + jnp.dot(lam, self.constraints(w, rt))


def transcribe(spec: MPCSpec, dtype=jnp.float32) -> NLP:
    H, dims = spec.H, spec.dims
    nx, nu = dims.x, dims.u
    n_primal = spec.n_primal

    phi = step_fn(spec.model, spec.integrator, spec.DT)

    # ---- static slack bookkeeping (numpy, build time) ----
    pc_specs = []       # (traj_fn, eq_mask: (n_rows,), slack_offset)
    slack_lb, slack_ub = [], []
    n_slack = 0
    n_pc_rows = 0
    for pc in spec.path_constraints:
        traj_fn, n_rows, types, lb, ub = _expand(pc, H)
        eq_mask = types == EQ_TYPE
        pc_specs.append((traj_fn, eq_mask, n_slack, lb))
        slack_lb.append(lb[~eq_mask])
        slack_ub.append(ub[~eq_mask])
        n_slack += int((~eq_mask).sum())
        n_pc_rows += n_rows

    n = n_primal + n_slack
    m = spec.n_defect + n_pc_rows

    box_lb, box_ub = spec.box.tile(H, dtype)
    if n_slack:
        lower = jnp.concatenate([box_lb, jnp.asarray(np.concatenate(slack_lb), dtype)])
        upper = jnp.concatenate([box_ub, jnp.asarray(np.concatenate(slack_ub), dtype)])
    else:
        lower, upper = box_lb, box_ub

    def unpack(w):
        X = w[: H * nx].reshape(H, nx)
        U = w[H * nx: n_primal].reshape(H, nu)
        s = w[n_primal:]
        return X, U, s

    def pack(X, U, s=None):
        parts = [X.reshape(-1), U.reshape(-1)]
        if n_slack:
            parts.append(jnp.zeros((n_slack,), dtype) if s is None else s)
        return jnp.concatenate(parts)

    def objective(w, rt):
        X, U, _ = unpack(w)
        return _call_user_fn(spec.objective, X, U, rt["p"], rt["tvp"])

    # static per-pc data as jnp constants
    pc_const = []
    for traj_fn, eq_mask, off, lb in pc_specs:
        pc_const.append((
            traj_fn, jnp.asarray(eq_mask),
            jnp.asarray(np.where(eq_mask, lb, 0.0), dtype),
            np.asarray(eq_mask),
            off,
        ))

    def constraints(w, rt):
        X, U, s = unpack(w)
        rows = [_defects(phi, X, U, rt["x0"], rt["p"], rt["tvp"],
                         rt.get("params")).reshape(-1)]
        for traj_fn, eq_mask_j, eq_lb_j, eq_mask_np, off in pc_const:
            g = traj_fn(X, U, rt["p"], rt["tvp"])
            if bool(eq_mask_np.all()):
                rows.append(g - eq_lb_j)
            else:
                n_sl = int((~eq_mask_np).sum())
                s_j = s[off: off + n_sl]
                # scatter slacks into the non-EQ row positions
                full_s = jnp.zeros_like(g).at[jnp.asarray(np.nonzero(~eq_mask_np)[0])].set(s_j)
                rows.append(g - jnp.where(eq_mask_j, eq_lb_j, full_s))
        return jnp.concatenate(rows).astype(dtype)

    # Slack initialisation (Ipopt's rule: start slacks at the constraint
    # value, pushed interior by the solver's κ₁ rule later) — a zero init
    # would charge the solver a large artificial path residual g(w0) - 0.
    sl_lb = lower[n_primal:]
    sl_ub = upper[n_primal:]

    def init_slacks(X, U, rt):
        if not n_slack:
            return jnp.zeros((0,), dtype)
        parts = []
        for traj_fn, eq_mask, off, lb_ in pc_specs:
            g = traj_fn(X, U, rt["p"], rt["tvp"])
            parts.append(g[jnp.asarray(np.nonzero(~eq_mask)[0])])
        s = jnp.concatenate(parts).astype(dtype)
        return jnp.clip(jnp.nan_to_num(s), sl_lb, sl_ub)

    # Receding-horizon shift of stage-wise slacks (rows of a
    # StageConstraint are stage-major): shift one stage left, duplicate the
    # last.  Trajectory-level constraint slacks have no stage structure and
    # carry over as-is.
    shift_meta = []   # (off, n_sl, r_per_stage or None)
    off_ = 0
    for pc, (traj_fn, eq_mask, off, lb_) in zip(spec.path_constraints,
                                                pc_specs):
        n_sl = int((~eq_mask).sum())
        from .problem import StageConstraint as _SC
        r_stage = n_sl // H if (isinstance(pc, _SC) and n_sl % H == 0) \
            else None
        shift_meta.append((off, n_sl, r_stage))

    def shift_slacks(s):
        if not n_slack:
            return s
        parts = []
        for off, n_sl, r_stage in shift_meta:
            s_i = s[off: off + n_sl]
            if r_stage:
                s_t = s_i.reshape(H, r_stage)
                s_t = jnp.concatenate([s_t[1:], s_t[-1:]], axis=0)
                s_i = s_t.reshape(-1)
            parts.append(s_i)
        return jnp.concatenate(parts)

    return NLP(spec=spec, n=n, m=m, objective=objective,
               constraints=constraints, lower=lower, upper=upper,
               pack=pack, unpack=unpack, init_slacks=init_slacks,
               shift_slacks=shift_slacks)
