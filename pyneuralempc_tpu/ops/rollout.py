"""Rollouts and multiple-shooting defects.

Two distinct uses of the integrator:

* :func:`defects` — the NLP equality residuals ``c_t = Φ(x_{t-1}, u_t) - x_t``
  where every ``x_{t-1}`` comes from the decision vector (``x_0`` from the
  parameter).  This is *parallel across stages* — one batched model call —
  exactly the structure of the reference defect evaluation
  (``/root/reference/pyNeuralEMPC/integrator/discret.py:13-30`` with the
  ``concat([x0, x])[:-1]`` shift at ``discret.py:22``).

* :func:`simulate` — a sequential closed-loop rollout via ``lax.scan`` (used
  for warm-start initialisation and the examples' simulators).  The reference
  has no equivalent (its example drives a separate simulator package).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def shift_states(x0, X):
    """``x_prev[t] = x0 if t == 0 else X[t-1]`` — the reference's
    ``np.concatenate([x0, x])[:-1]`` (``integrator/discret.py:22``)."""
    return jnp.concatenate([x0[None, :], X[:-1]], axis=0)


def defects(phi: Callable, X, U, x0, p=None, tvp=None, params=None):
    """Multiple-shooting defect residuals, shape (H, x_dim).

    ``phi`` is a step transform from :mod:`..ops.integrators`.  Zero defects
    ⇔ the trajectory is dynamically consistent.
    """
    x_prev = shift_states(x0, X)
    return phi(x_prev, U, p, tvp, params) - X


def simulate(phi: Callable, x0, U, p=None, tvp=None, params=None):
    """Sequential rollout: apply Φ one step at a time over U, via lax.scan.

    Returns the state trajectory X with X[t] = x_{t+1}, shape (H, x_dim).
    Each scan step calls the batched-in-time model with T=1.
    """
    H = U.shape[0]

    def body(x, inputs):
        u_t, tvp_t = inputs
        x_next = phi(x[None, :], u_t[None, :], p,
                     None if tvp_t is None else tvp_t[None, :], params)[0]
        # pin the carry dtype: under x64, weak-typed DT/params constants
        # would otherwise promote the carry mid-scan and break lax.scan's
        # carry-type invariant
        x_next = x_next.astype(x.dtype)
        return x_next, x_next

    tvp_seq = tvp if tvp is not None else None
    xs = (U, tvp_seq) if tvp_seq is not None else (U, None)
    if tvp_seq is None:
        # scan needs matching pytree structure; use a dummy per-step None
        _, X = jax.lax.scan(lambda x, u: body(x, (u, None)), x0, U)
    else:
        _, X = jax.lax.scan(body, x0, (U, tvp_seq))
    return X
