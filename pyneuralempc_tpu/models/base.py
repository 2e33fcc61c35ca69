"""Dynamics model contract.

The reference contract (``/root/reference/pyNeuralEMPC/model/base.py:3-18``,
``model/jax.py:45-49``) is a *batched-over-time* step function

    f(x: (T, x_dim), u: (T, u_dim), p: (p_dim,)|None, tvp: (T, tvp_dim)|None)
        -> (T, x_dim)

whose output is interpreted by the integrator as a state delta, a state
derivative, or the next state.  We keep exactly that signature — it maps
directly onto ``vmap`` over the horizon and keeps the MXU fed with one large
batched call instead of H small ones — and add an explicit ``params`` pytree
so NN weights are traced data (vmappable / shardable), never Python state.

Unlike the reference there are no ``.jacobian()`` / ``.hessian()`` methods:
derivatives are always taken by JAX autodiff on the *rollout*, at solve time,
inside one jit.  The hand-assembled dense derivative plumbing of
``model/jax.py:52-88`` and ``model/tensorflow.py:53-109`` has no equivalent
here by design.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..core.problem import Dims


@dataclasses.dataclass(frozen=True)
class DynamicsModel:
    """A dynamics model: dims metadata + a pure step function.

    ``fn(x, u, p, tvp, params) -> (T, x_dim)``; ``p``/``tvp``/``params`` may
    be None when the corresponding dim is zero / the model is parameter-free.
    """

    fn: Callable
    dims: Dims
    name: str = "dynamics"

    # Convenience accessors mirroring the reference attribute names
    # (``model/base.py:5-9``) so migration is mechanical.
    @property
    def x_dim(self) -> int:
        return self.dims.x

    @property
    def u_dim(self) -> int:
        return self.dims.u

    @property
    def p_dim(self) -> int:
        return self.dims.p

    @property
    def tvp_dim(self) -> int:
        return self.dims.tvp

    def __call__(self, x, u, p=None, tvp=None, params=None):
        return self.fn(x, u, p, tvp, params)

    def init_params(self, key) -> Any:
        """Models with learnable parameters override this."""
        return None


def jax_dynamics(fn: Callable, x_dim: int, u_dim: int, p_dim: int = 0,
                 tvp_dim: int = 0, safe_mode: bool = False,
                 name: str = "jax_fn") -> DynamicsModel:
    """Wrap a user JAX function ``f(x, u, p=None, tvp=None) -> (T, x_dim)``.

    Equivalent of ``DiffDiscretJaxModel`` (``model/jax.py:16-49``) with
    ``vector_mode=True`` semantics (the only mode the reference example
    uses).  ``safe_mode`` reproduces the differentiability pre-check of
    ``model/jax.py:22-30``: probe ``jax.jacrev`` at zeros and fail fast if
    the function is not differentiable or returns the wrong shape.
    """

    def wrapped(x, u, p, tvp, params):
        del params
        return _call_user_fn(fn, x, u, p, tvp)

    model = DynamicsModel(fn=wrapped, dims=Dims(x_dim, u_dim, p_dim, tvp_dim),
                          name=name)

    if safe_mode:
        T = 2
        x = jnp.zeros((T, x_dim))
        u = jnp.zeros((T, u_dim))
        p = jnp.zeros((p_dim,)) if p_dim else None
        tvp = jnp.zeros((T, tvp_dim)) if tvp_dim else None
        try:
            out = model(x, u, p, tvp)
        except Exception as e:  # pragma: no cover - error path
            raise ValueError(f"model function failed on zero probe: {e}")
        if out.shape != (T, x_dim):
            raise ValueError(
                f"model function returned shape {out.shape}, expected {(T, x_dim)}")
        jac = jax.jacrev(lambda xx: model(xx, u, p, tvp))(x)
        if not bool(jnp.all(jnp.isfinite(jac))):
            raise ValueError("model function is not differentiable at zeros "
                             "(non-finite jacobian)")
    return model


def _call_user_fn(fn, x, u, p, tvp):
    """Call a reference-style user function with only the args it needs."""
    if p is None and tvp is None:
        return fn(x, u)
    if tvp is None:
        return fn(x, u, p)
    return fn(x, u, p, tvp)
