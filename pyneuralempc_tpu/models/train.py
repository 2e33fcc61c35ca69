"""Surrogate fitting: train an MLP dynamics model on a ground-truth system.

The reference ships a pre-trained Keras surrogate (``examples/
lotka_volterra/nn_model.h5``, a 3→30→30→2 tanh net — SURVEY §2 row 16) but
no training code.  Here the workflow is first-class: sample transitions from
any ground-truth step function, fit the MLP by Adam on one jitted update
loop (``lax.scan`` over steps — no Python training loop), and get back a
params pytree ready to thread through the solver.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .mlp import MLPDynamics


def sample_transitions(truth_fn: Callable, key, n: int, x_dim: int,
                       u_dim: int, x_range=(-1.0, 1.0), u_range=(-1.0, 1.0)):
    """Uniformly sample (x, u) and evaluate the ground-truth batched step
    function ``truth_fn(x, u) -> y``."""
    kx, ku = jax.random.split(key)
    X = jax.random.uniform(kx, (n, x_dim), minval=x_range[0],
                           maxval=x_range[1])
    U = jax.random.uniform(ku, (n, u_dim), minval=u_range[0],
                           maxval=u_range[1])
    return X, U, truth_fn(X, U)


def fit_surrogate(model: MLPDynamics, X, U, Y, steps: int = 2000,
                  lr: float = 1e-3, batch: Optional[int] = None,
                  key=None) -> Tuple[any, float]:
    """Fit ``model`` params to (X, U) -> Y by Adam; returns (params, mse).

    The whole optimisation is one compiled ``lax.scan`` — thousands of steps
    run on-device without host round trips.
    """
    import optax

    key = jax.random.PRNGKey(0) if key is None else key
    params = model.init_params(key)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    n = X.shape[0]
    batch = n if batch is None else min(batch, n)

    def loss_fn(p, xb, ub, yb):
        return jnp.mean((model(xb, ub, params=p) - yb) ** 2)

    def step(carry, k):
        p, s = carry
        idx = jax.random.randint(k, (batch,), 0, n)
        l, g = jax.value_and_grad(loss_fn)(p, X[idx], U[idx], Y[idx])
        upd, s = opt.update(g, s)
        p = optax.apply_updates(p, upd)
        return (p, s), l

    keys = jax.random.split(jax.random.PRNGKey(1), steps)
    (params, _), losses = jax.lax.scan(step, (params, opt_state), keys)
    return params, float(losses[-1])
