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


def fit_normalized_surrogate(truth_fn: Callable, key, x_dim: int,
                             u_dim: int, hidden, n: int = 65536,
                             x_range=(-1.0, 1.0), u_range=(-1.0, 1.0),
                             steps: int = 8000, lr: float = 1e-3,
                             batch: int = 4096, feature_map=None,
                             feature_dim=None, activation: str = "tanh",
                             name: str = "mlp_norm"):
    """Train a surrogate with input/output standardisation (and optional
    feature engineering) — the difference between a usable model and a
    useless one on systems whose states span decades of scale.

    A raw MLP on e.g. quadrotor transitions fails outright (measured
    mse ≈ 1.1: accelerations ~±25 dominate the loss while rate errors
    drown, and ±8-scale inputs saturate tanh).  Standardising features and
    targets to unit scale (and encoding angles via ``feature_map``, e.g.
    θ → (sin θ, cos θ) so the net never sees a wrap) fixes both.

    ``feature_map(x: (T, x_dim)) -> (T, feature_dim)`` is optional (default
    identity).  Returns ``(model, params, rel_mse)`` where ``model`` is a
    :class:`~pyneuralempc_tpu.models.base.DynamicsModel` whose normalisation
    constants are baked in (params stay a plain layer list, so checkpoints
    and importers are unaffected) and ``rel_mse`` is the final normalised-
    target mse (1.0 = predicting the mean).
    """
    import optax

    from ..core.problem import Dims
    from .base import DynamicsModel
    from .mlp import mlp_apply, mlp_init

    kd, ki = jax.random.split(key)
    X, U, Y = sample_transitions(truth_fn, kd, n, x_dim, u_dim,
                                 x_range=x_range, u_range=u_range)
    fmap = (lambda x: x) if feature_map is None else feature_map
    fdim = x_dim if feature_dim is None else feature_dim
    F = fmap(X)
    f_mu, f_sd = jnp.mean(F, 0), jnp.std(F, 0) + 1e-6
    u_mu, u_sd = jnp.mean(U, 0), jnp.std(U, 0) + 1e-6
    y_mu, y_sd = jnp.mean(Y, 0), jnp.std(Y, 0) + 1e-6

    activations = tuple([activation] * len(hidden) + ["linear"])
    sizes = [fdim + u_dim] + list(hidden) + [x_dim]
    params = mlp_init(ki, sizes)

    Fn = (F - f_mu) / f_sd
    Un = (U - u_mu) / u_sd
    Yn = (Y - y_mu) / y_sd

    opt = optax.adam(lr)
    opt_state = opt.init(params)
    bsz = min(batch, n)

    def loss_fn(p, fb, ub, yb):
        pred = mlp_apply(p, jnp.concatenate([fb, ub], axis=-1),
                         activations)
        return jnp.mean((pred - yb) ** 2)

    def step_fn(carry, k):
        p, s = carry
        idx = jax.random.randint(k, (bsz,), 0, n)
        l, g = jax.value_and_grad(loss_fn)(p, Fn[idx], Un[idx], Yn[idx])
        upd, s = opt.update(g, s)
        return (optax.apply_updates(p, upd), s), l

    keys = jax.random.split(jax.random.PRNGKey(1), steps)
    (params, _), losses = jax.lax.scan(step_fn, (params, opt_state), keys)

    def fn(x, u, p, tvp, prm):
        del p, tvp
        fb = (fmap(x) - f_mu) / f_sd
        ub = (u - u_mu) / u_sd
        out = mlp_apply(prm, jnp.concatenate([fb, ub], axis=-1),
                        activations)
        return out * y_sd + y_mu

    model = DynamicsModel(fn=fn, dims=Dims(x_dim, u_dim), name=name)
    return model, params, float(losses[-1])
