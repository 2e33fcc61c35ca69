"""Model layer: wrappers, MLP, safe-mode checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyneuralempc_tpu as nempc
from pyneuralempc_tpu.models.mlp import MLPDynamics, mlp_apply, mlp_init


def test_jax_dynamics_dims():
    m = nempc.jax_dynamics(lambda x, u: x + u, x_dim=3, u_dim=3)
    assert m.x_dim == 3 and m.u_dim == 3 and m.p_dim == 0 and m.tvp_dim == 0
    out = m(jnp.ones((5, 3)), jnp.ones((5, 3)))
    assert out.shape == (5, 3)


def test_safe_mode_shape_check():
    """safe_mode probes shape + differentiability (model/jax.py:22-30)."""
    with pytest.raises(ValueError):
        nempc.jax_dynamics(lambda x, u: jnp.zeros((1, 7)), x_dim=2, u_dim=1,
                           safe_mode=True)


def test_safe_mode_nondifferentiable():
    bad = lambda x, u: jnp.sqrt(x)  # d/dx sqrt at 0 = inf
    with pytest.raises(ValueError):
        nempc.jax_dynamics(bad, x_dim=2, u_dim=1, safe_mode=True)


def test_mlp_shapes_and_grad():
    model = MLPDynamics.make(x_dim=2, u_dim=1, hidden=[16, 16])
    params = model.init_params(jax.random.PRNGKey(0))
    assert model.layer_sizes == (3, 16, 16, 2)
    x = jnp.ones((5, 2))
    u = jnp.ones((5, 1))
    out = model(x, u, params=params)
    assert out.shape == (5, 2)
    g = jax.grad(lambda xx: jnp.sum(model(xx, u, params=params)))(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_mlp_tvp_p_features():
    model = MLPDynamics.make(x_dim=2, u_dim=1, hidden=[8], p_dim=2, tvp_dim=1)
    params = model.init_params(jax.random.PRNGKey(1))
    assert model.layer_sizes == (6, 8, 2)
    out = model(jnp.ones((4, 2)), jnp.ones((4, 1)), p=jnp.ones(2),
                tvp=jnp.ones((4, 1)), params=params)
    assert out.shape == (4, 2)


def test_mlp_bf16_compute_close_to_f32():
    m32 = MLPDynamics.make(x_dim=2, u_dim=1, hidden=[32])
    m16 = MLPDynamics.make(x_dim=2, u_dim=1, hidden=[32],
                           compute_dtype=jnp.bfloat16)
    params = m32.init_params(jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (6, 2))
    u = jax.random.normal(jax.random.PRNGKey(4), (6, 1))
    np.testing.assert_allclose(np.asarray(m16(x, u, params=params)),
                               np.asarray(m32(x, u, params=params)),
                               atol=0.05)


def test_mlp_surrogate_can_fit_linear_map():
    """Train a tiny MLP on a linear system and use it as MPC dynamics —
    the neural-surrogate workflow of the reference example (SURVEY §3.4)."""
    A = jnp.array([[0.9, 0.1], [0.0, 0.8]])
    B = jnp.array([[0.0], [0.5]])
    tgt = lambda x, u: x @ A.T + u @ B.T - x   # delta form

    model = MLPDynamics.make(x_dim=2, u_dim=1, hidden=[32])
    params = model.init_params(jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(5)
    X = jax.random.normal(key, (512, 2))
    U = jax.random.normal(jax.random.PRNGKey(6), (512, 1))
    Y = tgt(X, U)

    def loss(p):
        return jnp.mean((model(X, U, params=p) - Y) ** 2)

    import optax
    opt = optax.adam(1e-2)
    state = opt.init(params)
    lval = None
    for _ in range(300):
        lval, g = jax.value_and_grad(loss)(params)
        upd, state = opt.update(g, state)
        params = jax.tree_util.tree_map(lambda a, b: a + b, params, upd)
    assert float(lval) < 1e-3


def test_fit_normalized_surrogate_beats_raw_on_multiscale():
    """Standardisation + angle features: on a multi-scale wrap-prone system
    the normalized fit must produce a model whose raw-unit predictions are
    accurate, where the plain fit's loss is dominated by the large outputs."""
    import jax
    from pyneuralempc_tpu.models.train import fit_normalized_surrogate

    # pendulum-ish: theta in x[0] (wraps), large-scale output channel
    def truth(x, u):
        return jnp.concatenate(
            [x[:, 1:2],
             30.0 * jnp.sin(x[:, 0:1]) + 5.0 * u], axis=1)

    def feats(x):
        return jnp.concatenate([jnp.sin(x[:, 0:1]), jnp.cos(x[:, 0:1]),
                                x[:, 1:2]], axis=1)

    model, params, rel_mse = fit_normalized_surrogate(
        truth, jax.random.PRNGKey(0), x_dim=2, u_dim=1, hidden=[32],
        n=4096, x_range=(-3.0, 3.0), u_range=(-1.0, 1.0), steps=1500,
        lr=3e-3, batch=1024, feature_map=feats, feature_dim=3)
    assert rel_mse < 1e-3                     # vs 1.0 = predicting the mean
    X = jnp.asarray(np.random.default_rng(0).uniform(-3, 3, (64, 2)),
                    jnp.float32)
    U = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (64, 1)),
                    jnp.float32)
    err = jnp.max(jnp.abs(model(X, U, params=params) - truth(X, U)))
    assert float(err) < 1.0                   # raw units (outputs ~±35)
