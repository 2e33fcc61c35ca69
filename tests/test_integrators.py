"""Integrator + rollout checks against closed-form solutions.

Strategy (SURVEY §4): the reference has no tests; we validate integrators on
linear systems where the exact discrete map is computable (matrix
exponential), and defects against hand-computed residuals.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import expm

import pyneuralempc_tpu as nempc
from pyneuralempc_tpu.ops.integrators import step_fn
from pyneuralempc_tpu.ops.rollout import defects, shift_states, simulate

A = np.array([[0.0, 1.0], [-2.0, -0.5]])
B = np.array([[0.0], [1.0]])


def lin_f(x, u):
    return x @ A.T + u @ B.T


@pytest.fixture
def model():
    return nempc.jax_dynamics(lin_f, x_dim=2, u_dim=1)


def test_delta_step(model):
    phi = step_fn(model, "delta", 0.1)
    x = jnp.array([[1.0, 2.0]])
    u = jnp.array([[0.5]])
    expected = x + lin_f(x, u)
    np.testing.assert_allclose(phi(x, u), expected, rtol=1e-6)


def test_euler_step(model):
    phi = step_fn(model, "euler", 0.1)
    x = jnp.array([[1.0, 2.0]])
    u = jnp.array([[0.5]])
    expected = x + 0.1 * lin_f(x, u)
    np.testing.assert_allclose(phi(x, u), expected, rtol=1e-6)


def test_direct_step(model):
    phi = step_fn(model, "direct", 0.1)
    x = jnp.array([[1.0, 2.0]])
    u = jnp.array([[0.5]])
    np.testing.assert_allclose(phi(x, u), lin_f(x, u), rtol=1e-6)


def test_rk4_matches_matrix_exponential(model):
    """For ẋ = Ax (u=0), RK4 with step dt matches expm(A·dt) to O(dt⁵)."""
    dt = 0.05
    phi = step_fn(model, "rk4", dt)
    x = jnp.array([[1.0, -0.7]])
    u = jnp.zeros((1, 1))
    exact = x @ expm(A * dt).T
    np.testing.assert_allclose(np.asarray(phi(x, u)), np.asarray(exact),
                               rtol=1e-6, atol=1e-7)


def test_shift_states():
    x0 = jnp.array([9.0, 9.0])
    X = jnp.arange(6.0).reshape(3, 2)
    out = shift_states(x0, X)
    np.testing.assert_allclose(out[0], x0)
    np.testing.assert_allclose(out[1:], X[:-1])


def test_defects_zero_on_simulated_trajectory(model):
    """Defects vanish exactly on a sequentially-simulated trajectory."""
    dt = 0.1
    phi = step_fn(model, "rk4", dt)
    H = 7
    key = jax.random.PRNGKey(0)
    U = jax.random.normal(key, (H, 1))
    x0 = jnp.array([0.4, -0.2])
    X = simulate(phi, x0, U)
    d = defects(phi, X, U, x0)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_defects_nonzero_off_trajectory(model):
    phi = step_fn(model, "rk4", 0.1)
    H = 4
    X = jnp.ones((H, 2))
    U = jnp.zeros((H, 1))
    d = defects(phi, X, U, jnp.array([0.0, 0.0]))
    assert float(jnp.max(jnp.abs(d))) > 1e-3


def test_rk4_autodiff_jacobian_matches_fd(model):
    """Jacobian of the RK4 step via autodiff vs central finite differences —
    the reference's Ipopt derivative_test equivalent (SURVEY §4)."""
    dt = 0.1
    phi = step_fn(model, "rk4", dt)
    x = jnp.array([[0.3, -0.5]])
    u = jnp.array([[0.25]])

    jac_x = jax.jacobian(lambda xx: phi(xx, u))(x)[0, :, 0, :]
    eps = 1e-4
    fd = np.zeros((2, 2))
    for j in range(2):
        dx = np.zeros((1, 2))
        dx[0, j] = eps
        fd[:, j] = np.asarray(
            (phi(x + dx, u) - phi(x - dx, u)) / (2 * eps))[0]
    np.testing.assert_allclose(np.asarray(jac_x), fd, rtol=1e-3, atol=1e-4)


def test_tvp_and_p_threading():
    def f(x, u, p, tvp):
        return x * p[0] + u + tvp

    model = nempc.jax_dynamics(f, x_dim=1, u_dim=1, p_dim=1, tvp_dim=1)
    phi = step_fn(model, "delta", 0.1)
    x = jnp.ones((3, 1))
    u = jnp.zeros((3, 1))
    p = jnp.array([2.0])
    tvp = jnp.arange(3.0).reshape(3, 1)
    out = phi(x, u, p, tvp)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(x + x * 2.0 + tvp))
