"""Transcription layer: packing, bounds tiling, slack lifting."""

import jax.numpy as jnp
import numpy as np
import pytest

import pyneuralempc_tpu as nempc
from pyneuralempc_tpu.core.problem import (EQ_TYPE, INEQ_TYPE, INTER_TYPE,
                                           Box, MPCSpec)
from pyneuralempc_tpu.core.transcription import transcribe


def f(x, u):
    return 0.5 * x + u


@pytest.fixture
def model():
    return nempc.jax_dynamics(f, x_dim=1, u_dim=1)


def make_spec(model, path=(), box=None, H=4):
    return MPCSpec(model=model, integrator="delta",
                   objective=lambda x, u: jnp.sum(u ** 2),
                   box=box or Box.unbounded(1, 1),
                   path_constraints=tuple(path), H=H, DT=0.1)


def test_pack_unpack_roundtrip(model):
    nlp = transcribe(make_spec(model))
    X = jnp.arange(4.0).reshape(4, 1)
    U = jnp.arange(10.0, 14.0).reshape(4, 1)
    w = nlp.pack(X, U)
    X2, U2, s = nlp.unpack(w)
    np.testing.assert_allclose(X2, X)
    np.testing.assert_allclose(U2, U)
    assert s.shape == (0,)
    assert nlp.n == 8 and nlp.m == 4


def test_bounds_tiling_reference_layout(model):
    """Bounds tile per-timestep in [x·H | u·H] order (constraints.py:26-30)."""
    box = nempc.DomainConstraint(states_constraint=[[-1.0, 2.0]],
                                 control_constraint=[[-3.0, 4.0]])
    nlp = transcribe(make_spec(model, box=box))
    np.testing.assert_allclose(nlp.lower, [-1] * 4 + [-3] * 4)
    np.testing.assert_allclose(nlp.upper, [2] * 4 + [4] * 4)


def test_constraint_classification():
    eq = nempc.equality_constraint(lambda x, u: x.reshape(-1), 4)
    ineq = nempc.inequality_constraint(lambda x, u: x.reshape(-1), 4)
    inter = nempc.interval_constraint(lambda x, u: x.reshape(-1), 4, -1.0, 1.0)
    assert eq.get_type() == EQ_TYPE
    assert ineq.get_type() == INEQ_TYPE
    assert inter.get_type() == INTER_TYPE


def test_slack_lifting(model):
    H = 4
    ineq = nempc.inequality_constraint(
        lambda x, u: (x + u).reshape(-1), H)           # g >= 0, slack per row
    eq = nempc.equality_constraint(
        lambda x, u: (x - u).reshape(-1)[:2], 2)       # no slack
    nlp = transcribe(make_spec(model, path=[ineq, eq]))
    assert nlp.n == 2 * H + H          # primal + H slacks
    assert nlp.m == H + H + 2          # defects + ineq rows + eq rows
    # slack bounds [0, inf)
    np.testing.assert_allclose(nlp.lower[2 * H:], 0.0)
    assert np.all(np.isinf(np.asarray(nlp.upper[2 * H:])))


def test_constraints_values(model):
    """Defect rows equal Φ(x_prev, u) − x with x0 stitched in front."""
    H = 3
    nlp = transcribe(make_spec(model, H=H))
    X = jnp.array([[1.0], [2.0], [3.0]])
    U = jnp.array([[0.1], [0.2], [0.3]])
    x0 = jnp.array([0.5])
    rt = nempc.runtime(x0)
    w = nlp.pack(X, U)
    c = nlp.constraints(w, rt)
    xprev = jnp.array([[0.5], [1.0], [2.0]])
    expected = (xprev + 0.5 * xprev + U) - X
    np.testing.assert_allclose(np.asarray(c),
                               np.asarray(expected).ravel(), rtol=1e-6)


def test_objective_passthrough(model):
    nlp = transcribe(make_spec(model))
    X = jnp.zeros((4, 1))
    U = 2.0 * jnp.ones((4, 1))
    w = nlp.pack(X, U)
    assert float(nlp.objective(w, nempc.runtime(jnp.zeros(1)))) == 16.0


def test_bad_integrator_rejected(model):
    with pytest.raises(ValueError):
        MPCSpec(model=model, integrator="nope",
                objective=lambda x, u: 0.0, box=Box.unbounded(1, 1),
                path_constraints=(), H=4, DT=0.1)


def test_interval_path_constraint_slack_bounds(model):
    H = 4
    inter = nempc.interval_constraint(
        lambda x, u: u.reshape(-1), H, -0.5, 0.75)
    nlp = transcribe(make_spec(model, path=[inter]))
    np.testing.assert_allclose(nlp.lower[2 * H:], -0.5)
    np.testing.assert_allclose(nlp.upper[2 * H:], 0.75)


def test_multiple_slacked_constraints_offsets(model):
    """Two slacked constraints + an EQ: slack offsets and row order."""
    H = 3
    ineq = nempc.inequality_constraint(lambda x, u: x.reshape(-1), H)
    inter = nempc.interval_constraint(lambda x, u: u.reshape(-1), H,
                                      -0.25, 0.5)
    eq = nempc.equality_constraint(lambda x, u: (x - u).reshape(-1)[:1], 1)
    nlp = transcribe(make_spec(model, path=[ineq, inter, eq], H=H))
    assert nlp.n == 2 * H + H + H          # primal + 2 slack groups
    assert nlp.m == H + H + H + 1          # defects + rows of each pc
    # slack bound layout: [ineq slacks (0, inf) | interval slacks]
    np.testing.assert_allclose(nlp.lower[2 * H: 3 * H], 0.0)
    np.testing.assert_allclose(nlp.lower[3 * H:], -0.25)
    np.testing.assert_allclose(nlp.upper[3 * H:], 0.5)
    # residual wiring: g - s must appear in the right rows
    X = jnp.arange(1.0, 4.0).reshape(H, 1)
    U = 0.1 * jnp.ones((H, 1))
    s = jnp.concatenate([10.0 * jnp.ones(H), 20.0 * jnp.ones(H)])
    w = nlp.pack(X, U, s)
    c = np.asarray(nlp.constraints(w, nempc.runtime(jnp.zeros(1))))
    np.testing.assert_allclose(c[H: 2 * H],
                               np.asarray(X).ravel() - 10.0, rtol=1e-6)
    np.testing.assert_allclose(c[2 * H: 3 * H],
                               np.asarray(U).ravel() - 20.0, rtol=1e-6)
    np.testing.assert_allclose(c[3 * H], float(X[0, 0] - U[0, 0]), rtol=1e-6)


def test_mixed_eq_ineq_rows_in_one_constraint(model):
    """A single PathConstraint with mixed EQ and slack rows."""
    H = 2
    pc = nempc.PathConstraint(
        fn=lambda x, u: jnp.concatenate([x[:1, 0], u[:, 0]]),
        dim=3, lb=(1.5, 0.0, 0.0), ub=(1.5, float("inf"), float("inf")))
    nlp = transcribe(make_spec(model, path=[pc], H=H))
    assert nlp.n == 2 * H + 2              # two non-EQ rows get slacks
    X = jnp.array([[1.5], [0.0]])
    U = jnp.array([[0.3], [0.4]])
    s = jnp.array([0.3, 0.4])
    w = nlp.pack(X, U, s)
    c = np.asarray(nlp.constraints(w, nempc.runtime(jnp.zeros(1))))
    # EQ row: g - lb = 0; slack rows: g - s = 0
    np.testing.assert_allclose(c[2 * H:], 0.0, atol=1e-6)
