"""Globalization machinery: second-order correction + noise-floor f-type.

The reference delegates globalization to Ipopt's filter line search
(``/root/reference/pyNeuralEMPC/optimizer/ipopt.py``, native side); here the
solver owns it: an exact-penalty Armijo backtracking search with (a) an
Ipopt-style second-order correction retrying rejected full steps with a
curvature-corrected constraint rhs, and (b) an f-type rule that stops the
ν‖C‖₁ merit term from gating steps when θ sits at its f32 noise floor.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import pytest

import pyneuralempc_tpu as nempc
from pyneuralempc_tpu.solve.riccati import make_riccati_direction


def quad_like_mpc(soc=True, max_iter=80):
    """12-state quadrotor-style problem whose cold solves exhibit the
    Maratos crawl (tiny accepted α with θ growth) without SOC."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from quadrotor import quad_f

    model = nempc.jax_dynamics(quad_f(), x_dim=12, u_dim=4)
    cost = nempc.StageCost(
        stage=lambda x, u: (jnp.sum((x[:3] - jnp.array([1., 1., 1.5])) ** 2)
                            + 0.05 * jnp.sum(x[3:6] ** 2)
                            + 0.02 * jnp.sum(u ** 2)))
    box = nempc.DomainConstraint(
        states_constraint=[[-3, 3]] * 3 + [[-5, 5]] * 3
        + [[-1, 1]] * 3 + [[-6, 6]] * 3,
        control_constraint=[[0.0, 8.0]] * 4)
    return nempc.NMPC(model, cost, [box], H=50, DT=0.02, integrator="rk4",
                      config=nempc.IPConfig(max_iter=max_iter, soc=soc))


def test_resolve_hook_consistent():
    """direction() returns (dw, dlam, ok, resolve); resolve with the same
    rhs reproduces the same step, and with a modified c gives the same
    answer as a fresh direction call would (same blocks)."""
    def f(x, u):
        return jnp.concatenate([x[:, 1:], u - 0.3 * x[:, :1]], axis=1)

    model = nempc.jax_dynamics(f, x_dim=2, u_dim=1)
    cost = nempc.StageCost(stage=lambda x, u: jnp.sum(u ** 2)
                           + jnp.sum((x - 0.2) ** 2))
    box = nempc.DomainConstraint(states_constraint=[[-2., 2.]] * 2,
                                 control_constraint=[[-1., 1.]])
    mpc = nempc.NMPC(model, cost, [box], H=8, DT=0.1)
    nlp, cfg = mpc.nlp, mpc.config
    rt = nempc.runtime(jnp.array([0.3, -0.2]))
    carry = mpc.cold_start(jnp.array([0.3, -0.2]))
    w = jnp.clip(carry.w, nlp.lower + 0.05, nlp.upper - 0.05)
    lam = 0.05 * jnp.ones((nlp.m,))
    sl, su = w - nlp.lower, nlp.upper - w
    mu = 0.01
    Sigma = (mu / sl) / sl + (mu / su) / su
    g = jax.grad(nlp.objective)(w, rt)
    _, vjp = jax.vjp(lambda ww: nlp.constraints(ww, rt), w)
    r_tilde = g + vjp(lam)[0] - mu / sl + mu / su
    c = nlp.constraints(w, rt)

    direction = make_riccati_direction(nlp, cfg)

    def run(c_rhs):
        dw, dlam, ok, resolve = direction(w, lam, rt, Sigma, r_tilde, c)
        dw2, dlam2, ok2 = resolve(r_tilde, c_rhs)
        return dw, dlam, dw2, dlam2

    dw, dlam, dw_same, dlam_same = jax.jit(run)(c)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_same),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(dlam), np.asarray(dlam_same),
                               rtol=1e-6, atol=1e-6)

    # modified rhs through resolve == fresh direction call with that rhs
    c_mod = c + 0.01
    _, _, dw_mod, _ = jax.jit(run)(c_mod)
    dw_fresh = jax.jit(
        lambda: direction(w, lam, rt, Sigma, r_tilde, c_mod)[0])()
    np.testing.assert_allclose(np.asarray(dw_mod), np.asarray(dw_fresh),
                               rtol=1e-5, atol=1e-6)
    assert float(jnp.max(jnp.abs(dw_mod - dw))) > 1e-5  # rhs mattered


@pytest.mark.slow
def test_soc_rescues_curved_cold_start():
    """The quadrotor cold start that crawls without SOC converges with it
    (the member found stuck in round-1 diagnostics)."""
    x0 = np.zeros(12, np.float32)
    # member 3 of the diagnostic fleet (rng(0) draw)
    x0[:3] = np.random.default_rng(0).uniform(-1.5, 1.5, (64, 3))[3]
    res_soc = quad_like_mpc(soc=True).next(jnp.asarray(x0))
    res_no = quad_like_mpc(soc=False).next(jnp.asarray(x0))
    assert int(res_soc.iterations) <= int(res_no.iterations)
    assert bool(res_soc.converged) or (res_soc.kkt_error <= res_no.kkt_error)


def test_ftype_disabled_still_converges():
    """theta_noise_per_row=0 turns the f-type rule off; the solver must
    still converge on the standard workload (regression guard)."""
    def lv(x, u):
        return jnp.concatenate(
            [0.5 * x[:, :1] - 0.025 * x[:, :1] * x[:, 1:],
             -0.5 * x[:, 1:] + u + 0.005 * x[:, :1] * x[:, 1:]], axis=1)

    model = nempc.jax_dynamics(lv, x_dim=2, u_dim=1)
    box = nempc.DomainConstraint(states_constraint=[[0., 60.], [0., 40.]],
                                 control_constraint=[[0., 60.]])
    mpc = nempc.NMPC(model, lambda x, u: jnp.sum(1.1 * u), [box],
                     H=15, DT=0.1, integrator="rk4",
                     config=nempc.IPConfig(theta_noise_per_row=0.0))
    res = mpc.next(jnp.array([50.0, 5.0]))
    assert bool(res.converged)


def test_infeasibility_certificate():
    """x0 so far outside the box that no feasible x1 exists: the result
    must say feasible=False with a large theta — the local-infeasibility
    certificate (the reference's NMPC returned (None, None) on solver
    failure, controller.py:112-113)."""
    def lv(x, u):
        return jnp.concatenate(
            [0.5 * x[:, :1] - 0.025 * x[:, :1] * x[:, 1:],
             -0.5 * x[:, 1:] + u + 0.005 * x[:, :1] * x[:, 1:]], axis=1)

    model = nempc.jax_dynamics(lv, x_dim=2, u_dim=1)
    box = nempc.DomainConstraint(states_constraint=[[0., 60.], [0., 40.]],
                                 control_constraint=[[0., 60.]])
    mpc = nempc.NMPC(model, lambda x, u: jnp.sum(1.1 * u), [box],
                     H=25, DT=0.1, integrator="rk4")
    res = mpc.next(jnp.array([70.0, 45.0]))   # prey cannot re-enter <=60
    assert not bool(res.converged)
    assert not bool(res.feasible)
    assert float(res.theta) > 1.0

    # and a feasible solve reports feasible=True with tiny theta
    mpc.reset()
    res2 = mpc.next(jnp.array([50.0, 5.0]))
    assert bool(res2.converged) and bool(res2.feasible)
    assert float(res2.theta) <= mpc.config.tol


def test_mehrotra_strategy_converges():
    """mu_strategy='mehrotra' (affine predictor + corrected rhs through
    the resolve hook) solves the mild LV problem; opt-in — monotone stays
    the robust default (measured: better warm mean, fatter tails)."""
    def lv(x, u):
        return jnp.concatenate(
            [0.5 * x[:, :1] - 0.025 * x[:, :1] * x[:, 1:],
             -0.5 * x[:, 1:] + u + 0.005 * x[:, :1] * x[:, 1:]], axis=1)

    model = nempc.jax_dynamics(lv, x_dim=2, u_dim=1)
    box = nempc.DomainConstraint(states_constraint=[[0., 60.], [0., 40.]],
                                 control_constraint=[[0., 60.]])
    mpc = nempc.NMPC(model, lambda x, u: jnp.sum(1.1 * u), [box],
                     H=15, DT=0.1, integrator="rk4",
                     config=nempc.IPConfig(mu_strategy="mehrotra"))
    res = mpc.next(jnp.array([50.0, 5.0]))
    assert bool(res.converged)

    with pytest.raises(ValueError):
        nempc.IPConfig(mu_strategy="bogus")


def test_adaptive_strategy_converges_and_matches_monotone():
    """mu_strategy='adaptive' (LOQO centrality rule) must solve the LV
    problem to the same optimum as monotone — same controls within
    tolerance, not just a converged flag — and keep its no-extra-KKT-solve
    promise of competitive iteration counts on warm-ish problems."""
    def lv(x, u):
        return jnp.concatenate(
            [0.5 * x[:, :1] - 0.025 * x[:, :1] * x[:, 1:],
             -0.5 * x[:, 1:] + u + 0.005 * x[:, :1] * x[:, 1:]], axis=1)

    model = nempc.jax_dynamics(lv, x_dim=2, u_dim=1)
    box = nempc.DomainConstraint(states_constraint=[[0., 60.], [0., 40.]],
                                 control_constraint=[[0., 60.]])
    cost = lambda x, u: jnp.sum(1.1 * u)  # noqa: E731
    results = {}
    for strat in ("adaptive", "monotone"):
        # tol=1e-4 (the reference's acceptable_tol): this raw-unit problem
        # (states ~O(50)) has an f32 dual-residual floor ~2.6e-5
        mpc = nempc.NMPC(model, cost, [box], H=15, DT=0.1,
                         integrator="rk4",
                         config=nempc.IPConfig(mu_strategy=strat,
                                               tol=1e-4, max_iter=100))
        res = mpc.next(jnp.array([50.0, 5.0]))
        assert bool(res.converged), strat
        results[strat] = res
    np.testing.assert_allclose(np.asarray(results["adaptive"].u),
                               np.asarray(results["monotone"].u),
                               atol=1e-2)   # u scale is ~60 (raw units)
    # adaptive must not blow past monotone's iteration budget wildly
    assert int(results["adaptive"].iterations) <= \
        3 * int(results["monotone"].iterations) + 10


@pytest.mark.slow
def test_all_mu_strategies_on_batch():
    """All three μ strategies solve a small batch with per-problem masks."""
    def lv(x, u):
        return jnp.concatenate(
            [0.5 * x[:, :1] - 0.025 * x[:, :1] * x[:, 1:],
             -0.5 * x[:, 1:] + u + 0.005 * x[:, :1] * x[:, 1:]], axis=1)

    model = nempc.jax_dynamics(lv, x_dim=2, u_dim=1)
    box = nempc.DomainConstraint(states_constraint=[[0., 60.], [0., 40.]],
                                 control_constraint=[[0., 60.]])
    cost = lambda x, u: jnp.sum(1.1 * u)  # noqa: E731
    x0s = jnp.asarray([[50.0, 5.0], [40.0, 10.0], [55.0, 8.0]])
    for strat in ("monotone", "adaptive", "mehrotra"):
        mpc = nempc.NMPC(model, cost, [box], H=10, DT=0.1,
                         integrator="rk4",
                         config=nempc.IPConfig(mu_strategy=strat))
        carry, res = mpc.next_batch(x0s)
        assert bool(res.converged.all()), strat
