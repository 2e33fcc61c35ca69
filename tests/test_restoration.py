"""Feasibility-restoration watchdog (interior_point.py cfg.watchdog).

The fixed-shape analog of Ipopt's restoration phase, which the reference
inherits via cyipopt (``optimizer/ipopt.py:162-189``): a member whose θ
stalls while infeasible switches its KKT rhs to the pure feasibility
problem and is judged on θ descent alone.
"""

import jax.numpy as jnp
import numpy as np

import pyneuralempc_tpu as nempc
from pyneuralempc_tpu.core.problem import StageCost
from pyneuralempc_tpu.solve.interior_point import IPConfig


def make_infeasible_mpc(watchdog=6, max_iter=40):
    """Unstable scalar plant with insufficient control authority: at the
    state upper bound, xdot = 3·0.5 − u_max = 0.5 > 0 — no trajectory
    from x0 = 0.45 can satisfy the dynamics inside the box.  The honest
    outcome is converged=False, feasible=False (the local-infeasibility
    certificate); the watchdog's job is to reach the best-θ point instead
    of burning the cap on merit zigzags."""
    f = lambda x, u: 3.0 * x + u  # noqa: E731
    model = nempc.jax_dynamics(f, x_dim=1, u_dim=1)
    cost = StageCost(stage=lambda x, u: jnp.sum(u ** 2)
                     + 0.1 * jnp.sum(x ** 2))
    box = nempc.DomainConstraint(states_constraint=[[-0.5, 0.5]],
                                 control_constraint=[[-1.0, 1.0]])
    return nempc.NMPC(model, cost, [box], H=20, DT=0.1, integrator="rk4",
                      config=IPConfig(max_iter=max_iter, watchdog=watchdog))


def solve_raw(mpc, x0):
    carry = mpc.cold_start(jnp.asarray(x0))
    rt = nempc.runtime(jnp.asarray(x0))
    return mpc._solve(rt, carry.w, carry.lam, None, None, carry.mu)


def test_infeasible_certificate_is_honest_and_finite():
    res = solve_raw(make_infeasible_mpc(), [0.45])
    assert not bool(res.converged)
    assert not bool(res.feasible)
    assert float(res.theta) > 1e-2
    # the NaN regression: a stalled infeasible member must never poison
    # kkt_error with NaN (jnp.minimum(nan, x) = nan)
    assert np.isfinite(float(res.kkt_error))


def test_watchdog_triggers_on_stall():
    res = solve_raw(make_infeasible_mpc(watchdog=6), [0.45])
    assert int(res.restorations) > 0          # the phase actually ran
    res0 = solve_raw(make_infeasible_mpc(watchdog=0), [0.45])
    assert int(res0.restorations) == 0        # and it is gateable
    # restoration must reach a theta at least as good
    assert float(res.theta) <= float(res0.theta) * 1.5


def test_watchdog_silent_on_easy_problems():
    """Feasible warm-startable problems must never enter restoration."""
    def lv_f(x, u):
        return jnp.concatenate(
            [0.5 * x[:, :1] - 0.025 * x[:, :1] * x[:, 1:],
             -0.5 * x[:, 1:] + u + 0.005 * x[:, :1] * x[:, 1:]], axis=1)
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = StageCost(stage=lambda x, u: 1.1 * jnp.sum(u))
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    mpc = nempc.NMPC(model, cost, [box], H=10, DT=0.1, integrator="rk4",
                     config=IPConfig(watchdog=6))
    res = solve_raw(mpc, [0.4, -0.5])
    assert bool(res.converged)
    assert int(res.restorations) == 0


def test_batched_mixed_feasible_infeasible():
    """One infeasible member must not poison a batch (SURVEY §5.3) and its
    restoration iterations must stay per-member."""
    import jax
    mpc = make_infeasible_mpc(watchdog=6)
    x0s = jnp.asarray([[0.45], [0.0], [-0.2]])  # only the first is doomed
    carry, res = mpc.next_batch(x0s)
    jax.block_until_ready(carry.w)
    conv = np.asarray(res.converged)
    assert not conv[0] and conv[1] and conv[2]


def test_merit_penalty_recovers_from_spike():
    """The merit penalty ν must decay back toward the live multiplier
    estimate.  Regression: a quadrotor cold start whose iteration-4 KKT
    step produced a garbage Δλ spiked ν 1.8e2→4.2e3; with monotone ν every
    later line search crawled at α~1e-2 on the ν·θ term and the member
    burned an 80-iteration cap (kkt stuck ~0.5).  With geometric ν decay
    the same start converges in ~25 iterations."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from quadrotor import F_HOVER, quad_f

    truth = nempc.jax_dynamics(quad_f(), x_dim=12, u_dim=4)
    cost = StageCost(
        stage=lambda x, u: (jnp.sum(x[:3] ** 2) + 0.1 * jnp.sum(x[3:6] ** 2)
                            + 0.5 * jnp.sum(x[6:8] ** 2) + 0.1 * x[8] ** 2
                            + 0.02 * jnp.sum(x[9:] ** 2)
                            + 0.05 * jnp.sum((u - F_HOVER) ** 2)),
        terminal=lambda x: 5.0 * (jnp.sum(x[:3] ** 2)
                                  + jnp.sum(x[3:6] ** 2)))
    box = nempc.DomainConstraint(
        states_constraint=[[-5.0, 5.0]] * 3 + [[-8.0, 8.0]] * 3
        + [[-0.8, 0.8]] * 2 + [[-np.pi, np.pi]] + [[-8.0, 8.0]] * 3,
        control_constraint=[[0.0, 3.0]] * 4)
    mpc = nempc.NMPC(truth, cost, [box], H=50, DT=0.02, integrator="rk4",
                     config=IPConfig(max_iter=45))
    # a fleet-draw member (np.random.default_rng(0), B=4096) that was one
    # of the nine 80-iteration-cap stragglers before the ν decay
    x0 = jnp.asarray([0.86707085, 0.72070843, -0.22383894, 0.09169942,
                      -0.05409374, 0.4972413, 0.04260347, 0.08484546,
                      0.0, 0.0, 0.0, 0.0])
    res = mpc.next(x0)
    assert bool(res.converged), (int(res.iterations),
                                 float(res.kkt_error))
    assert int(res.iterations) <= 45


def test_poisoned_warm_carry_recovers():
    """Warm-carry hygiene (round-3 255/256 trace): a NaN in a carried dual
    or iterate must NOT stick — jnp.clip propagates NaN through every
    safeguard, so before the init-scrub a poisoned member burned max_iter
    on every subsequent re-plan while a cold start from the same state
    converged in a handful of iterations.  init_state now scrubs carried
    fields to cold-start values."""
    import jax

    f = lambda x, u: -0.5 * x + u  # noqa: E731
    model = nempc.jax_dynamics(f, x_dim=1, u_dim=1)
    cost = StageCost(stage=lambda x, u: jnp.sum(x ** 2) + jnp.sum(u ** 2))
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]],
                                 control_constraint=[[-1.0, 1.0]])
    mpc = nempc.NMPC(model, cost, [box], H=10, DT=0.1, integrator="euler",
                     config=IPConfig(max_iter=30))
    x0s = jnp.asarray([[0.5], [-0.3]])
    carry, res = mpc.next_batch(x0s)
    assert int(res.converged.sum()) == 2
    # poison member 0's duals and iterate with NaN/inf
    zu = np.asarray(carry.zu).copy()
    zu[0, 3] = np.nan
    w = np.asarray(carry.w).copy()
    w[0, 1] = np.inf
    # no fallback: if the carry type ever stops being a NamedTuple this
    # must fail loudly rather than skip the NaN/inf injection (ADVICE r3)
    carry = carry._replace(zu=jnp.asarray(zu), w=jnp.asarray(w))
    carry2, res2 = mpc.next_batch(res.x[:, 0], carry=carry)
    assert int(res2.converged.sum()) == 2, "poisoned member did not recover"
    assert bool(jnp.all(jnp.isfinite(carry2.zu)))
    assert bool(jnp.all(jnp.isfinite(carry2.w)))


def test_exactly_active_bound_is_finite_and_unbiased():
    """An iterate landing EXACTLY on its bound (f32 fraction-to-boundary
    rounding) must neither NaN (the round-3 warm-carry poisoning: inf
    dual → 0·inf complementarity) nor be pushed off the active set by an
    interior projection margin — at bound scale 60 a representable margin
    is ≥ ~2 ulp ≈ 1e-5 and costs z·margin of KKT error forever, measured
    to stall large-scale members just above tol.  slacks() floors the
    divided/logged slacks instead; the iterate clips to the bound
    exactly."""
    import jax

    def lv(x, u):
        return jnp.concatenate(
            [0.5 * x[:, :1] - 0.025 * x[:, :1] * x[:, 1:],
             -0.5 * x[:, 1:] + u + 0.005 * x[:, :1] * x[:, 1:]], axis=1)

    model = nempc.jax_dynamics(lv, x_dim=2, u_dim=1)
    box = nempc.DomainConstraint(states_constraint=[[0., 60.], [0., 40.]],
                                 control_constraint=[[0., 60.]])
    cost = StageCost(stage=lambda x, u: jnp.sum(1.1 * u))
    # raw-coordinate problem: active u-bounds at lb=0, states O(50) — the
    # scale at which a projection margin measurably biases the KKT error
    mpc = nempc.NMPC(model, cost, [box], H=10, DT=0.1, integrator="rk4")
    x0s = jnp.asarray([[50.0, 5.0], [40.0, 10.0], [55.0, 8.0]])
    carry, res = mpc.next_batch(x0s)
    assert bool(res.converged.all()), np.asarray(res.kkt_error)
    # force a carry with iterates EXACTLY on their bounds: must stay
    # finite and re-converge, not poison the member
    w = np.asarray(carry.w).copy()
    w[0, -10:] = 0.0     # controls pinned exactly on lb
    carry = carry._replace(w=jnp.asarray(w))
    carry2, res2 = mpc.next_batch(res.x[:, 0], carry=carry)
    assert bool(res2.converged.all())
    for leaf in (carry2.w, carry2.zl, carry2.zu):
        assert bool(jnp.all(jnp.isfinite(leaf)))
