"""Stage-equality rows and trajectory-level border constraints on the
O(H) Riccati KKT backend (VERDICT r2 item 2 / missing #1).

The reference routes arbitrary EQ/trajectory constraint rows through
Ipopt's sparse solver (``/root/reference/pyNeuralEMPC/optimizer/
ipopt.py:44-52,88-96``); here stage EQ rows ride the equality-constrained
stage QP inside the sweep and trajectory rows become a low-rank Schur
border — both at O(H) cost.  Every test cross-checks against the dense
full-space backend on the same problem.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyneuralempc_tpu as nempc
from pyneuralempc_tpu.core.problem import PathConstraint, StageConstraint
from pyneuralempc_tpu.solve.interior_point import IPConfig
from pyneuralempc_tpu.solve.riccati import eligible


def lv_f(x, u):
    return jnp.concatenate(
        [0.5 * x[:, :1] - 0.025 * x[:, :1] * x[:, 1:],
         -0.5 * x[:, 1:] + u + 0.005 * x[:, :1] * x[:, 1:]], axis=1)


MODEL = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
COST = nempc.StageCost(
    stage=lambda x, u: jnp.sum(u * 1.1) + 0.1 * jnp.sum(x ** 2))
BOX = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                             control_constraint=[[-1.0, 1.0]])
X0 = jnp.array([0.3, 0.2])


def solve_both(constraints, H=8, max_iter=80, x0=X0):
    out = {}
    for kkt in ("dense", "riccati"):
        mpc = nempc.NMPC(MODEL, COST, constraints, H=H, DT=0.1,
                         integrator="rk4",
                         config=IPConfig(tol=1e-6, max_iter=max_iter,
                                         kkt=kkt))
        out[kkt] = mpc.next(x0)
    return out["riccati"], out["dense"]


def feasible_terminal_x0(H=8):
    """A terminal prey value reachable by construction: simulate a
    constant-control rollout and read its endpoint."""
    from pyneuralempc_tpu.ops.integrators import step_fn
    from pyneuralempc_tpu.ops.rollout import simulate
    phi = step_fn(MODEL, "rk4", 0.1)
    U = jnp.full((H, 1), 0.4)
    X = simulate(phi, X0, U, None, None, None)
    return float(X[-1, 0])


def test_stage_eq_rows_ride_riccati():
    """A per-stage equality u_t = 0.2·x2_{t+1} + 0.1 — no slack, solved by
    the equality-constrained stage QP inside the sweep."""
    eqc = StageConstraint(stage=lambda x, u: u[0] - 0.2 * x[1],
                          dim=1, lb=(0.1,), ub=(0.1,))
    mpc = nempc.NMPC(MODEL, COST, [BOX, eqc], H=8, DT=0.1,
                     config=IPConfig(tol=1e-6, kkt="auto"))
    assert mpc.kkt_backend == "riccati"   # EQ rows no longer force dense
    rr, rd = solve_both([BOX, eqc])
    assert bool(rr.converged) and bool(rd.converged)
    np.testing.assert_allclose(np.asarray(rr.u), np.asarray(rd.u),
                               atol=5e-5)
    # the equality actually holds along the plan
    g = np.asarray(rr.u[:, 0] - 0.2 * rr.x[:, 1])
    np.testing.assert_allclose(g, 0.1, atol=5e-6)


def test_trajectory_budget_row_border():
    """Total-control budget Σu >= -1.5 (one trajectory row, active at the
    optimum): border Schur vs dense must agree to solver tolerance.

    The state weight is 0.5 here (not COST's 0.1): with the budget active,
    reallocating u between stages at constant Σu is tie-broken only by the
    state cost, so a weak weight leaves the arc ~1e-4-degenerate and any
    two solvers land that far apart (same flat-arc determinacy as the
    bench audit's golden scatter)."""
    cost = nempc.StageCost(
        stage=lambda x, u: jnp.sum(u * 1.1) + 0.5 * jnp.sum(x ** 2))
    tc = PathConstraint(fn=lambda x, u: jnp.sum(u, keepdims=True),
                        dim=1, lb=(-1.5,), ub=(float("inf"),))
    out = {}
    for kkt in ("dense", "riccati"):
        mpc = nempc.NMPC(MODEL, cost, [BOX, tc], H=8, DT=0.1,
                         integrator="rk4",
                         config=IPConfig(tol=1e-6, max_iter=80, kkt=kkt))
        out[kkt] = mpc.next(X0)
    rr, rd = out["riccati"], out["dense"]
    assert bool(rr.converged) and bool(rd.converged)
    assert abs(float(jnp.sum(rr.u)) + 1.5) < 1e-5     # active budget
    np.testing.assert_allclose(np.asarray(rr.u), np.asarray(rd.u),
                               atol=1e-4)
    assert abs(float(rr.objective) - float(rd.objective)) < 1e-5


def test_trajectory_eq_row_border():
    """Terminal-state equality via a trajectory row (feasible target).
    tol=1e-4: this problem's f32 dual-residual floor sits at ~2.4e-5
    (IDENTICALLY on both backends — measured 2.3698094e-5 dense vs
    2.3698083e-5 riccati), so demanding 1e-6 burns max_iter without
    changing the plan."""
    target = feasible_terminal_x0()
    tc = PathConstraint(fn=lambda x, u: x[-1:, 0], dim=1,
                        lb=(target,), ub=(target,))
    out = {}
    for kkt in ("dense", "riccati"):
        mpc = nempc.NMPC(MODEL, COST, [BOX, tc], H=8, DT=0.1,
                         integrator="rk4",
                         config=IPConfig(tol=1e-4, max_iter=80, kkt=kkt))
        out[kkt] = mpc.next(X0)
    rr, rd = out["riccati"], out["dense"]
    assert bool(rr.converged) and bool(rd.converged)
    assert abs(float(rr.x[-1, 0]) - target) < 1e-5
    np.testing.assert_allclose(np.asarray(rr.u), np.asarray(rd.u),
                               atol=1e-4)


def test_mixed_stage_eq_ineq_and_border():
    """All three machineries in one problem: stage interval rows (slack
    fold), stage EQ rows (stage QP), and a trajectory budget (border)."""
    ineq = StageConstraint(stage=lambda x, u: x[0] + x[1], dim=1,
                           lb=(-1.5,), ub=(1.5,))
    eqc = StageConstraint(stage=lambda x, u: u[0] - 0.2 * x[1],
                          dim=1, lb=(0.1,), ub=(0.1,))
    tc = PathConstraint(fn=lambda x, u: jnp.sum(x[:, 1], keepdims=True),
                        dim=1, lb=(-float("inf"),), ub=(3.0,))
    rr, rd = solve_both([BOX, ineq, eqc, tc], max_iter=100)
    assert bool(rr.converged) and bool(rd.converged)
    np.testing.assert_allclose(np.asarray(rr.u), np.asarray(rd.u),
                               atol=1e-4)


@pytest.mark.slow
def test_border_batched_and_warm():
    """The general path vmaps and carries warm starts like the fast path."""
    tc = PathConstraint(fn=lambda x, u: jnp.sum(u, keepdims=True),
                        dim=1, lb=(-1.5,), ub=(float("inf"),))
    mpc = nempc.NMPC(MODEL, COST, [BOX, tc], H=8, DT=0.1,
                     config=IPConfig(tol=1e-6, max_iter=60))
    assert mpc.kkt_backend == "riccati"
    x0s = jnp.array([[0.3, 0.2], [0.25, 0.1], [0.35, 0.3], [0.2, 0.15]])
    carry, res = mpc.next_batch(x0s)
    assert int(res.converged.sum()) == 4
    carry, res2 = mpc.next_batch(res.x[:, 0], carry=carry)
    assert int(res2.converged.sum()) == 4
    assert int(res2.iterations.max()) <= int(res.iterations.max())


def test_eq_border_long_horizon_o_h():
    """H=50 with a stage EQ row and a border row solves on the structured
    backend (the dense O((H·ns)³) path at H=50 is exactly what VERDICT
    item 2 said was prohibitive; riccati-vs-dense agreement is checked at
    small H above — here we check the long-horizon solve itself)."""
    eqc = StageConstraint(stage=lambda x, u: u[0] - 0.2 * x[1],
                          dim=1, lb=(0.1,), ub=(0.1,))
    tc = PathConstraint(fn=lambda x, u: jnp.sum(u, keepdims=True),
                        dim=1, lb=(-30.0,), ub=(float("inf"),))
    # wide state box: the EQ rows pin u_t = 0.2·x2+0.1 stage-wise, whose
    # 5 s closed trajectory reaches x1 ≈ 3.5 (measured) — a [-2, 2] box
    # would make the problem infeasible, not hard
    wide = nempc.DomainConstraint(states_constraint=[[-10.0, 10.0]] * 2,
                                  control_constraint=[[-1.0, 3.0]])
    mpc = nempc.NMPC(MODEL, COST, [wide, eqc, tc], H=50, DT=0.1,
                     config=IPConfig(tol=1e-5, max_iter=80))
    assert mpc.kkt_backend == "riccati"
    res = mpc.next(X0)
    assert bool(res.converged)
    g = np.asarray(res.u[:, 0] - 0.2 * res.x[:, 1])
    np.testing.assert_allclose(g, 0.1, atol=2e-5)


def test_eligibility_caps():
    """>nu EQ rows per stage or >64 border rows fall back to dense."""
    from pyneuralempc_tpu.core.transcription import transcribe
    from pyneuralempc_tpu.core.problem import MPCSpec

    # 2 EQ rows per stage but nu=1: over-determined stage control
    eq2 = StageConstraint(stage=lambda x, u: jnp.array([u[0] - x[0],
                                                        u[0] - x[1]]),
                          dim=2, lb=(0.0, 0.0), ub=(0.0, 0.0))
    spec = MPCSpec(model=MODEL, integrator="rk4", objective=COST,
                   box=nempc.Box.unbounded(2, 1),
                   path_constraints=(eq2,), H=4, DT=0.1)
    assert not eligible(transcribe(spec))

    big = PathConstraint(fn=lambda x, u: jnp.tile(u.reshape(-1), 9)[:65],
                         dim=65, lb=(0.0,) * 65, ub=(float("inf"),) * 65)
    spec2 = MPCSpec(model=MODEL, integrator="rk4", objective=COST,
                    box=nempc.Box.unbounded(2, 1),
                    path_constraints=(big,), H=8, DT=0.1)
    assert not eligible(transcribe(spec2))

    ok = PathConstraint(fn=lambda x, u: jnp.sum(u, keepdims=True),
                        dim=1, lb=(-1.0,), ub=(float("inf"),))
    spec3 = MPCSpec(model=MODEL, integrator="rk4", objective=COST,
                    box=nempc.Box.unbounded(2, 1),
                    path_constraints=(ok,), H=8, DT=0.1)
    assert eligible(transcribe(spec3))


def test_mesh_rejects_eq_border():
    """Horizon-sharded / pscan sweeps support only the plain path; a clear
    error beats silent wrongness."""
    import functools
    from pyneuralempc_tpu.solve.riccati import make_riccati_direction
    from pyneuralempc_tpu.solve.pscan import riccati_sweep_pscan
    from pyneuralempc_tpu.core.transcription import transcribe
    from pyneuralempc_tpu.core.problem import MPCSpec

    eqc = StageConstraint(stage=lambda x, u: u[0] - 0.2 * x[1],
                          dim=1, lb=(0.1,), ub=(0.1,))
    spec = MPCSpec(model=MODEL, integrator="rk4", objective=COST,
                   box=nempc.Box.unbounded(2, 1),
                   path_constraints=(eqc,), H=4, DT=0.1)
    nlp = transcribe(spec)
    with pytest.raises(ValueError, match="plain Riccati"):
        make_riccati_direction(nlp, IPConfig(),
                               sweep_impl=riccati_sweep_pscan)
