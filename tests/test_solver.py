"""Interior-point solver: analytic optima, SLSQP golden files, batching.

The golden-file methodology (SURVEY §4/§7): the reference's effective solver
tolerance is acceptable_tol=1e-4 (ipopt.py:185); we require our controls to
match a scipy-SLSQP solve of the *same transcription* to 1e-4-level agreement
on Lotka-Volterra.  cyipopt is not available in this environment, so SLSQP
(the reference's second backend, optimizer/slsqp.py) provides the golden.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import Bounds, minimize

import pyneuralempc_tpu as nempc
from pyneuralempc_tpu.core.transcription import NLP
from pyneuralempc_tpu.solve.interior_point import IPConfig, make_solver

RT0 = {"x0": None, "p": None, "tvp": None, "params": None}


def toy_nlp(n, m, obj, cons, lb, ub):
    return NLP(spec=None, n=n, m=m,
               objective=lambda w, rt: obj(w),
               constraints=lambda w, rt: cons(w),
               lower=jnp.asarray(lb, jnp.float32),
               upper=jnp.asarray(ub, jnp.float32),
               pack=None, unpack=None)


def test_box_qp():
    """min (w0-2)² + (w1+1)² in box → clipped optimum (1, -0.5)."""
    nlp = toy_nlp(2, 1,
                  lambda w: (w[0] - 2.0) ** 2 + (w[1] + 1.0) ** 2,
                  lambda w: jnp.zeros((1,)),
                  [-0.5, -0.5], [1.0, 1.0])
    res = jax.jit(make_solver(nlp, IPConfig(tol=1e-6)))(
        RT0, jnp.array([0.0, 0.0]))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.w), [1.0, -0.5], atol=2e-4)


def test_equality_qp():
    """min ‖w‖² s.t. w0+w1=1 → (0.5, 0.5), one Newton step."""
    nlp = toy_nlp(2, 1, lambda w: jnp.sum(w ** 2),
                  lambda w: jnp.array([w[0] + w[1] - 1.0]),
                  [-np.inf] * 2, [np.inf] * 2)
    res = jax.jit(make_solver(nlp, IPConfig(tol=1e-6)))(
        RT0, jnp.array([3.0, -1.0]))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.w), [0.5, 0.5], atol=1e-5)


def test_nonconvex_equality_with_box():
    """min −(w0+w1) s.t. w0·w1 = 0.25, 0 ≤ w ≤ 2 → (2, 0.125) or mirror."""
    nlp = toy_nlp(2, 1, lambda w: -(w[0] + w[1]),
                  lambda w: jnp.array([w[0] * w[1] - 0.25]),
                  [0.0, 0.0], [2.0, 2.0])
    res = jax.jit(make_solver(nlp, IPConfig(tol=1e-6, max_iter=100)))(
        RT0, jnp.array([1.5, 0.3]))
    assert bool(res.converged)
    w = np.sort(np.asarray(res.w))
    np.testing.assert_allclose(w, [0.125, 2.0], atol=1e-3)


def test_infeasible_problem_reports_failure():
    """w ≥ 1 (box) with w = -1 (equality) is infeasible: must not claim
    convergence (per-problem failure masks, SURVEY §5.3)."""
    nlp = toy_nlp(1, 1, lambda w: jnp.sum(w ** 2),
                  lambda w: jnp.array([w[0] + 1.0]),
                  [1.0], [np.inf])
    res = jax.jit(make_solver(nlp, IPConfig(max_iter=30)))(
        RT0, jnp.array([2.0]))
    assert not bool(res.converged)


# ---- Lotka-Volterra end-to-end vs SLSQP golden ----

def lv_f(x, u):
    return jnp.concatenate(
        [0.5 * x[:, :1] - 0.025 * x[:, :1] * x[:, 1:],
         -0.5 * x[:, 1:] + u + 0.005 * x[:, :1] * x[:, 1:]], axis=1)


def slsqp_golden(nlp, rt, w0):
    """Solve the same transcription with scipy SLSQP in float64."""
    obj = jax.jit(lambda w: nlp.objective(w, rt))
    gobj = jax.jit(jax.grad(lambda w: nlp.objective(w, rt)))
    con = jax.jit(lambda w: nlp.constraints(w, rt))
    jcon = jax.jit(jax.jacrev(lambda w: nlp.constraints(w, rt)))
    as32 = lambda w: jnp.asarray(w, jnp.float32)
    r = minimize(
        lambda w: float(obj(as32(w))), np.asarray(w0, np.float64),
        method="SLSQP",
        jac=lambda w: np.asarray(gobj(as32(w)), np.float64),
        bounds=Bounds(np.asarray(nlp.lower, np.float64),
                      np.asarray(nlp.upper, np.float64)),
        constraints=[{
            "type": "eq",
            "fun": lambda w: np.asarray(con(as32(w)), np.float64),
            "jac": lambda w: np.asarray(jcon(as32(w)), np.float64)}],
        options={"maxiter": 500, "ftol": 1e-10})
    assert r.success, f"SLSQP golden failed: {r.message}"
    return r.x


@pytest.fixture(scope="module")
def lv_mpc():
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = lambda x, u: jnp.sum(u * 1.1)
    box = nempc.DomainConstraint(
        states_constraint=[[-np.inf, 2.0], [-np.inf, np.inf]],
        control_constraint=[[-1.0, 1.0]])
    return nempc.NMPC(model, cost, [box], H=10, DT=0.1, integrator="rk4",
                      config=IPConfig(max_iter=80, tol=1e-6))


def test_lv_matches_slsqp_golden(lv_mpc):
    x0 = jnp.array([0.3, 0.2])
    res = lv_mpc.next(x0)
    lv_mpc.reset()
    assert bool(res.converged)
    golden = slsqp_golden(lv_mpc.nlp, nempc.runtime(x0),
                          lv_mpc.cold_start(x0).w)
    H = lv_mpc.H
    u_gold = golden[2 * H: 3 * H]
    np.testing.assert_allclose(np.asarray(res.u).ravel(), u_gold, atol=1e-4)
    x_gold = golden[: 2 * H].reshape(H, 2)
    np.testing.assert_allclose(np.asarray(res.x), x_gold, atol=1e-3)


def test_lv_state_constraint_active(lv_mpc):
    """Economic cost favouring large u, with a state bound on x₂ (which u
    drives directly): the bound becomes active and must be honoured."""
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = lambda x, u: -jnp.sum(u)          # maximise u -> pushes x₂ up
    box = nempc.DomainConstraint(
        states_constraint=[[-np.inf, np.inf], [-np.inf, 0.30]],
        control_constraint=[[-1.0, 1.0]])
    mpc = nempc.NMPC(model, cost, [box], H=10, DT=0.1, integrator="rk4",
                     config=IPConfig(max_iter=100, tol=1e-5))
    x0 = jnp.array([0.3, 0.2])
    res = mpc.next(x0)
    assert bool(res.converged)
    assert float(jnp.max(res.x[:, 1])) <= 0.30 + 1e-4
    # the bound must actually be active (otherwise the test is vacuous)
    assert float(jnp.max(res.x[:, 1])) >= 0.30 - 1e-2
    golden = slsqp_golden(mpc.nlp, nempc.runtime(x0), mpc.cold_start(x0).w)
    u_gold = golden[2 * mpc.H: 3 * mpc.H]
    np.testing.assert_allclose(np.asarray(res.u).ravel(), u_gold, atol=2e-4)


def test_batched_solve_matches_sequential(lv_mpc):
    """vmap-batched solves must agree with one-at-a-time solves."""
    x0s = jnp.array([[0.3, 0.2], [0.1, -0.1], [0.25, 0.4], [0.05, 0.3]])
    _, batch = lv_mpc.next_batch(x0s)
    assert bool(jnp.all(batch.converged))
    for i, x0 in enumerate(x0s):
        lv_mpc.reset()
        single = lv_mpc.next(x0)
        np.testing.assert_allclose(np.asarray(batch.u[i]),
                                   np.asarray(single.u), atol=2e-4)
    lv_mpc.reset()


def test_path_constraint_honoured():
    """Nonlinear path constraint x₀·x₁ ≥ -0.05 via slack lifting."""
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = lambda x, u: jnp.sum(u * 1.1)
    box = nempc.DomainConstraint(
        states_constraint=[[-np.inf, 2.0], [-np.inf, np.inf]],
        control_constraint=[[-1.0, 1.0]])
    H = 8
    pc = nempc.inequality_constraint(
        lambda x, u: (x[:, 0] * x[:, 1] + 0.05), H)
    mpc = nempc.NMPC(model, cost, [box, pc], H=H, DT=0.1, integrator="rk4",
                     config=IPConfig(max_iter=100, tol=1e-6))
    res = mpc.next(jnp.array([0.3, 0.2]))
    assert bool(res.converged)
    prod = np.asarray(res.x[:, 0] * res.x[:, 1])
    assert prod.min() >= -0.05 - 1e-4


def test_warm_start_faster():
    """Receding-horizon warm start should converge in fewer iterations."""
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = lambda x, u: jnp.sum(u * 1.1)
    box = nempc.DomainConstraint(
        states_constraint=[[-np.inf, 2.0], [-np.inf, np.inf]],
        control_constraint=[[-1.0, 1.0]])
    mpc = nempc.NMPC(model, cost, [box], H=10, DT=0.1, integrator="rk4",
                     config=IPConfig(max_iter=80, tol=1e-6))
    r1 = mpc.next(jnp.array([0.3, 0.2]))
    r2 = mpc.next(jnp.array([0.31, 0.21]))   # nearby state, warm carry
    assert bool(r2.converged)
    assert int(r2.iterations) <= int(r1.iterations)


@pytest.mark.slow
def test_multi_start_cartpole_escapes_saddle():
    """Multi-start finds the swing-up solution where a single cold start
    from the symmetric hanging state stalls at the saddle."""
    import sys
    sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/examples")
    from cartpole import cartpole_f

    model = nempc.jax_dynamics(cartpole_f(), x_dim=4, u_dim=1)
    cost = nempc.StageCost(
        stage=lambda x, u: 3.0 * (1.0 - jnp.cos(x[2])) + 0.1 * x[0] ** 2
        + 0.05 * x[1] ** 2 + 0.05 * x[3] ** 2 + 0.01 * jnp.sum(u ** 2),
        terminal=lambda x: 30.0 * (1.0 - jnp.cos(x[2])) + 5.0 * x[3] ** 2)
    box = nempc.DomainConstraint(
        states_constraint=[[-2.0, 2.0], [-6.0, 6.0],
                           [-2 * np.pi, 2 * np.pi], [-12.0, 12.0]],
        control_constraint=[[-10.0, 10.0]])
    mpc = nempc.NMPC(model, cost, [box], H=40, DT=0.05, integrator="rk4",
                     config=IPConfig(max_iter=120))
    x0 = jnp.array([0.0, 0.0, np.pi, 0.0])    # exact saddle
    single = mpc.next(x0)
    mpc.reset()
    multi = mpc.next_multi_start(x0, n_starts=8, noise=1.0,
                                 key=jax.random.PRNGKey(3))
    # the multi-start objective must beat the saddle's objective
    assert float(multi.objective) < float(single.objective) - 1.0


def test_multi_start_matches_single_on_convex():
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = lambda x, u: jnp.sum(u * 1.1)
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    mpc = nempc.NMPC(model, cost, [box], H=10, DT=0.1, integrator="rk4")
    x0 = jnp.array([0.3, 0.2])
    single = mpc.next(x0)
    mpc.reset()
    multi = mpc.next_multi_start(x0, n_starts=4, noise=0.1)
    assert bool(multi.converged)
    np.testing.assert_allclose(np.asarray(multi.u), np.asarray(single.u),
                               atol=5e-4)


def test_result_surface_identical_across_entry_points():
    """next / next_batch / next_multi_start must return the same field set
    with the same per-problem shapes (VERDICT r3 weak #7: multi_start used
    to rebuild NMPCResult by hand and drop trace), including the
    record-mode iterate trace."""
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = lambda x, u: jnp.sum(u * 1.1)  # noqa: E731
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[-1.0, 1.0]])
    for record in (False, True):
        mpc = nempc.NMPC(model, cost, [box], H=6, DT=0.1,
                         integrator="euler",
                         config=IPConfig(max_iter=25, record=record))
        x0 = jnp.array([0.3, 0.2])
        r_next = mpc.next(x0)
        _, r_batch = mpc.next_batch(x0[None])
        r_multi = mpc.next_multi_start(x0, n_starts=2, noise=0.05)
        assert r_next._fields == r_batch._fields == r_multi._fields
        for f in r_next._fields:
            a, b, c = (getattr(r_next, f), getattr(r_batch, f),
                       getattr(r_multi, f))
            if f == "trace":
                if not record:
                    assert a is None and b is None and c is None
                    continue
                assert set(a.keys()) == set(b.keys()) == set(c.keys())
                for k in a:
                    assert a[k].shape == c[k].shape       # start axis gone
                    assert b[k].shape == (1,) + a[k].shape
                continue
            a, b, c = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
            assert a.shape == c.shape, f
            assert b.shape == (1,) + a.shape, f


def test_polish_strips_barrier_bias(lv_mpc):
    """polish_iters: fixed centering iterations at a tiny μ after the main
    loop.  The converged IP point carries an O(μ_floor) barrier bias in the
    controls at active bounds; the polished point must be strictly closer
    to the f64 SLSQP golden without extra convergence demands (lockstep-
    safe: exactly polish_iters extra iterations per member)."""
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = lambda x, u: jnp.sum(u * 1.1)  # noqa: E731
    box = nempc.DomainConstraint(
        states_constraint=[[-np.inf, 2.0], [-np.inf, np.inf]],
        control_constraint=[[-1.0, 1.0]])
    x0 = jnp.array([0.3, 0.2])

    def solve_with(cfg):
        mpc = nempc.NMPC(model, cost, [box], H=10, DT=0.1,
                         integrator="rk4", config=cfg)
        res = mpc.next(x0)
        assert bool(res.converged)
        golden = slsqp_golden(mpc.nlp, nempc.runtime(x0),
                              mpc.cold_start(x0).w)
        gap = float(np.max(np.abs(np.asarray(res.u).ravel()
                                  - golden[20:30])))
        return res, gap

    plain, gap_plain = solve_with(IPConfig(max_iter=80, tol=1e-4))
    pol, gap_pol = solve_with(IPConfig(max_iter=80, tol=1e-4,
                                       polish_iters=3, polish_mu=1e-8))
    # polish is a post-loop phase: the main-loop path (and its iteration
    # count) is identical
    assert int(pol.iterations) == int(plain.iterations)
    # and a strictly better match to the golden
    assert gap_pol < gap_plain
    assert gap_pol < 1e-4


def test_acceptable_level_exit():
    """Ipopt-style acceptable exit (the reference's EFFECTIVE criterion,
    ipopt.py:184-185): a member whose μ=0 KKT error floors between tol
    and acceptable_tol must exit converged after acceptable_iter stalled
    iterations instead of burning max_iter — the f32 cold-tail escape
    (VERDICT r2 item 4)."""
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = lambda x, u: jnp.sum(u * 1.1)  # noqa: E731
    box = nempc.DomainConstraint(
        states_constraint=[[-1.0, 1.0], [-1.0, 0.35]],
        control_constraint=[[0.0, 1.2]])
    x0 = jnp.array([0.3, -0.5])
    # tol far below the f32 floor: without the acceptable exit this burns
    # max_iter and reports failure; with it, it converges once stalled.
    # (tol=1e-9 stopped being "unreachable" when the floored-slacks change
    # let exactly-active bounds read ~zero complementarity — this problem
    # now reaches 1e-10 in 11 iterations; the measured floor is ~1.2e-7,
    # so 1e-12 keeps the premise.)
    base = dict(max_iter=60, tol=1e-12)
    mpc_off = nempc.NMPC(model, cost, [box], H=10, DT=0.1,
                         config=IPConfig(acceptable_tol=0.0, **base))
    res_off = mpc_off.next(x0)
    assert not bool(res_off.converged)
    assert int(res_off.iterations) == 60
    mpc_on = nempc.NMPC(model, cost, [box], H=10, DT=0.1,
                        config=IPConfig(acceptable_tol=1e-4,
                                        acceptable_iter=6, **base))
    res_on = mpc_on.next(x0)
    assert bool(res_on.converged)
    assert int(res_on.iterations) < 60
    assert float(res_on.kkt_error) <= 1e-4
    # the accepted plan matches the ground-out plan (same iterate path,
    # earlier honest exit)
    np.testing.assert_allclose(np.asarray(res_on.u),
                               np.asarray(res_off.u), atol=2e-5)


@pytest.mark.slow
def test_polish_carried_blocks_match_fresh():
    """The default polish reuses the KKT blocks carried from the last
    solver iteration (zero extra factorisations — the round-3 throughput
    fix); polish_fresh=True re-derives them at the converged point.  Both
    must produce the same controls, cold and warm (the accuracy criterion
    cannot hinge on one step of block staleness)."""
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = lambda x, u: jnp.sum(u * 1.1)  # noqa: E731
    box = nempc.DomainConstraint(
        states_constraint=[[-1.0, 1.0], [-1.0, 0.35]],
        control_constraint=[[0.0, 1.2]])

    def run(fresh):
        mpc = nempc.NMPC(model, cost, [box], H=10, DT=0.1,
                         integrator="rk4",
                         config=IPConfig(tol=1e-5, polish_iters=5,
                                         polish_mu=1e-8,
                                         polish_fresh=fresh))
        x0s = jnp.array([[0.3, 0.2], [0.1, 0.1], [0.25, -0.2],
                         [0.2, 0.3]])
        carry, res = mpc.next_batch(x0s)
        us = [np.asarray(res.u)]
        for _ in range(3):
            carry, res = mpc.next_batch(res.x[:, 0], carry=carry)
            us.append(np.asarray(res.u))
        assert bool(res.converged.all())
        return np.stack(us)

    u_carried = run(fresh=False)
    u_fresh = run(fresh=True)
    np.testing.assert_allclose(u_carried, u_fresh, atol=2e-6)


def test_warm_dual_recentering_after_deep_polish():
    """A deeply polished carry (polish_mu=1e-9) leaves bound duals ~5
    orders below the re-opened barrier's central path; the warm-start
    corridor (IPConfig.warm_z_corridor, Ipopt's warm_start_mult push)
    re-centers them so warm re-plans do not burn extra iterations
    pumping z back up (measured on TPU: warm mean 3.5 -> 4.9 without)."""
    import dataclasses
    model = nempc.jax_dynamics(lv_f, x_dim=2, u_dim=1)
    cost = lambda x, u: jnp.sum(u * 1.1) + 1e-4 * jnp.sum(u * u)  # noqa: E731
    box = nempc.DomainConstraint(states_constraint=[[-2.0, 2.0]] * 2,
                                 control_constraint=[[0.0, 1.0]])
    base = IPConfig(tol=1e-5, polish_iters=5, polish_mu=1e-9)
    its = {}
    for kz in (1e2, 0.0):
        cfg = dataclasses.replace(base, warm_z_corridor=kz)
        mpc = nempc.NMPC(model, cost, [box], H=10, DT=0.1,
                         integrator="rk4", config=cfg)
        carry = None
        x = jnp.array([0.4, 0.2])
        for _ in range(4):
            carry, res = mpc.next_batch(x[None], carry=carry)
            x = res.x[0, 0]
            assert bool(res.converged[0])
        its[kz] = int(res.iterations[0])
    assert its[1e2] <= its[0.0]
