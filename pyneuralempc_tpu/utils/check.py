"""Derivative checking: autodiff vs central finite differences.

The reference relied on Ipopt's ``derivative_test`` (left commented out at
``optimizer/ipopt.py:173-176``) to validate its hand-assembled Jacobians.
Our derivatives are autodiff so they cannot be *assembled* wrong — but the
user's model/cost can still be non-differentiable, discontinuous, or
numerically violent at the operating point.  ``check_model`` and
``check_problem`` probe exactly that and report the worst relative error,
the reference's safety-check role (SURVEY §4) as a real tool.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _fd_jacobian(f, x, eps):
    x = np.asarray(x, np.float64)
    y0 = np.asarray(f(jnp.asarray(x, jnp.float32)), np.float64)
    J = np.zeros(y0.shape + x.shape)
    it = np.nditer(x, flags=["multi_index"])
    for _ in it:
        idx = it.multi_index
        dx = np.zeros_like(x)
        dx[idx] = eps
        yp = np.asarray(f(jnp.asarray(x + dx, jnp.float32)), np.float64)
        ym = np.asarray(f(jnp.asarray(x - dx, jnp.float32)), np.float64)
        J[(Ellipsis,) + idx] = (yp - ym) / (2 * eps)
    return J


def check_model(model, x=None, u=None, p=None, tvp=None, params=None,
                T: int = 3, eps: float = 1e-3, seed: int = 0) -> Dict:
    """Compare the model's autodiff Jacobian wrt (x, u) against central
    finite differences at a (given or random) point.  Returns a report
    dict with max absolute/relative errors; raises nothing."""
    key = jax.random.PRNGKey(seed)
    kx, ku = jax.random.split(key)
    dims = model.dims
    x = (jax.random.normal(kx, (T, dims.x)) * 0.3 if x is None
         else jnp.asarray(x))
    u = (jax.random.normal(ku, (T, dims.u)) * 0.3 if u is None
         else jnp.asarray(u))

    f_x = lambda xx: model(xx, u, p, tvp, params)
    f_u = lambda uu: model(x, uu, p, tvp, params)
    report = {}
    for name, f, v in (("x", f_x, x), ("u", f_u, u)):
        ad = np.asarray(jax.jacobian(f)(v), np.float64)
        fd = _fd_jacobian(f, v, eps)
        aerr = np.abs(ad - fd).max()
        scale = np.abs(fd).max() + 1.0
        report[f"jac_{name}_abs_err"] = float(aerr)
        report[f"jac_{name}_rel_err"] = float(aerr / scale)
    report["ok"] = all(report[k] < 1e-2 for k in report
                       if k.endswith("rel_err"))
    return report


def check_problem(mpc, x0, p=None, tvp=None, params=None,
                  eps: float = 1e-3) -> Dict:
    """Check objective gradient and constraint Jacobian of the transcribed
    NLP at the cold-start point against finite differences."""
    from ..core.problem import runtime

    nlp = mpc.nlp
    rt = runtime(x0, p, tvp, params)
    w = mpc.cold_start(jnp.asarray(x0), p=p, tvp=tvp, params=params).w

    g_ad = np.asarray(jax.grad(nlp.objective)(w, rt), np.float64)
    g_fd = _fd_jacobian(lambda ww: nlp.objective(ww, rt), w, eps)
    A_ad = np.asarray(jax.jacrev(nlp.constraints)(w, rt), np.float64)
    A_fd = _fd_jacobian(lambda ww: nlp.constraints(ww, rt), w, eps)

    report = {
        "grad_abs_err": float(np.abs(g_ad - g_fd).max()),
        "grad_rel_err": float(np.abs(g_ad - g_fd).max()
                              / (np.abs(g_fd).max() + 1.0)),
        "jac_abs_err": float(np.abs(A_ad - A_fd).max()),
        "jac_rel_err": float(np.abs(A_ad - A_fd).max()
                             / (np.abs(A_fd).max() + 1.0)),
    }
    report["ok"] = (report["grad_rel_err"] < 1e-2
                    and report["jac_rel_err"] < 1e-2)
    return report
