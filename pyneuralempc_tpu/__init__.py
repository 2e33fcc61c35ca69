"""pyneuralempc_tpu — a TPU-native economic-MPC engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
Enderdead/pyNeuralEMPC (reference mounted at /root/reference): plug a neural
network (or any differentiable function) in as the system dynamics, and the
framework transcribes the full nonlinear program — multiple-shooting defects,
economic objective, exact derivatives via autodiff — and solves it with a
native batched primal-dual interior-point method compiled to one XLA program
per MPC step.  Thousands of MPC problems solve concurrently per chip via
``vmap``; scenario fan-out shards across a TPU mesh via ``shard_map``.

Quick start::

    import jax.numpy as jnp
    import pyneuralempc_tpu as nempc

    def f(x, u):  # continuous-time dynamics, batched over the horizon
        return jnp.concatenate([0.5*x[:, :1] - 0.025*x[:, :1]*x[:, 1:],
                                -0.5*x[:, 1:] + u + 0.005*x[:, :1]*x[:, 1:]],
                               axis=1)

    model = nempc.jax_dynamics(f, x_dim=2, u_dim=1)
    cost = lambda x, u: jnp.sum(u * 1.1)
    box = nempc.DomainConstraint(states_constraint=[[-jnp.inf, 1.0]]*2,
                                 control_constraint=[[-1.0, 0.2]])
    mpc = nempc.NMPC(model, cost, [box], H=25, DT=0.1, integrator="rk4")
    res = mpc.next(jnp.array([0.66, -0.9]))
    res.u  # planned controls, (H, 1)
"""

from .core.problem import (Box, Dims, MPCSpec, PathConstraint, StageCost,
                           StageConstraint, equality_constraint,
                           inequality_constraint, interval_constraint,
                           runtime, stage_inequality, stage_interval)
from .core.structure import SeparableObjective, probe_stage_separable
from .core.transcription import NLP, transcribe
from .models.base import DynamicsModel, jax_dynamics
from .models.mlp import MLPDynamics, mlp_apply, mlp_init
from .models.rolling import RollingWindow, rolling_mlp, rolling_window
from .models.importers import (load_keras_gru_h5, load_keras_h5,
                               load_keras_h5_rolling, load_keras_lstm_h5,
                               load_torch_mlp)
from .models.rnn import (GRUDynamics, LSTMDynamics, gru_dynamics,
                         lstm_dynamics, fit_gru_on_sequences)
from .utils.checkpoint import load_pytree, save_pytree
from .utils.check import check_model, check_problem
from .utils.compile_cache import enable_compilation_cache
from .solve.interior_point import IPConfig, IPResult, make_solver
from .solve.alm import ALMConfig, make_alm_solver
from .solve.diff import make_differentiable_solver
from .api.controller import NMPC, NMPCResult, WarmStart

# Reference-compatible alias (pyNeuralEMPC.constraints.DomainConstraint).
DomainConstraint = Box.make

__version__ = "0.1.0"

__all__ = [
    "Box", "Dims", "MPCSpec", "PathConstraint", "StageConstraint",
    "DomainConstraint", "stage_inequality", "stage_interval",
    "equality_constraint", "inequality_constraint", "interval_constraint",
    "runtime", "StageCost", "SeparableObjective", "probe_stage_separable",
    "NLP", "transcribe", "DynamicsModel", "jax_dynamics",
    "MLPDynamics", "mlp_apply", "mlp_init", "RollingWindow", "rolling_mlp",
    "rolling_window", "load_keras_h5", "load_keras_lstm_h5",
    "load_keras_gru_h5", "load_keras_h5_rolling", "load_torch_mlp", "GRUDynamics", "LSTMDynamics", "gru_dynamics",
    "lstm_dynamics", "fit_gru_on_sequences", "save_pytree", "load_pytree",
    "check_model", "check_problem", "enable_compilation_cache",
    "IPConfig", "IPResult",
    "make_solver", "ALMConfig", "make_alm_solver", "make_differentiable_solver",
    "NMPC", "NMPCResult",
    "WarmStart",
]
