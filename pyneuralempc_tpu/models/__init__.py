from .base import DynamicsModel, jax_dynamics
from .mlp import MLPDynamics, mlp_apply, mlp_init
