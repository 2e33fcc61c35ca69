from .base import DynamicsModel, jax_dynamics
from .mlp import MLPDynamics, mlp_apply, mlp_init
from .rolling import RollingWindow, rolling_mlp, rolling_window
from .importers import load_keras_h5, load_torch_mlp
from .train import (fit_normalized_surrogate, fit_surrogate,
                    sample_transitions)
from .rnn import GRUDynamics, gru_dynamics, fit_gru_on_sequences
