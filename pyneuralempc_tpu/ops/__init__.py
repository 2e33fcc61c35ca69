from .integrators import INTEGRATORS, step_fn
from .rollout import defects, simulate, shift_states
