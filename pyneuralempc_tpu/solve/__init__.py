from .interior_point import IPConfig, IPResult, IPState, make_solver
from .alm import ALMConfig, make_alm_solver
from .riccati import eligible as riccati_eligible, make_riccati_direction
from .diff import make_differentiable_solver
