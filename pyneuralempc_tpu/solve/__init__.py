from .interior_point import IPConfig, IPResult, IPState, make_solver
