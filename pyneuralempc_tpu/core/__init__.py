from .problem import (Box, Dims, MPCSpec, PathConstraint, StageCost,
                      StageConstraint, runtime, equality_constraint,
                      inequality_constraint, interval_constraint,
                      stage_inequality, stage_interval, expand_constraint)
from .transcription import NLP, transcribe
