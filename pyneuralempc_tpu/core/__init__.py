from .problem import (Box, Dims, MPCSpec, PathConstraint, StageCost, runtime,
                      equality_constraint, inequality_constraint,
                      interval_constraint)
from .transcription import NLP, transcribe
