from .base import PredictiveController, default_Hp
from .transcription import (SingleShooting, MultipleShooting,
                            TrapezoidalCollocation, OrthogonalCollocation,
                            move_blocking, init_predmat, init_defectmat)
from .construct import ControllerWeights
from .linmpc import LinMPC
from .explicitmpc import ExplicitMPC
from .nonlinmpc import NonLinMPC

__all__ = [
    "PredictiveController", "LinMPC", "ExplicitMPC", "NonLinMPC",
    "SingleShooting", "MultipleShooting", "TrapezoidalCollocation",
    "OrthogonalCollocation", "move_blocking",
    "ControllerWeights", "default_Hp",
]
