from .base import PredictiveController, default_Hp, info2debugstr
from .transcription import (SingleShooting, MultipleShooting,
                            TrapezoidalCollocation, OrthogonalCollocation,
                            move_blocking, init_predmat, init_defectmat)
from .construct import ControllerWeights
from .linmpc import LinMPC
from .explicitmpc import ExplicitMPC
from .nonlinmpc import NonLinMPC
from .slmpc import SLMPC

__all__ = [
    "PredictiveController", "LinMPC", "ExplicitMPC", "NonLinMPC", "SLMPC",
    "SingleShooting", "MultipleShooting", "TrapezoidalCollocation",
    "OrthogonalCollocation", "move_blocking",
    "ControllerWeights", "default_Hp",
]
